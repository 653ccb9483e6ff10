"""Fused Pallas TPU kernels for Montgomery modular exponentiation.

Why this exists: the pure-jnp ladder (montgomery.py) expresses each
bignum multiply as a ``lax.scan`` whose carry — the (batch, 2L) column
accumulator — XLA materializes in HBM on every limb step.  At 1024-bit
that is ~1 TB of HBM traffic per 1k-batch modexp, hundreds of times the
compute cost.  This kernel runs the *entire* windowed modexp inside one
``pallas_call``: the accumulator, the power table, and every multiply
intermediate live in VMEM for the whole exponent ladder, so HBM traffic
collapses to the kernel's inputs and outputs.

Design:
* grid over batch blocks; each block holds base [Bblk, L], a power table
  [2^w, Bblk, L] in VMEM scratch, and the Montgomery accumulator.
* multiplication is Horner-form over the multiplier limbs (static-shift
  rolls + one static slice per step — no dynamic lane indexing).
* carries resolve via a hand-rolled Kogge-Stone ladder (log2 L static
  vector steps).
* table lookup per digit is mask-select (sum of 2^w predicated rows), so
  batch-shared and per-element exponents use the same code path.
* works in interpreter mode on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .host import LIMB_BITS, LIMB_MASK
from .montgomery import MontCtx

_MASK = LIMB_MASK      # python int -> inlined literal (kernels must not
_BITS = LIMB_BITS      # capture array constants)


# ---------------------------------------------------------------------------
# Value-level limb math (kernel-safe: no pad, no associative_scan, no
# dynamic lane slicing)
# ---------------------------------------------------------------------------

def _shift_right_limbs(x, k):
    """Prefix-shift along the limb axis by k (zeros enter at the bottom)."""
    zeros = jnp.zeros(x.shape[:-1] + (k,), x.dtype)
    return jnp.concatenate([zeros, x[..., :-k]], axis=-1)


def _resolve01(s):
    """Kogge-Stone carry resolution for entries < 2^17 -> (limbs, carry)."""
    g = s >> _BITS
    r = s & _MASK
    p = (r == _MASK).astype(jnp.uint32)
    L = s.shape[-1]
    d = 1
    while d < L:
        g = g | (p & _shift_right_limbs(g, d))
        p = p & _shift_right_limbs(p, d)
        d *= 2
    # static slice + squeeze (negative/int indexing lowers to
    # dynamic_slice, which Mosaic does not support on values)
    carry_out = lax.squeeze(lax.slice_in_dim(g, L - 1, L, axis=-1), [g.ndim - 1])
    carry_in = _shift_right_limbs(g, 1)
    return (r + carry_in) & _MASK, carry_out


def _normalize(cols):
    v = cols
    for _ in range(2):
        lo = v & _MASK
        hi = _shift_right_limbs(v >> _BITS, 1)
        v = lo + hi
    out, _ = _resolve01(v)
    return out


def _add(a, b):
    return _resolve01(a + b)


def _sub(a, b):
    s = a + (b ^ _MASK)
    one = jnp.concatenate(
        [jnp.ones(s.shape[:-1] + (1,), jnp.uint32),
         jnp.zeros(s.shape[:-1] + (s.shape[-1] - 1,), jnp.uint32)], axis=-1)
    out, carry = _resolve01(s + one)
    return out, 1 - carry


def _cond_sub(a, n):
    d, borrow = _sub(a, n)
    return jnp.where((borrow == 0)[..., None], d, a)


def _mul_full(a, b, out_len):
    """Column sums of a*b at out_len limbs; Horner over a's limbs MSB-first.

    Uses a rotating copy of ``a`` so each step reads the (static) top limb
    and rolls — no dynamic lane indexing.
    """
    La = a.shape[-1]
    Lb = min(b.shape[-1], out_len)
    bb = b[..., :Lb]
    batch = a.shape[:-1]
    acc0 = jnp.zeros(batch + (out_len,), jnp.uint32) + (
        a[..., :1] * jnp.uint32(0)) + (b[..., :1] * jnp.uint32(0))
    zero_col = jnp.zeros(batch + (1,), jnp.uint32)

    def body(i, carry):
        acc, arot = carry
        ai = arot[..., La - 1:La]                       # static top limb
        arot = jnp.roll(arot, 1, axis=-1)               # next MSB to top
        acc = jnp.concatenate([zero_col + ai * 0, acc[..., :-1]], axis=-1)
        p = ai * bb
        lo = p & _MASK
        hi = p >> _BITS
        # pure concat-pad adds (no .at[] scatter: those capture constants
        # inside pallas kernels)
        if Lb < out_len:
            tail = jnp.zeros(batch + (out_len - Lb,), jnp.uint32)
            lo_w = jnp.concatenate([lo, tail], axis=-1)
            hi_w = jnp.concatenate([zero_col * 0, hi,
                                    tail[..., :-1]], axis=-1)
        else:
            lo_w = lo
            hi_w = jnp.concatenate([zero_col * 0, hi[..., :Lb - 1]], axis=-1)
        return acc + lo_w + hi_w, arot

    acc, _ = lax.fori_loop(0, La, body, (acc0, a))
    return acc


def _mont_mul(a, b, n, nprime):
    """Montgomery product on values; n, nprime broadcastable [*, L]."""
    L = n.shape[-1]
    t = _normalize(_mul_full(a, b, 2 * L))
    m = _normalize(_mul_full(t[..., :L], nprime, L))
    mn = _normalize(_mul_full(m, n, 2 * L))
    s, carry = _add(t, mn)
    hi = jnp.concatenate([s[..., L:], carry[..., None]], axis=-1)
    n_pad = jnp.concatenate(
        [jnp.broadcast_to(n, hi.shape[:-1] + (L,)),
         jnp.zeros(hi.shape[:-1] + (1,), jnp.uint32)], axis=-1)
    return _cond_sub(hi, n_pad)[..., :L]


# ---------------------------------------------------------------------------
# The fused modexp kernel
# ---------------------------------------------------------------------------

def _modexp_kernel(digits_ref, base_ref, n_ref, nprime_ref, r2_ref,
                   one_ref, out_ref, tbl, *, window, n_digits, per_element):
    n = n_ref[0]          # [L]
    np_ = nprime_ref[0]
    bm = _mont_mul(base_ref[...], jnp.broadcast_to(r2_ref[0],
                                                   base_ref.shape), n, np_)
    one_m = jnp.broadcast_to(one_ref[0], base_ref.shape)

    # power table in VMEM: tbl[0] = 1_m, tbl[1] = bm, tbl[v] = bm^v
    tbl[0] = one_m
    tbl[1] = bm
    cur = bm
    for v in range(2, 1 << window):
        cur = _mont_mul(cur, bm, n, np_)
        tbl[v] = cur

    def dig_body(i, acc):
        for _ in range(window):
            acc = _mont_mul(acc, acc, n, np_)
        if per_element:
            d = digits_ref[i, :]                       # [Bblk] int32
            dmask = d[:, None]
        else:
            d = digits_ref[0, i]                       # scalar
            dmask = d
        t = jnp.zeros_like(acc)
        for v in range(1 << window):
            t = jnp.where(dmask == v, tbl[v], t)
        return _mont_mul(acc, t, n, np_)

    acc = lax.fori_loop(0, n_digits, dig_body, one_m)

    # leave Montgomery domain: multiply by integer 1
    one_int = jnp.concatenate(
        [jnp.ones(acc.shape[:-1] + (1,), jnp.uint32),
         jnp.zeros(acc.shape[:-1] + (acc.shape[-1] - 1,), jnp.uint32)],
        axis=-1)
    out_ref[...] = _mont_mul(acc, one_int, n, np_)


def _pick_block(b_total: int, limbs: int, window: int) -> int:
    """Largest batch block (multiple of 8, divides B) with ~<= 8 MB of
    VMEM table+state."""
    budget = 8 * (1 << 20)
    per_elem = (1 << window) * limbs * 4 + 8 * limbs * 4
    blk = max(8, budget // per_elem)
    blk = min(blk, b_total)
    # round to a divisor of b_total that is a multiple of 8 (or b_total)
    while blk > 8:
        if b_total % blk == 0 and blk % 8 == 0:
            return blk
        blk -= 1
    return b_total


@functools.partial(jax.jit,
                   static_argnames=("window", "block", "interpret"))
def mont_pow_pallas(ctx: MontCtx, base: jnp.ndarray, digits: jnp.ndarray,
                    window: int = 4, block: int | None = None,
                    interpret: bool | None = None) -> jnp.ndarray:
    """base^e mod n via one fused Pallas kernel per batch block.

    ``digits``: int32 [D] (shared exponent) or [B, D] (per-element),
    MSB-first base-2^window.  Drop-in equivalent of
    montgomery.mont_pow_digits.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    L = ctx.n_limbs
    squeeze = base.ndim == 1
    if squeeze:
        base = base[None]
    B = base.shape[0]
    per_element = digits.ndim > 1
    D = digits.shape[-1]
    blk = block or _pick_block(B, L, window)

    consts = [ctx.n[None], ctx.nprime[None], ctx.r2[None], ctx.one_m[None]]
    const_spec = pl.BlockSpec((1, L), lambda b: (0, 0),
                              memory_space=pltpu.VMEM)
    if per_element:
        dig_arr = jnp.moveaxis(digits, -1, 0).astype(jnp.int32)  # [D, B]
        dig_spec = pl.BlockSpec((D, blk), lambda b: (0, b),
                                memory_space=pltpu.VMEM)
    else:
        dig_arr = digits.astype(jnp.int32)[None]                 # [1, D]
        dig_spec = pl.BlockSpec((1, D), lambda b: (0, 0),
                                memory_space=pltpu.SMEM)

    kernel = functools.partial(_modexp_kernel, window=window, n_digits=D,
                               per_element=per_element)
    out = pl.pallas_call(
        kernel,
        grid=(B // blk,),
        in_specs=[dig_spec,
                  pl.BlockSpec((blk, L), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
                  const_spec, const_spec, const_spec, const_spec],
        out_specs=pl.BlockSpec((blk, L), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L), jnp.uint32),
        scratch_shapes=[pltpu.VMEM(((1 << window), blk, L), jnp.uint32)],
        interpret=interpret,
    )(dig_arr, base, *consts)
    return out[0] if squeeze else out
