"""Fused Pallas TPU kernel for RNS-v2 windowed modular exponentiation.

One ``pallas_call`` runs the *entire* fixed-window ladder for a batch
block: the residue accumulator (a B1/B2 pair of [Bblk, k] tiles), the
2^w-entry power table and the four int8 base-extension matrices stay
resident in VMEM across all exponent digits, so per-modmul HBM traffic
is zero (the lax.scan formulation pays ~40-60us/modmul of carry
traffic; see rns2.py module docstring).

Compute mix per Montgomery multiply (k channels per base):
  * VPU: one int32 channel product per base + ~25 cheap elementwise
    passes (biased truncating float-reciprocal reductions, 7-bit
    chunking, cox alpha — see rns2._red_fast).
  * MXU: two merged ``i8 x i8 -> i32`` dots of shape
    [Bblk, 2k] x [2k, 2*pk] — the Cox-Rower base extensions with all
    per-channel constants folded in and the lo/hi chunk column groups
    side by side at 128-aligned offsets (25% faster than four
    [2k, k] dots on v5e: fewer MXU weight swaps; perf_dotvar.py).

Replaces gmp.Int.Exp on the hot paths (reference: paillier.go:213-216).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rns2 import (CHUNK, I1_ENTRY, I1_ONE, I1_ONEM, I2_ENTRY, I2_ONE,
                   I2_ONEM, Rns2Context, _dot_i8, rns2_mont_mul_pair)

# Sliding-kernel odd-power table dtype: int16 halves VMEM (bigger batch
# blocks) at the cost of a widening cast per conditional multiply.  Lazy
# residues fit exactly: signed near-canonical values in (-m-820, m+820)
# with m + 820 < 2^14.  (The r3/r4 _SPLIT2/_PIPE2/_TBL32 overlap knobs
# were deleted after the r4 knockout ablations killed the MXU/VPU
# overlap hypothesis — kernel time is issue-bound, MXU and VPU share
# one issue stream; the negative results live in PERF.md.)
_TBL_DTYPE = jnp.int16


def _ctx_from_refs(ic1, ic2, f1, f2, e1g, e2g):
    return Rns2Context(ic1=ic1[...], ic2=ic2[...], f1=f1[...], f2=f2[...],
                       e1g=e1g[...], e2g=e2g[...])


def _modexp_kernel(dig_ref, x1_ref, x2_ref, ic1_ref, ic2_ref, f1_ref, f2_ref,
                   e1g_ref, e2g_ref,
                   o1_ref, o2_ref, tbl1, tbl2, *,
                   window, n_digits, per_element):
    ctx = _ctx_from_refs(ic1_ref, ic2_ref, f1_ref, f2_ref,
                         e1g_ref, e2g_ref)
    x1 = x1_ref[...]
    x2 = x2_ref[...]

    def mmul(a, b):
        return rns2_mont_mul_pair(ctx, a, b, lazy=True)

    def bcast(row1, row2):
        return (jnp.broadcast_to(row1, x1.shape),
                jnp.broadcast_to(row2, x2.shape))

    entry = bcast(ctx.ic1[I1_ENTRY], ctx.ic2[I2_ENTRY])
    one_m = bcast(ctx.ic1[I1_ONEM], ctx.ic2[I2_ONEM])
    one = bcast(ctx.ic1[I1_ONE], ctx.ic2[I2_ONE])

    xm = mmul((x1, x2), entry)
    tbl1[0], tbl2[0] = one_m
    tbl1[1], tbl2[1] = xm
    cur = xm
    for v in range(2, 1 << window):
        cur = mmul(cur, xm)
        tbl1[v], tbl2[v] = cur

    def dig_body(i, acc):
        for _ in range(window):
            acc = mmul(acc, acc)
        if per_element:
            # reshape the int32 digits BEFORE comparing: Mosaic cannot
            # insert a minor dim on i1 (bool) vectors at some block
            # sizes ("Insertion of minor dim that is not a no-op only
            # supported for 32-bit types", hit at blk=256 in r3)
            dcol = dig_ref[i, :][:, None]        # [Bblk, 1] int32
            t1 = jnp.zeros_like(acc[0])
            t2 = jnp.zeros_like(acc[1])
            for v in range(1 << window):
                sel = dcol == v
                t1 = jnp.where(sel, tbl1[v], t1)
                t2 = jnp.where(sel, tbl2[v], t2)
        else:
            d = dig_ref[0, i]                    # scalar from SMEM
            t1 = tbl1[d]
            t2 = tbl2[d]
        return mmul(acc, (t1, t2))

    acc = lax.fori_loop(0, n_digits, dig_body, one_m)
    o1, o2 = rns2_mont_mul_pair(ctx, acc, one)     # exact final residues
    o1_ref[...] = o1
    o2_ref[...] = o2


VMEM_LIMIT = 100 * (1 << 20)   # v5e has 128 MiB VMEM; default scope is 16 MiB


def _pick_block(b_total: int, k: int, window: int) -> int:
    """Largest batch block (multiple of 8, dividing B) whose table + live
    temporaries fit the VMEM budget."""
    budget = VMEM_LIMIT - (1 << 22)
    per_elem = ((1 << window) + 12) * 2 * k * 4
    blk = max(8, min(budget // per_elem, b_total, 1024))
    while blk > 8:
        if b_total % blk == 0 and blk % 8 == 0:
            return blk
        blk -= 1
    return b_total


@functools.partial(jax.jit,
                   static_argnames=("window", "block", "interpret"))
def rns2_pow_pallas(ctx: Rns2Context, x: jnp.ndarray, digits: jnp.ndarray,
                    window: int = 4, block: int | None = None,
                    interpret: bool = False) -> jnp.ndarray:
    """x^e mod N on standard-form residues via the fused kernel.

    x: int32 [B, C] (or [C]); digits: int32 [D] shared or [B, D]
    per-element, MSB-first base-2^window.  Returns int32 [B, C] residues
    of values < lambda*N (callers reduce exactly in the limb domain).
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    B, C = x.shape
    k = C // 2
    per_element = digits.ndim > 1
    D = digits.shape[-1]
    blk = block or _pick_block(B, k, window)

    # split into per-base halves outside the kernel (lane-offset-0 tiles)
    x1 = x[:, :k]
    x2 = x[:, k:]

    if per_element:
        dig_arr = jnp.moveaxis(digits, -1, 0).astype(jnp.int32)   # [D, B]
        dig_spec = pl.BlockSpec((D, blk), lambda b: (0, b),
                                memory_space=pltpu.VMEM)
    else:
        dig_arr = digits.astype(jnp.int32)[None]                  # [1, D]
        dig_spec = pl.BlockSpec((1, D), lambda b: (0, 0),
                                memory_space=pltpu.SMEM)

    full = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((blk, k), lambda b: (b, 0),
                         memory_space=pltpu.VMEM)
    kernel = functools.partial(_modexp_kernel, window=window, n_digits=D,
                               per_element=per_element)
    o1, o2 = pl.pallas_call(
        kernel,
        grid=(B // blk,),
        in_specs=[dig_spec, xspec, xspec,
                  full(ctx.ic1), full(ctx.ic2), full(ctx.f1), full(ctx.f2),
                  full(ctx.e1g), full(ctx.e2g)],
        out_specs=(xspec, xspec),
        out_shape=(jax.ShapeDtypeStruct((B, k), jnp.int32),
                   jax.ShapeDtypeStruct((B, k), jnp.int32)),
        scratch_shapes=[pltpu.VMEM(((1 << window), blk, k), jnp.int32),
                        pltpu.VMEM(((1 << window), blk, k), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(dig_arr, x1, x2, ctx.ic1, ctx.ic2, ctx.f1, ctx.f2,
      ctx.e1g, ctx.e2g)
    out = jnp.concatenate([o1, o2], axis=-1)
    return out[0] if squeeze else out


# ---------------------------------------------------------------------------
# Shared-exponent sliding-window kernel (odd-power int16 table)
# ---------------------------------------------------------------------------

def _sliding_kernel(sched_ref, x1_ref, x2_ref, *refs,
                    window, n_steps, fused):
    """One batch block runs the whole sliding-window ladder with the
    odd-power table resident in VMEM as int16 by default (lazy residues
    fit: signed near-canonical values in (-m-820, m+820) with
    m + 820 < 2^14, so int16 holds them exactly).  The accumulator
    lives in int32 scratch so the conditional multiply is a predicated
    ref update.

    With ``fused``, two extra per-element inputs (fin1, fin2) replace
    the constant ``one`` in the exit multiply: the ladder's mandatory
    final Montgomery multiply (Montgomery -> standard form) computes
    x^e * fin mod N for free — encryption fuses G^m there instead of
    paying a separate eng.mul dispatch (VERDICT r4 #1a).  The schedule
    supports a skip sentinel: step -2 is a no-op (so multiple schedule
    lengths can share one padded buffer), -1 squares only, d >= 0
    squares then multiplies by table[d]."""
    if fused:
        fin1_ref, fin2_ref = refs[:2]
        refs = refs[2:]
    (ic1_ref, ic2_ref, f1_ref, f2_ref, e1g_ref, e2g_ref,
     o1_ref, o2_ref, acc1, acc2, tbl1, tbl2) = refs
    ctx = _ctx_from_refs(ic1_ref, ic2_ref, f1_ref, f2_ref,
                         e1g_ref, e2g_ref)
    x1 = x1_ref[...]
    x2 = x2_ref[...]

    def mmul(a, b):
        return rns2_mont_mul_pair(ctx, a, b, lazy=True)

    def bcast(row1, row2):
        return (jnp.broadcast_to(row1, x1.shape),
                jnp.broadcast_to(row2, x2.shape))

    entry = bcast(ctx.ic1[I1_ENTRY], ctx.ic2[I2_ENTRY])
    one = bcast(ctx.ic1[I1_ONE], ctx.ic2[I2_ONE])

    xm = mmul((x1, x2), entry)
    xsq = mmul(xm, xm)
    cur = xm
    tbl1[0], tbl2[0] = (cur[0].astype(_TBL_DTYPE), cur[1].astype(_TBL_DTYPE))
    for v in range(1, 1 << (window - 1)):
        cur = mmul(cur, xsq)
        tbl1[v] = cur[0].astype(_TBL_DTYPE)
        tbl2[v] = cur[1].astype(_TBL_DTYPE)

    d0 = sched_ref[0, 0]
    acc1[...] = tbl1[d0].astype(jnp.int32)
    acc2[...] = tbl2[d0].astype(jnp.int32)

    def step(i, carry):
        d = sched_ref[0, i]

        @pl.when(d >= -1)            # -2 = skip (schedule pad sentinel)
        def _():
            w = mmul((acc1[...], acc2[...]), (acc1[...], acc2[...]))
            acc1[...], acc2[...] = w

        @pl.when(d >= 0)
        def _():
            idx = jnp.maximum(d, 0)
            t = (tbl1[idx].astype(jnp.int32),
                 tbl2[idx].astype(jnp.int32))
            w2 = mmul((acc1[...], acc2[...]), t)
            acc1[...] = w2[0]
            acc2[...] = w2[1]

        return carry

    lax.fori_loop(1, n_steps + 1, step, 0)
    fin = (fin1_ref[...], fin2_ref[...]) if fused else one
    o1, o2 = rns2_mont_mul_pair(ctx, (acc1[...], acc2[...]), fin)
    o1_ref[...] = o1
    o2_ref[...] = o2


@functools.partial(jax.jit,
                   static_argnames=("window", "block", "interpret",
                                    "nopad"))
def rns2_pow_sliding_pallas(ctx: Rns2Context, x: jnp.ndarray,
                            sched: jnp.ndarray, window: int = 6,
                            block: int | None = None,
                            interpret: bool = False,
                            fin: jnp.ndarray | None = None,
                            nopad: bool = False) -> jnp.ndarray:
    """Shared-exponent power via a sliding-window schedule (the hot
    r^(n^s) ladder, reference paillier.go:213-216).

    x: int32 [B, C] (or [C]) standard residues; sched: int32 [1+S] from
    rns2.sliding_window_schedule.  Bit-exact with rns2_pow_sliding_jnp.

    ``fin`` (optional, int32 [B, C] canonical residues) is multiplied
    into the result BY THE LADDER'S EXIT MULTIPLY — the mandatory
    Montgomery->standard final multiply computes x^e * fin at zero
    extra cost (encryption's G^m fusion; VERDICT r4 #1a).

    ``nopad`` strips the 128-lane output padding from the merged ext
    matrices ([2k, 2*pk] -> [2k, 2k]) so the MXU issues 2k output lanes
    instead of 2*pk (k=320: 640 vs 768, -17% of dot MACs); the
    non-aligned hi-half extraction becomes a pltpu.roll inside the
    kernel (rns2._ext_split).  VERDICT r4 #1b ablation.
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    B, C = x.shape
    k = C // 2
    S = sched.shape[0] - 1
    T = 1 << (window - 1)
    if nopad and ctx.pk != k and (k % 128):
        pk = ctx.pk
        ctx = ctx._replace(
            e1g=jnp.concatenate([ctx.e1g[:, :k], ctx.e1g[:, pk:pk + k]],
                                axis=-1),
            e2g=jnp.concatenate([ctx.e2g[:, :k], ctx.e2g[:, pk:pk + k]],
                                axis=-1))
    if block is None:
        budget = VMEM_LIMIT - (12 << 20)
        tbl_b = 2                             # int16 odd-power table
        # odd-power table (T entries x 2 bases x k lanes) + ~16 live
        # int32 [blk, k] temporaries.  Bigger blocks stream more rows
        # per MXU weight load: 1024 measured 72.5ms vs 512's 74.0ms on
        # the 2048-bit ladder (r3), so prefer the largest block that
        # fits the VMEM budget.
        per_elem = T * 2 * k * tbl_b + 16 * k * 4
        blk = max(8, min(budget // per_elem, B, 1024))
        while blk > 8 and (B % blk or blk % 8):
            blk -= 1
    else:
        blk = block

    x1 = x[:, :k]
    x2 = x[:, k:]
    sched_arr = sched.astype(jnp.int32)[None]                # [1, 1+S]

    full = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((blk, k), lambda b: (b, 0),
                         memory_space=pltpu.VMEM)
    fused = fin is not None
    fin_ops, fin_specs = (), ()
    if fused:
        if fin.ndim == 1:
            fin = jnp.broadcast_to(fin, (B, C))
        fin_ops = (fin[:, :k], fin[:, k:])
        fin_specs = (xspec, xspec)
    kernel = functools.partial(_sliding_kernel, window=window, n_steps=S,
                               fused=fused)
    o1, o2 = pl.pallas_call(
        kernel,
        grid=(B // blk,),
        in_specs=[pl.BlockSpec((1, S + 1), lambda b: (0, 0),
                               memory_space=pltpu.SMEM),
                  xspec, xspec, *fin_specs,
                  full(ctx.ic1), full(ctx.ic2), full(ctx.f1), full(ctx.f2),
                  full(ctx.e1g), full(ctx.e2g)],
        out_specs=(xspec, xspec),
        out_shape=(jax.ShapeDtypeStruct((B, k), jnp.int32),
                   jax.ShapeDtypeStruct((B, k), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((blk, k), jnp.int32),
                        pltpu.VMEM((blk, k), jnp.int32),
                        pltpu.VMEM((T, blk, k), _TBL_DTYPE),
                        pltpu.VMEM((T, blk, k), _TBL_DTYPE)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(sched_arr, x1, x2, *fin_ops, ctx.ic1, ctx.ic2, ctx.f1, ctx.f2,
      ctx.e1g, ctx.e2g)
    out = jnp.concatenate([o1, o2], axis=-1)
    return out[0] if squeeze else out


# ---------------------------------------------------------------------------
# Fixed-base comb kernel (zero squarings)
# ---------------------------------------------------------------------------

def _fixed_base_kernel(dig_ref, tbl_ref, ic1_ref, ic2_ref,
                       f1_ref, f2_ref, e1g_ref, e2g_ref,
                       o1_ref, o2_ref, *, window, n_digits, k):
    """One grid step per batch block runs the WHOLE comb ladder with the
    full chunked table resident in VMEM (D * 2^w * 4q int8 — ~6 MB at
    2048-bit keys).  Per digit the table row is gathered by ONE int8
    one-hot matmul [Bblk, 2^w] x [2^w, 4q] (the table is shared across
    the batch, so per-element selection IS a matmul — ~20x cheaper than
    the 2^w-way masked select of the r3 kernel, which also dominated a
    2048-step grid with launch overhead: alt-enc measured 1.0x regular
    despite a 9x cheaper ladder, VERDICT r3 weak #4)."""
    ctx = _ctx_from_refs(ic1_ref, ic2_ref, f1_ref, f2_ref,
                         e1g_ref, e2g_ref)
    T = 1 << window
    blk = o1_ref.shape[0]
    q = tbl_ref.shape[-1] // 4

    def select(j):
        d = dig_ref[j, :]                            # [Bblk] int32
        dcol = d[:, None]                            # int32 minor-dim insert
        oh = (dcol == lax.broadcasted_iota(jnp.int32, (blk, T), 1)
              ).astype(jnp.int8)                     # [Bblk, T] one-hot
        P = _dot_i8(oh, tbl_ref[j])                  # [Bblk, 4q] int32
        t1 = P[:, :k] + (P[:, q:q + k] << CHUNK)
        t2 = P[:, 2 * q:2 * q + k] + (P[:, 3 * q:3 * q + k] << CHUNK)
        return t1, t2

    def body(j, acc):
        return rns2_mont_mul_pair(ctx, acc, select(j), lazy=True)

    acc = lax.fori_loop(1, n_digits, body, select(0))
    one = (jnp.broadcast_to(ctx.ic1[I1_ONE], (blk, k)),
           jnp.broadcast_to(ctx.ic2[I2_ONE], (blk, k)))
    o1, o2 = rns2_mont_mul_pair(ctx, acc, one)       # exact final residues
    o1_ref[...] = o1
    o2_ref[...] = o2


@functools.partial(jax.jit,
                   static_argnames=("window", "block", "interpret"))
def rns2_pow_fixed_base_pallas(ctx: Rns2Context, table: jnp.ndarray,
                               digits: jnp.ndarray, window: int = 4,
                               block: int | None = None,
                               interpret: bool = False) -> jnp.ndarray:
    """base^e via the comb table (rns2.build_fixed_base_table).

    table: int32 [D*2^w, C] Montgomery-form residues; digits: int32 [B, D]
    per-element MSB-first.  D-1 Montgomery multiplies, zero squarings
    (the Damgard-Jurik short-randomness path, paillier.go:221-238).
    """
    B, D = digits.shape
    C = table.shape[-1]
    k = C // 2
    T = 1 << window
    # largest multiple-of-8 divisor of B up to 1024; batches with no such
    # divisor (B not a multiple of 8) fall back to one block of B rows
    # (the old `while B % blk: blk -= 8` loop decremented to 0 for those
    # and division-crashed; ADVICE r4)
    blk = block
    if blk is None:
        blk = next((c for c in range(min(1024, B), 7, -8)
                    if B % c == 0 and c % 8 == 0), B)

    # chunked one-hot-gatherable layout: [D, T, 4q] int8 with the four
    # column groups (b1 lo | b1 hi | b2 lo | b2 hi) each at a 128-aligned
    # offset q so every output slice of the gather dot is lane-aligned
    q = -(-k // 128) * 128
    tr = table.reshape(D, T, C).astype(jnp.int32)
    mask = (1 << CHUNK) - 1
    gap = jnp.zeros((D, T, q - k), jnp.int32)
    tblg = jnp.concatenate(
        [tr[..., :k] & mask, gap, tr[..., :k] >> CHUNK, gap,
         tr[..., k:] & mask, gap, tr[..., k:] >> CHUNK, gap],
        axis=-1).astype(jnp.int8)                    # [D, T, 4q]
    dig_arr = jnp.moveaxis(digits, -1, 0).astype(jnp.int32)     # [D, B]

    full = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((blk, k), lambda b: (b, 0),
                         memory_space=pltpu.VMEM)
    kernel = functools.partial(_fixed_base_kernel, window=window,
                               n_digits=D, k=k)
    o1, o2 = pl.pallas_call(
        kernel,
        grid=(B // blk,),
        in_specs=[pl.BlockSpec((D, blk), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
                  full(tblg),
                  full(ctx.ic1), full(ctx.ic2), full(ctx.f1), full(ctx.f2),
                  full(ctx.e1g), full(ctx.e2g)],
        out_specs=(ospec, ospec),
        out_shape=(jax.ShapeDtypeStruct((B, k), jnp.int32),
                   jax.ShapeDtypeStruct((B, k), jnp.int32)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(dig_arr, tblg, ctx.ic1, ctx.ic2, ctx.f1, ctx.f2,
      ctx.e1g, ctx.e2g)
    return jnp.concatenate([o1, o2], axis=-1)
