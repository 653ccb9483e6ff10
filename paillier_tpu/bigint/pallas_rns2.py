"""Fused Pallas TPU kernel for RNS-v2 windowed modular exponentiation.

One ``pallas_call`` runs the *entire* fixed-window ladder for a batch
block: the residue accumulator (a B1/B2 pair of [Bblk, k] tiles), the
2^w-entry power table and the four int8 base-extension matrices stay
resident in VMEM across all exponent digits, so per-modmul HBM traffic
is zero (the lax.scan formulation pays ~40-60us/modmul of carry
traffic; see rns2.py module docstring).

Compute mix per Montgomery multiply (k channels per base):
  * VPU: one int32 channel product per base + ~30 cheap elementwise
    passes (float-reciprocal reductions, 7-bit chunking, cox alpha).
  * MXU: four ``i8 x i8 -> i32`` dots of shape [Bblk, 2k] x [2k, k] —
    the Cox-Rower base extensions with all per-channel constants folded
    in (~140 TMAC/s sustained on v5e, ~2x the XLA bf16 dot path).

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

from .rns2 import (I1_ENTRY, I1_ONE, I1_ONEM, I2_ENTRY, I2_ONE, I2_ONEM,
                   Rns2Context, rns2_mont_mul_pair)


def _modexp_kernel(dig_ref, x1_ref, x2_ref, ic1_ref, ic2_ref, f1_ref, f2_ref,
                   e1lo_ref, e1hi_ref, e2lo_ref, e2hi_ref,
                   o1_ref, o2_ref, tbl1, tbl2, *,
                   window, n_digits, per_element):
    ctx = Rns2Context(ic1=ic1_ref[...], ic2=ic2_ref[...],
                      f1=f1_ref[...], f2=f2_ref[...],
                      e1lo=e1lo_ref[...], e1hi=e1hi_ref[...],
                      e2lo=e2lo_ref[...], e2hi=e2hi_ref[...])
    x1 = x1_ref[...]
    x2 = x2_ref[...]

    def mmul(a, b):
        return rns2_mont_mul_pair(ctx, a, b)

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
            d = dig_ref[i, :]                    # [Bblk] int32
            t1 = jnp.zeros_like(acc[0])
            t2 = jnp.zeros_like(acc[1])
            for v in range(1 << window):
                sel = (d == v)[:, None]
                t1 = jnp.where(sel, tbl1[v], t1)
                t2 = jnp.where(sel, tbl2[v], t2)
        else:
            d = dig_ref[0, i]                    # scalar from SMEM
            t1 = tbl1[d]
            t2 = tbl2[d]
        return mmul(acc, (t1, t2))

    acc = lax.fori_loop(0, n_digits, dig_body, one_m)
    o1, o2 = mmul(acc, one)
    o1_ref[...] = o1
    o2_ref[...] = o2


def _pick_block(b_total: int, k: int, window: int) -> int:
    """Largest batch block (multiple of 8, dividing B) whose table + live
    temporaries fit a ~12 MB VMEM budget."""
    budget = 12 * (1 << 20)
    per_elem = ((1 << window) + 12) * 2 * k * 4
    blk = max(8, min(budget // per_elem, b_total, 256))
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
                  full(ctx.e1lo), full(ctx.e1hi),
                  full(ctx.e2lo), full(ctx.e2hi)],
        out_specs=(xspec, xspec),
        out_shape=(jax.ShapeDtypeStruct((B, k), jnp.int32),
                   jax.ShapeDtypeStruct((B, k), jnp.int32)),
        scratch_shapes=[pltpu.VMEM(((1 << window), blk, k), jnp.int32),
                        pltpu.VMEM(((1 << window), blk, k), jnp.int32)],
        interpret=interpret,
    )(dig_arr, x1, x2, ctx.ic1, ctx.ic2, ctx.f1, ctx.f2,
      ctx.e1lo, ctx.e1hi, ctx.e2lo, ctx.e2hi)
    out = jnp.concatenate([o1, o2], axis=-1)
    return out[0] if squeeze else out
