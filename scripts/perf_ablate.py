"""Ablation probe: what does each piece of rns2_mont_mul_pair cost?

Variants (results intentionally wrong for B..E — timing only):
  dots   pure MXU: chain of dependent i8 dots at the kernel's exact shapes
  full   the real mmul chain (baseline)
  nofix  _red without the +-m conditional fixes
  noalpha cox alpha replaced by a constant
  novpu  dots + minimal glue only (chunk + concat + one red)
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from paillier_tpu.bigint.rns2 import (CHUNK, COX_EPS, I1_M, I1_M2M, I2_K30,
                                      I2_M, I2_U0, Rns2Spec, _chunks,
                                      _dot_i8, _red)

NMUL = 256   # mmuls per kernel call


def make_kernel(variant, k):
    def body(x1_ref, x2_ref, ic1_ref, ic2_ref, f1_ref, f2_ref,
             e1lo_ref, e1hi_ref, e2lo_ref, e2hi_ref, o1_ref, o2_ref):
        m1 = ic1_ref[I1_M, :]
        m2 = ic2_ref[I2_M, :]
        m2m = ic1_ref[I1_M2M, :]
        u0 = ic2_ref[I2_U0, :]
        k30 = ic2_ref[I2_K30, :]
        inv1 = f1_ref[0, :]
        inv2 = f2_ref[0, :]
        e1lo = e1lo_ref[...]
        e1hi = e1hi_ref[...]
        e2lo = e2lo_ref[...]
        e2hi = e2hi_ref[...]

        def red2(v, m, inv):   # no conditional fixes
            q = jnp.floor(v.astype(jnp.float32) * inv).astype(jnp.int32)
            return v - q * m

        def mmul(x1, x2):
            if variant == "dots":
                lhs = jnp.concatenate([x1 & 127, x2 & 127],
                                      axis=-1).astype(jnp.int8)
                a = _dot_i8(lhs, e1lo)
                b = _dot_i8(lhs, e1hi)
                lhs2 = jnp.concatenate([a & 127, b & 127],
                                       axis=-1).astype(jnp.int8)
                c = _dot_i8(lhs2, e2lo)
                d = _dot_i8(lhs2, e2hi)
                return c & 0x3FFF, d & 0x3FFF
            if variant == "novpu":
                s1 = _red(x1 * x1, m1, inv1)
                a0, a1 = _chunks(s1)
                lhs1 = jnp.concatenate([a0, a1], axis=-1).astype(jnp.int8)
                Plo = _dot_i8(lhs1, e1lo)
                Phi = _dot_i8(lhs1, e1hi)
                w2 = _red(Plo + (Phi << CHUNK), m2, inv2)
                s0, s1c = _chunks(w2)
                lhs2 = jnp.concatenate([s0, s1c], axis=-1).astype(jnp.int8)
                Vlo = _dot_i8(lhs2, e2lo)
                Vhi = _dot_i8(lhs2, e2hi)
                w1 = _red(Vlo + (Vhi << CHUNK), m1, inv1)
                return w1, w2
            red = red2 if variant == "nofix" else _red
            s1 = red(x1 * x1, m1, inv1)
            s2 = red(x2 * x2, m2, inv2)
            a0, a1 = _chunks(s1)
            lhs1 = jnp.concatenate([a0, a1], axis=-1).astype(jnp.int8)
            Plo = _dot_i8(lhs1, e1lo)
            Phi = _dot_i8(lhs1, e1hi)
            v = Plo + (Phi << CHUNK)
            t1 = s2 * u0
            w2 = red(v + t1, m2, inv2)
            sg = red(w2 * k30, m2, inv2)
            s0, s1c = _chunks(sg)
            lhs2 = jnp.concatenate([s0, s1c], axis=-1).astype(jnp.int8)
            Vlo = _dot_i8(lhs2, e2lo)
            Vhi = _dot_i8(lhs2, e2hi)
            v1 = Vlo + (Vhi << CHUNK)
            if variant == "noalpha":
                alpha = jnp.int32(3)
            else:
                alpha = jnp.floor(
                    jnp.sum(sg.astype(jnp.float32) * inv2, axis=-1,
                            keepdims=True) + COX_EPS).astype(jnp.int32)
            w1 = red(v1 - alpha * m2m, m1, inv1)
            return w1, w2

        def step(i, xs):
            return mmul(*xs)

        o1, o2 = lax.fori_loop(0, NMUL, step,
                               (x1_ref[...], x2_ref[...]))
        o1_ref[...] = o1
        o2_ref[...] = o2

    return body


def run(variant, spec, ctx, blk, B):
    k = spec.k
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 13, size=(B, 2 * k)).astype(np.int32)
    x1 = jnp.asarray(x[:, :k])
    x2 = jnp.asarray(x[:, k:])
    kern = make_kernel(variant, k)
    xspec = pl.BlockSpec((blk, k), lambda b: (b, 0),
                         memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kern, grid=(B // blk,),
        in_specs=[xspec, xspec, full(ctx.ic1), full(ctx.ic2),
                  full(ctx.f1), full(ctx.f2), full(ctx.e1lo),
                  full(ctx.e1hi), full(ctx.e2lo), full(ctx.e2hi)],
        out_specs=(xspec, xspec),
        out_shape=(jax.ShapeDtypeStruct((B, k), jnp.int32),
                   jax.ShapeDtypeStruct((B, k), jnp.int32)),
    )
    fn = jax.jit(functools.partial(
        fn, x1, x2, ctx.ic1, ctx.ic2, ctx.f1, ctx.f2,
        ctx.e1lo, ctx.e1hi, ctx.e2lo, ctx.e2hi))
    o = fn()
    np.asarray(o[0][:1, :1])
    t0 = time.perf_counter()
    for _ in range(3):
        o = fn()
    np.asarray(o[0][:1, :1])
    dt = (time.perf_counter() - t0) / 3
    mmuls = NMUL * (B // blk)
    macs = mmuls * 4 * blk * 2 * k * k
    per_mmul_us = dt / mmuls * 1e6
    print(f"{variant:8s} blk={blk:4d} {dt*1e3:7.2f}ms "
          f"{per_mmul_us:6.1f}us/mmul(blk) "
          f"i8-TOPS={macs*2/dt/1e12:6.1f}")


def main():
    nbits = 4096
    rng = np.random.default_rng(7)
    n = int.from_bytes(rng.bytes(nbits // 8)) | (1 << (nbits - 1)) | 1
    spec = Rns2Spec(n)
    ctx = spec.build_context()
    print(f"# k={spec.k}")
    B = 4096
    for blk in (256, 128):
        for variant in ("dots", "novpu", "nofix", "noalpha", "full"):
            run(variant, spec, ctx, blk, B)


if __name__ == "__main__":
    main()
