"""Structural variants of the mmul inside the real pow kernel.

fused:  one [B,2k]x[2k,2k] dot per extension (halves dependent-dot count)
fusedlazy: fused + lazy reductions
split2: fusedlazy with the batch rows split into two interleaved chains
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import paillier_tpu.bigint.rns2 as rns2
import paillier_tpu.bigint.pallas_rns2 as pr2
from paillier_tpu.bigint import host
from paillier_tpu.bigint import montgomery as mont
from paillier_tpu.bigint.rns2 import (CHUNK, COX_EPS, I1_M, I1_M2M, I2_K30,
                                      I2_M, I2_U0, _chunks, _dot_i8, _red,
                                      _red_lazy)

ORIG = rns2.rns2_mont_mul_pair


def fused_mmul(ctx, x, y, lazy=False):
    x1, x2 = x
    y1, y2 = y
    k = ctx.ic1.shape[-1]
    m1 = ctx.ic1[I1_M]
    m2 = ctx.ic2[I2_M]
    inv1 = ctx.f1[0]
    inv2 = ctx.f2[0]
    out_red = _red_lazy if lazy else _red

    s1 = _red(x1 * y1, m1, inv1)
    s2 = _red_lazy(x2 * y2, m2, inv2)
    a0, a1 = _chunks(s1)
    lhs1 = jnp.concatenate([a0, a1], axis=-1).astype(jnp.int8)
    P = _dot_i8(lhs1, ctx.e1lo)          # e1lo is the fused [2k, 2k]
    v = P[..., :k] + (P[..., k:] << CHUNK)
    t1 = s2 * ctx.ic2[I2_U0]
    w2 = out_red(v + t1, m2, inv2)
    sg = _red(w2 * ctx.ic2[I2_K30], m2, inv2)
    s0, s1c = _chunks(sg)
    lhs2 = jnp.concatenate([s0, s1c], axis=-1).astype(jnp.int8)
    V = _dot_i8(lhs2, ctx.e2lo)
    v1 = V[..., :k] + (V[..., k:] << CHUNK)
    alpha = jnp.floor(
        jnp.sum(sg.astype(jnp.float32) * inv2, axis=-1, keepdims=True)
        + COX_EPS).astype(jnp.int32)
    w1 = out_red(v1 - alpha * ctx.ic1[I1_M2M], m1, inv1)
    return w1, w2


def make_mmul(variant):
    if variant == "orig":
        return ORIG
    if variant == "fused":
        return lambda ctx, x, y, lazy=False: fused_mmul(ctx, x, y, False)
    if variant == "fusedlazy":
        return fused_mmul

    def split2(ctx, x, y, lazy=False):
        x1, x2 = x
        y1, y2 = y
        h = x1.shape[0] // 2
        xa = (x1[:h], x2[:h])
        xb = (x1[h:], x2[h:])
        ya = (y1[:h], y2[:h])
        yb = (y1[h:], y2[h:])
        wa = fused_mmul(ctx, xa, ya, lazy)
        wb = fused_mmul(ctx, xb, yb, lazy)
        return (jnp.concatenate([wa[0], wb[0]], axis=0),
                jnp.concatenate([wa[1], wb[1]], axis=0))
    return split2


def fuse_ctx(ctx):
    e1 = jnp.concatenate([ctx.e1lo, ctx.e1hi], axis=1)
    e2 = jnp.concatenate([ctx.e2lo, ctx.e2hi], axis=1)
    dummy = jnp.zeros((8, 128), jnp.int8)
    return ctx._replace(e1lo=e1, e1hi=dummy, e2lo=e2, e2hi=dummy)


def main():
    nbits = 4096
    rng = np.random.default_rng(7)
    n_mod = int.from_bytes(rng.bytes(nbits // 8)) | (1 << (nbits - 1)) | 1
    eng = rns2.Rns2Engine(n_mod)
    spec = eng.spec
    print(f"# k={spec.k}")
    B = 4096
    xs = [int.from_bytes(rng.bytes(nbits // 8)) % n_mod for _ in range(B)]
    x = eng.from_limbs(jnp.asarray(host.ints_to_limbs(xs, eng.converter.L)))
    np.asarray(x[:1, :1])
    e = int.from_bytes(rng.bytes(256)) | (1 << 2047)
    window = 4
    nd = mont.n_digits_for_bits(e.bit_length(), window)
    digits = jnp.asarray(mont.exp_digits(e, window, nd))
    fctx = fuse_ctx(eng.ctx)

    # correctness oracle on a few elements
    want = [pow(xi, e, n_mod) for xi in xs[:4]]

    for variant in ("orig", "fused", "fusedlazy", "split2"):
        pr2.rns2_mont_mul_pair = make_mmul(variant)
        pr2.rns2_pow_pallas.clear_cache()
        ctx = eng.ctx if variant == "orig" else fctx
        for block in (256, 512):
            try:
                out = pr2.rns2_pow_pallas(ctx, x, digits, window,
                                          block=block)
                got = eng.decode(out[:4])
                ok = got == want
                t0 = time.perf_counter()
                for _ in range(3):
                    out = pr2.rns2_pow_pallas(ctx, x, digits, window,
                                              block=block)
                np.asarray(out[:1, :1])
                dt = (time.perf_counter() - t0) / 3
                print(f"{variant:10s} block={block} {dt*1e3:7.1f}ms "
                      f"enc/s={B/dt:8,.0f} correct={ok}")
            except Exception as ex:
                print(f"{variant:10s} block={block} FAIL "
                      f"{type(ex).__name__}: {str(ex)[:200]}")


if __name__ == "__main__":
    main()
