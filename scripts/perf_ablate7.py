"""Aligned-fused extension dots: one [B,2k]x[2k,2*ceil(k/128)*128] dot
per extension with lo cols at [0:k) and hi cols at [kp:kp+k), so both
output slices are 128-lane aligned (ablate3's fused variant sliced at
offset k=320 — misaligned — and lost its gain to lane-shift copies).
Same padded MAC count as the two split dots; halves the dependent-dot
count per Montgomery multiply."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import paillier_tpu.bigint.rns2 as rns2
import paillier_tpu.bigint.pallas_rns2 as pr2
from paillier_tpu.bigint import host
from paillier_tpu.bigint.rns2 import (CHUNK, COX_EPS, I1_M, I1_M2M, I2_K30,
                                      I2_M, I2_U0, _chunks, _dot_i8, _red,
                                      _red_lazy)

ORIG = rns2.rns2_mont_mul_pair
KP = 384


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
    P = _dot_i8(lhs1, ctx.e1lo)                  # [.., 2*KP] fused
    v = P[..., :k] + (P[..., KP:KP + k] << CHUNK)
    t1 = s2 * ctx.ic2[I2_U0]
    w2 = out_red(v + t1, m2, inv2)
    sg = _red(w2 * ctx.ic2[I2_K30], m2, inv2)
    s0, s1c = _chunks(sg)
    lhs2 = jnp.concatenate([s0, s1c], axis=-1).astype(jnp.int8)
    V = _dot_i8(lhs2, ctx.e2lo)
    v1 = V[..., :k] + (V[..., KP:KP + k] << CHUNK)
    alpha = jnp.floor(
        jnp.sum(sg.astype(jnp.float32) * inv2, axis=-1, keepdims=True)
        + COX_EPS).astype(jnp.int32)
    w1 = out_red(v1 - alpha * ctx.ic1[I1_M2M], m1, inv1)
    return w1, w2


def fuse_ctx(ctx):
    k = ctx.ic1.shape[-1]
    def fuse(lo, hi):
        out = np.zeros((2 * k, 2 * KP), dtype=np.int8)
        out[:, :k] = np.asarray(lo)
        out[:, KP:KP + k] = np.asarray(hi)
        return jnp.asarray(out)
    dummy = jnp.zeros((8, 128), jnp.int8)
    return ctx._replace(e1lo=fuse(ctx.e1lo, ctx.e1hi), e1hi=dummy,
                        e2lo=fuse(ctx.e2lo, ctx.e2hi), e2hi=dummy)


def main():
    nbits = 4096
    rng = np.random.default_rng(7)
    n_mod = int.from_bytes(rng.bytes(nbits // 8)) | (1 << (nbits - 1)) | 1
    eng = rns2.Rns2Engine(n_mod)
    B = 4096
    xs = [int.from_bytes(rng.bytes(nbits // 8)) % n_mod for _ in range(B)]
    x = eng.from_limbs(jnp.asarray(host.ints_to_limbs(xs, eng.converter.L)))
    np.asarray(x[:1, :1])
    e = int.from_bytes(rng.bytes(256)) | (1 << 2047)
    sched = jnp.asarray(rns2.sliding_window_schedule(e, 6))
    want = [pow(xi, e, n_mod) for xi in xs[:4]]
    fctx = fuse_ctx(eng.ctx)

    for name, mm, ctx in (("orig", ORIG, eng.ctx),
                          ("fused_al", fused_mmul, fctx)):
        pr2.rns2_mont_mul_pair = mm
        pr2.rns2_pow_sliding_pallas.clear_cache()
        for block in (512, 1024):
            try:
                out = pr2.rns2_pow_sliding_pallas(ctx, x, sched, 6,
                                                  block=block)
                ok = eng.decode(out[:4]) == want
                t0 = time.perf_counter()
                for _ in range(3):
                    out = pr2.rns2_pow_sliding_pallas(ctx, x, sched, 6,
                                                      block=block)
                np.asarray(out[:1, :1])
                dt = (time.perf_counter() - t0) / 3
                print(f"{name:9s} block={block} {dt*1e3:7.1f}ms "
                      f"enc/s={B/dt:8,.0f} correct={ok}", flush=True)
            except Exception as ex:
                print(f"{name:9s} block={block} FAIL {type(ex).__name__}: "
                      f"{str(ex)[:150]}", flush=True)


if __name__ == "__main__":
    main()
