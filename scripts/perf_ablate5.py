"""Split the sliding-window kernel's time into MXU vs VPU shares.

Monkeypatches rns2_mont_mul_pair with degenerate variants that keep the
dependency chain alive but drop one side of the work:

  mxu_only: dots kept; all float-reciprocal reductions replaced by
            cheap masks (values are garbage, timing is honest).
  vpu_only: dots replaced by slice+broadcast (keeps deps, no MXU).
  alpha_mxu: real math, but the cox f32 cross-lane sum is computed as
             an MXU f32 dot with a [k,1] column instead of jnp.sum.
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
from paillier_tpu.bigint.rns2 import (CHUNK, COX_EPS, I1_M, I1_M2M, I2_K30,
                                      I2_M, I2_U0, _chunks, _dot_i8, _red,
                                      _red_lazy)
from jax import lax

ORIG = rns2.rns2_mont_mul_pair


def mxu_only(ctx, x, y, lazy=False):
    x1, x2 = x
    y1, y2 = y
    k = ctx.ic1.shape[-1]
    s1 = (x1 * y1) & 0x3FFF
    s2 = (x2 * y2) & 0x3FFF
    a0, a1 = _chunks(s1)
    lhs1 = jnp.concatenate([a0, a1], axis=-1).astype(jnp.int8)
    Plo = _dot_i8(lhs1, ctx.e1lo)
    Phi = _dot_i8(lhs1, ctx.e1hi)
    w2 = (Plo + (Phi << CHUNK) + s2 * ctx.ic2[I2_U0]) & 0x3FFF
    sg = (w2 * ctx.ic2[I2_K30]) & 0x3FFF
    s0, s1c = _chunks(sg)
    lhs2 = jnp.concatenate([s0, s1c], axis=-1).astype(jnp.int8)
    Vlo = _dot_i8(lhs2, ctx.e2lo)
    Vhi = _dot_i8(lhs2, ctx.e2hi)
    w1 = (Vlo + (Vhi << CHUNK)) & 0x3FFF
    return w1, w2


def vpu_only(ctx, x, y, lazy=False):
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
    fake = lhs1[:, :k].astype(jnp.int32) * 9 + lhs1[:, k:]  # no dot
    Plo, Phi = fake, fake
    v = Plo + (Phi << CHUNK)
    t1 = s2 * ctx.ic2[I2_U0]
    w2 = out_red(v + t1, m2, inv2)
    sg = _red(w2 * ctx.ic2[I2_K30], m2, inv2)
    s0, s1c = _chunks(sg)
    lhs2 = jnp.concatenate([s0, s1c], axis=-1).astype(jnp.int8)
    fake2 = lhs2[:, :k].astype(jnp.int32) * 9 + lhs2[:, k:]
    v1 = fake2 + (fake2 << CHUNK)
    alpha = jnp.floor(
        jnp.sum(sg.astype(jnp.float32) * inv2, axis=-1, keepdims=True)
        + COX_EPS).astype(jnp.int32)
    w1 = out_red(v1 - alpha * ctx.ic1[I1_M2M], m1, inv1)
    return w1, w2


def make_alpha_mxu():
    def mmul(ctx, x, y, lazy=False):
        x1, x2 = x
        y1, y2 = y
        m1 = ctx.ic1[I1_M]
        m2 = ctx.ic2[I2_M]
        inv1 = ctx.f1[0]
        inv2 = ctx.f2[0]
        out_red = _red_lazy if lazy else _red

        s1 = _red(x1 * y1, m1, inv1)
        s2 = _red_lazy(x2 * y2, m2, inv2)
        a0, a1 = _chunks(s1)
        lhs1 = jnp.concatenate([a0, a1], axis=-1).astype(jnp.int8)
        Plo = _dot_i8(lhs1, ctx.e1lo)
        Phi = _dot_i8(lhs1, ctx.e1hi)
        v = Plo + (Phi << CHUNK)
        t1 = s2 * ctx.ic2[I2_U0]
        w2 = out_red(v + t1, m2, inv2)
        sg = _red(w2 * ctx.ic2[I2_K30], m2, inv2)
        s0, s1c = _chunks(sg)
        lhs2 = jnp.concatenate([s0, s1c], axis=-1).astype(jnp.int8)
        Vlo = _dot_i8(lhs2, ctx.e2lo)
        Vhi = _dot_i8(lhs2, ctx.e2hi)
        v1 = Vlo + (Vhi << CHUNK)
        # cox alpha on the MXU: [B,k]x[k,1] f32 dot instead of a lane sum
        sgf = sg.astype(jnp.float32)
        col = ctx.f2.reshape(-1, 1)                       # [k,1]
        asum = lax.dot_general(sgf, col, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
        alpha = jnp.floor(asum + COX_EPS).astype(jnp.int32)
        w1 = out_red(v1 - alpha * ctx.ic1[I1_M2M], m1, inv1)
        return w1, w2
    return mmul


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

    variants = [("orig", ORIG), ("mxu_only", mxu_only),
                ("vpu_only", vpu_only), ("alpha_mxu", make_alpha_mxu())]
    for name, mm in variants:
        pr2.rns2_mont_mul_pair = mm
        pr2.rns2_pow_sliding_pallas.clear_cache()
        for block in (256, 512):
            try:
                out = pr2.rns2_pow_sliding_pallas(eng.ctx, x, sched, 6,
                                                  block=block)
                ok = (eng.decode(out[:4]) == want) if name in (
                    "orig", "alpha_mxu") else "n/a"
                t0 = time.perf_counter()
                for _ in range(3):
                    out = pr2.rns2_pow_sliding_pallas(eng.ctx, x, sched, 6,
                                                      block=block)
                np.asarray(out[:1, :1])
                dt = (time.perf_counter() - t0) / 3
                print(f"{name:10s} block={block} {dt*1e3:7.1f}ms "
                      f"enc/s={B/dt:8,.0f} correct={ok}", flush=True)
            except Exception as ex:
                print(f"{name:10s} block={block} FAIL "
                      f"{type(ex).__name__}: {str(ex)[:160]}", flush=True)


if __name__ == "__main__":
    main()
