"""Surgical single-change ablations on the real sliding kernel.

no_alpha:   cox alpha replaced by constant 0 (wrong results; measures
            the full cost of the f32 cross-lane sum + fixup chain).
alpha_once: alpha computed but jnp.sum replaced by a 2-level strided
            reshape-sum (320 = 64x5) to see if the reduce shape matters.
fold_u0:    w2 path computed as red_lazy(x2*U0)*y2 (one fewer wide red).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")
import paillier_tpu.bigint.rns2 as rns2
import paillier_tpu.bigint.pallas_rns2 as pr2
from paillier_tpu.bigint import host
from paillier_tpu.bigint.rns2 import (CHUNK, COX_EPS, I1_M, I1_M2M, I2_K30,
                                      I2_M, I2_U0, _chunks, _dot_i8, _red,
                                      _red_lazy)

ORIG = rns2.rns2_mont_mul_pair


def make(variant):
    def mmul(ctx, x, y, lazy=False):
        x1, x2 = x
        y1, y2 = y
        m1 = ctx.ic1[I1_M]
        m2 = ctx.ic2[I2_M]
        inv1 = ctx.f1[0]
        inv2 = ctx.f2[0]
        out_red = _red_lazy if lazy else _red

        s1 = _red(x1 * y1, m1, inv1)
        a0, a1 = _chunks(s1)
        lhs1 = jnp.concatenate([a0, a1], axis=-1).astype(jnp.int8)
        Plo = _dot_i8(lhs1, ctx.e1lo)
        Phi = _dot_i8(lhs1, ctx.e1hi)
        v = Plo + (Phi << CHUNK)
        if variant == "fold_u0":
            xu = _red_lazy(x2 * ctx.ic2[I2_U0], m2, inv2)
            t1 = xu * y2
        else:
            s2 = _red_lazy(x2 * y2, m2, inv2)
            t1 = s2 * ctx.ic2[I2_U0]
        w2 = out_red(v + t1, m2, inv2)
        sg = _red(w2 * ctx.ic2[I2_K30], m2, inv2)
        s0, s1c = _chunks(sg)
        lhs2 = jnp.concatenate([s0, s1c], axis=-1).astype(jnp.int8)
        Vlo = _dot_i8(lhs2, ctx.e2lo)
        Vhi = _dot_i8(lhs2, ctx.e2hi)
        v1 = Vlo + (Vhi << CHUNK)
        if variant == "no_alpha":
            alpha = jnp.zeros_like(v1[..., :1])
        elif variant == "alpha_once":
            sgf = (sg.astype(jnp.float32) * inv2)
            part = jnp.sum(sgf.reshape(sgf.shape[:-1] + (5, 64)), axis=-1)
            alpha = jnp.floor(jnp.sum(part, axis=-1, keepdims=True)
                              + COX_EPS).astype(jnp.int32)
        else:
            alpha = jnp.floor(
                jnp.sum(sg.astype(jnp.float32) * inv2, axis=-1,
                        keepdims=True) + COX_EPS).astype(jnp.int32)
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

    for name in ("orig", "no_alpha", "alpha_once", "fold_u0"):
        mm = ORIG if name == "orig" else make(name)
        pr2.rns2_mont_mul_pair = mm
        pr2.rns2_pow_sliding_pallas.clear_cache()
        try:
            out = pr2.rns2_pow_sliding_pallas(eng.ctx, x, sched, 6,
                                              block=512)
            ok = eng.decode(out[:4]) == want
            t0 = time.perf_counter()
            for _ in range(3):
                out = pr2.rns2_pow_sliding_pallas(eng.ctx, x, sched, 6,
                                                  block=512)
            np.asarray(out[:1, :1])
            dt = (time.perf_counter() - t0) / 3
            print(f"{name:10s} {dt*1e3:7.1f}ms enc/s={B/dt:8,.0f} "
                  f"correct={ok}", flush=True)
        except Exception as ex:
            print(f"{name:10s} FAIL {type(ex).__name__}: {str(ex)[:150]}",
                  flush=True)


if __name__ == "__main__":
    main()
