"""Ablate the REAL pow kernel by monkeypatching rns2_mont_mul_pair."""
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
                                      I2_M, I2_U0, _chunks, _dot_i8, _red)

ORIG = rns2.rns2_mont_mul_pair


def make_mmul(variant):
    def mmul(ctx, x, y):
        if variant == "full":
            return ORIG(ctx, x, y)
        x1, x2 = x
        y1, y2 = y
        m1 = ctx.ic1[I1_M]
        m2 = ctx.ic2[I2_M]
        inv1 = ctx.f1[0]
        inv2 = ctx.f2[0]

        def red2(v, m, inv):
            q = jnp.floor(v.astype(jnp.float32) * inv).astype(jnp.int32)
            return v - q * m

        if variant == "dots":
            lhs = jnp.concatenate([x1 & 127, y1 & 127],
                                  axis=-1).astype(jnp.int8)
            a = _dot_i8(lhs, ctx.e1lo)
            b = _dot_i8(lhs, ctx.e1hi)
            lhs2 = jnp.concatenate([(a + x2) & 127, (b + y2) & 127],
                                   axis=-1).astype(jnp.int8)
            c = _dot_i8(lhs2, ctx.e2lo)
            d = _dot_i8(lhs2, ctx.e2hi)
            return c & 0x1FFF, d & 0x1FFF
        red = red2 if variant == "nofix" else _red
        s1 = red(x1 * y1, m1, inv1)
        s2 = red(x2 * y2, m2, inv2)
        a0, a1 = _chunks(s1)
        lhs1 = jnp.concatenate([a0, a1], axis=-1).astype(jnp.int8)
        Plo = _dot_i8(lhs1, ctx.e1lo)
        Phi = _dot_i8(lhs1, ctx.e1hi)
        v = Plo + (Phi << CHUNK)
        t1 = s2 * ctx.ic2[I2_U0]
        w2 = red(v + t1, m2, inv2)
        sg = red(w2 * ctx.ic2[I2_K30], m2, inv2)
        s0, s1c = _chunks(sg)
        lhs2 = jnp.concatenate([s0, s1c], axis=-1).astype(jnp.int8)
        Vlo = _dot_i8(lhs2, ctx.e2lo)
        Vhi = _dot_i8(lhs2, ctx.e2hi)
        v1 = Vlo + (Vhi << CHUNK)
        if variant == "noalpha":
            alpha = jnp.int32(3)
        else:
            alpha = jnp.floor(
                jnp.sum(sg.astype(jnp.float32) * inv2, axis=-1,
                        keepdims=True) + COX_EPS).astype(jnp.int32)
        w1 = red(v1 - alpha * ctx.ic1[I1_M2M], m1, inv1)
        return w1, w2
    return mmul


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

    for variant in ("full", "noalpha", "nofix", "dots"):
        pr2.rns2_mont_mul_pair = make_mmul(variant)
        pr2.rns2_pow_pallas.clear_cache()
        for block in (256,):
            out = pr2.rns2_pow_pallas(eng.ctx, x, digits, window,
                                      block=block)
            np.asarray(out[:1, :1])
            t0 = time.perf_counter()
            for _ in range(3):
                out = pr2.rns2_pow_pallas(eng.ctx, x, digits, window,
                                          block=block)
            np.asarray(out[:1, :1])
            dt = (time.perf_counter() - t0) / 3
            mmuls = nd * (window + 1) + (1 << window)
            macs = mmuls * 4 * B * 2 * spec.k * spec.k
            print(f"{variant:8s} block={block} {dt*1e3:7.1f}ms "
                  f"enc/s={B/dt:8,.0f} i8-TOPS={macs*2/dt/1e12:6.1f}")


if __name__ == "__main__":
    main()
