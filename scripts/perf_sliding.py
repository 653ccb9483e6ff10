"""Benchmark + verify the sliding-window shared-exponent kernel."""
import sys
import time

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from paillier_tpu.bigint import host
from paillier_tpu.bigint import montgomery as mont
from paillier_tpu.bigint.rns2 import Rns2Engine, sliding_window_schedule
from paillier_tpu.bigint.pallas_rns2 import (rns2_pow_pallas,
                                             rns2_pow_sliding_pallas)


def main():
    nbits = 4096
    rng = np.random.default_rng(7)
    n_mod = int.from_bytes(rng.bytes(nbits // 8)) | (1 << (nbits - 1)) | 1
    eng = Rns2Engine(n_mod)
    B = 4096
    xs = [int.from_bytes(rng.bytes(nbits // 8)) % n_mod for _ in range(B)]
    x = eng.from_limbs(jnp.asarray(host.ints_to_limbs(xs, eng.converter.L)))
    np.asarray(x[:1, :1])
    e = int.from_bytes(rng.bytes(256)) | (1 << 2047)
    want = [pow(xi, e, n_mod) for xi in xs[:4]]

    # baseline: fixed window 4
    nd = mont.n_digits_for_bits(e.bit_length(), 4)
    digits = jnp.asarray(mont.exp_digits(e, 4, nd))
    out = rns2_pow_pallas(eng.ctx, x, digits, 4, block=512)
    assert eng.decode(out[:4]) == want, "w4 baseline wrong"
    t0 = time.perf_counter()
    for _ in range(3):
        out = rns2_pow_pallas(eng.ctx, x, digits, 4, block=512)
    np.asarray(out[:1, :1])
    dt = (time.perf_counter() - t0) / 3
    print(f"fixed-w4    blk=512 {dt*1e3:7.1f}ms enc/s={B/dt:8,.0f}")

    for w in (5, 6, 7):
        sched = jnp.asarray(sliding_window_schedule(e, w))
        mm = 2 + (1 << (w - 1)) - 1 + (sched.shape[0] - 1) \
            + int(np.sum(np.asarray(sched[1:]) >= 0)) + 1
        for blk in (256, 512):
            try:
                out = rns2_pow_sliding_pallas(eng.ctx, x, sched, w,
                                              block=blk)
                ok = eng.decode(out[:4]) == want
                t0 = time.perf_counter()
                for _ in range(3):
                    out = rns2_pow_sliding_pallas(eng.ctx, x, sched, w,
                                                  block=blk)
                np.asarray(out[:1, :1])
                dt = (time.perf_counter() - t0) / 3
                print(f"sliding-w{w}  blk={blk} {dt*1e3:7.1f}ms "
                      f"enc/s={B/dt:8,.0f} mmuls={mm} correct={ok}")
            except Exception as ex:
                print(f"sliding-w{w}  blk={blk} FAIL "
                      f"{type(ex).__name__}: {str(ex)[:160]}")


if __name__ == "__main__":
    main()
