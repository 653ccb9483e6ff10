"""Microbenchmark of rns2_pow_pallas: sweep window / block at the
headline config (2048-bit key -> 4096-bit modulus n^2, batch 4096,
shared 2048-bit exponent n)."""
import sys
import time
import random

import jax
import jax.numpy as jnp
import numpy as np

from paillier_tpu.bigint import host
from paillier_tpu.bigint import montgomery as mont
from paillier_tpu.bigint.rns2 import Rns2Engine
from paillier_tpu.bigint.pallas_rns2 import rns2_pow_pallas


def main():
    rng = random.Random(1234)
    nbits = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    # synthesize an odd modulus ~ n^2 for a nbits-bit key
    n = rng.getrandbits(nbits) | (1 << (nbits - 1)) | 1
    n2 = n * n
    eng = Rns2Engine(n2)
    spec = eng.spec
    print(f"# modulus bits={n2.bit_length()} k={spec.k} C={spec.C}",
          file=sys.stderr)

    xs = [rng.randrange(1, n2) for _ in range(batch)]
    L = eng.converter.L
    x_limbs = jnp.asarray(host.ints_to_limbs(xs, L))
    x = eng.from_limbs(x_limbs)
    x.block_until_ready()

    for window in (4, 5):
        nd = mont.n_digits_for_bits(n.bit_length(), window)
        digits = jnp.asarray(mont.exp_digits(n, window, nd))
        for block in (256, 512, 1024):
            try:
                t0 = time.perf_counter()
                out = rns2_pow_pallas(eng.ctx, x, digits, window,
                                      block=block)
                np.asarray(out[:1, :1])
                compile_t = time.perf_counter() - t0
                t0 = time.perf_counter()
                iters = 3
                for _ in range(iters):
                    out = rns2_pow_pallas(eng.ctx, x, digits, window,
                                          block=block)
                np.asarray(out[:1, :1])
                dt = (time.perf_counter() - t0) / iters
                # mmuls: n_digits*(window squarings + 1 mult) + table
                mmuls = nd * (window + 1) + (1 << window) - 2 + 2
                macs = mmuls * 4 * batch * 2 * spec.k * spec.k
                print(f"window={window} block={block or 'auto'} "
                      f"time={dt*1e3:.1f}ms enc/s={batch/dt:,.0f} "
                      f"mmuls={mmuls} int8-TOPS={macs*2/dt/1e12:.1f} "
                      f"(compile {compile_t:.1f}s)")
            except Exception as e:
                print(f"window={window} block={block}: FAIL {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
