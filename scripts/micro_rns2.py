"""Microbenchmark: fused RNS2 modexp kernel on the live backend."""
import time, sys, random
import jax, jax.numpy as jnp, numpy as np
from paillier_tpu.bigint.rns2 import Rns2Engine
from paillier_tpu.bigint import montgomery as mont, host

bits = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
ebits = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
rng = random.Random(7)
N = rng.getrandbits(bits) | (1 << (bits-1)) | 1
eng = Rns2Engine(N)
print(f"k={eng.spec.k} C={eng.spec.C}", file=sys.stderr)
xs = [rng.randrange(N) for _ in range(B)]
x = eng.from_limbs(jnp.asarray(host.ints_to_limbs(xs, eng.converter.L)))
e = rng.getrandbits(ebits) | (1 << (ebits-1))

from paillier_tpu.bigint.pallas_rns2 import rns2_pow_pallas

def timeit(fn, iters=5):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter()-t0)
    return min(ts)

for window in (4, 5, 6):
    for block in (None, 256):
        nd = mont.n_digits_for_bits(ebits, window)
        dig = jnp.asarray(mont.exp_digits(e, window, nd))
        nmm = nd*window + nd + (1 << window) - 1 + 2
        try:
            out = rns2_pow_pallas(eng.ctx, x, dig, window, block)
            got = eng.decode(out[:2])
            want = [pow(v, e, N) for v in xs[:2]]
            ok = [g % N for g in got] == want
            t = timeit(lambda: rns2_pow_pallas(eng.ctx, x, dig, window, block))
        except Exception as ex:
            print(f"w={window} blk={block}: FAIL {type(ex).__name__}: {str(ex)[:90]}")
            continue
        print(f"w={window} blk={block}: ok={ok} {t*1e3:.1f} ms  {B/t:.0f} exp/s  "
              f"{B*nmm/t/1e6:.0f} Mmmul/s")
