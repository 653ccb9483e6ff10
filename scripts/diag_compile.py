"""Diagnose where bench_encrypt(2048) spends its first 10 minutes."""
import time, sys, random
sys.path.insert(0, "/root/repo")

t00 = time.time()
def stamp(msg):
    print(f"[{time.time()-t00:7.1f}s] {msg}", flush=True)

import jax, jax.numpy as jnp, numpy as np
stamp(f"jax imported, backend={jax.default_backend()}")

from paillier_tpu.core.keygen import keygen
rng = random.Random(0xBE7C)
sk, pk = keygen(2048, rng)
stamp("keygen done")

from paillier_tpu.bigint.rns2 import Rns2Spec
t0 = time.time()
spec = Rns2Spec(pk.n2)
stamp(f"Rns2Spec built (k={spec.k}) in {time.time()-t0:.1f}s")

t0 = time.time()
ctx = spec.build_context()
stamp(f"build_context in {time.time()-t0:.1f}s")

from paillier_tpu.bigint.rns2 import Rns2Converter
from paillier_tpu.bigint import host
t0 = time.time()
conv = Rns2Converter(spec, ctx, host.limbs_for_bits(4096))
stamp(f"converter in {time.time()-t0:.1f}s")

from paillier_tpu.bigint import montgomery as mont
from paillier_tpu.bigint.pallas_rns2 import rns2_pow_pallas

B = 4096
window = 4
ns = pk.n
nd = mont.n_digits_for_bits(ns.bit_length(), window)
dig = jnp.asarray(mont.exp_digits(ns, window, nd))
xs = [rng.randrange(pk.n2) for _ in range(4)]
x = conv.from_limbs(jnp.asarray(host.ints_to_limbs(xs * (B // 4), conv.L)))
jax.block_until_ready(x)
stamp(f"inputs ready, D={nd}")

t0 = time.time()
lowered = rns2_pow_pallas.lower(ctx, x, dig, window)
stamp(f"lowered in {time.time()-t0:.1f}s")
t0 = time.time()
compiled = lowered.compile()
stamp(f"compiled in {time.time()-t0:.1f}s")
t0 = time.time()
out = jax.block_until_ready(compiled(ctx, x, dig))
stamp(f"first run in {time.time()-t0:.1f}s")
t0 = time.time()
out = jax.block_until_ready(compiled(ctx, x, dig))
dt = time.time()-t0
stamp(f"second run in {dt:.3f}s -> {B/dt:.0f} exp/s")
