"""In-process sweep on the merged-dot sliding kernel: reduction mix x
block size.  Pipelined timing (3 iters, one sync).  Usage:
    python scripts/perf_sweep2.py [mix:block ...]
mixes: oldred (exact digits + floor lazies), fast (trunc-bias both).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import paillier_tpu.bigint.rns2 as rns2
from paillier_tpu.bigint import host
from paillier_tpu.bigint import pallas_rns2

B = 4096
nbits = 4096
rng = np.random.default_rng(7)
n_mod = int.from_bytes(rng.bytes(nbits // 8)) | (1 << (nbits - 1)) | 1
eng = rns2.Rns2Engine(n_mod)
xs = [int.from_bytes(rng.bytes(nbits // 8)) % n_mod for _ in range(B)]
x = eng.from_limbs(jnp.asarray(host.ints_to_limbs(xs, eng.converter.L)))
np.asarray(x[:1, :1])
e = int.from_bytes(rng.bytes(256)) | (1 << 2047)
want = [pow(xi, e, n_mod) for xi in xs[:4]]
sched = jnp.asarray(rns2.sliding_window_schedule(e, 6))

MIXES = {
    "oldred": (rns2._red, rns2._red_lazy),
    "fast": (rns2._red_fast, rns2._red_fast),
    "dfast": (rns2._red_fast, rns2._red_lazy),
    "ofast": (rns2._red, rns2._red_fast),
}

configs = sys.argv[1:] or ["oldred:512", "fast:512", "oldred:256",
                           "oldred:1024"]
for cfg in configs:
    mix, block = cfg.split(":")
    block = int(block)
    rns2._red_digit_lazy, rns2._red_out_lazy = MIXES[mix]
    pallas_rns2.rns2_pow_sliding_pallas.clear_cache()
    t0 = time.time()
    out = pallas_rns2.rns2_pow_sliding_pallas(eng.ctx, x, sched, 6,
                                              block=block)
    np.asarray(out[:1, :1])
    tc = time.time() - t0
    ok = eng.decode(out[:4]) == want
    t0 = time.perf_counter()
    for _ in range(3):
        out = pallas_rns2.rns2_pow_sliding_pallas(eng.ctx, x, sched, 6,
                                                  block=block)
    np.asarray(out[:1, :1])
    dt = (time.perf_counter() - t0) / 3
    print(f"{mix:7s} block={block:5d} {dt*1e3:7.1f}ms "
          f"enc/s={B/dt:8,.0f} ok={ok} (compile {tc:.0f}s)", flush=True)
