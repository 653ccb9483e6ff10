"""(window, block) sweep on the production sliding-window kernel."""
import sys
import time

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from paillier_tpu.bigint import host
from paillier_tpu.bigint.rns2 import Rns2Engine, sliding_window_schedule
from paillier_tpu.bigint.pallas_rns2 import rns2_pow_sliding_pallas

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

for w in (6, 7):
    sched = jnp.asarray(sliding_window_schedule(e, w))
    for block in (256, 512, 1024):
        try:
            out = rns2_pow_sliding_pallas(eng.ctx, x, sched, w, block=block)
            ok = eng.decode(out[:4]) == want
            t0 = time.perf_counter()
            for _ in range(3):
                out = rns2_pow_sliding_pallas(eng.ctx, x, sched, w,
                                              block=block)
            np.asarray(out[:1, :1])
            dt = (time.perf_counter() - t0) / 3
            print(f"w={w} block={block:5d} {dt*1e3:7.1f}ms "
                  f"enc/s={B/dt:8,.0f} correct={ok}", flush=True)
        except Exception as ex:
            print(f"w={w} block={block:5d} FAIL {type(ex).__name__}: "
                  f"{str(ex)[:150]}", flush=True)
