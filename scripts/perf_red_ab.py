"""A/B ablation of reduction-function variants in the fused sliding
kernel.  Usage: python scripts/perf_red_ab.py VARIANT [block]

Variants patch rns2's reduction helpers before the kernel traces:
  fast    : current code (trunc-bias reds everywhere in lazy path)
  oldred  : round-2 reductions (_red exact for digits, _red_lazy floor)
  floorb  : floor+bias (no conditional fixes, handles negatives)
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import paillier_tpu.bigint.rns2 as rns2
from paillier_tpu.bigint import host

variant = sys.argv[1] if len(sys.argv) > 1 else "fast"
block = int(sys.argv[2]) if len(sys.argv) > 2 else 512


def red_old(v, m, inv_m):
    q = jnp.floor(v.astype(jnp.float32) * inv_m).astype(jnp.int32)
    r = v - q * m
    r = jnp.where(r < 0, r + m, r)
    r = jnp.where(r >= m, r - m, r)
    return r


def red_lazy_old(v, m, inv_m):
    q = jnp.floor(v.astype(jnp.float32) * inv_m).astype(jnp.int32)
    return v - q * m


def red_floorb(v, m, inv_m):
    q = jnp.floor(v.astype(jnp.float32) * inv_m
                  - rns2.RED_BIAS).astype(jnp.int32)
    return v - q * m


if variant == "oldred":
    # r2 mix: exact digits (floor + 2 fixes), floor lazies
    rns2._red_digit_lazy = red_old
    rns2._red_out_lazy = red_lazy_old
elif variant == "floorb":
    rns2._red_digit_lazy = red_floorb
    rns2._red_out_lazy = red_floorb
elif variant == "mixed":
    # fast digits, floor-free outs but exact digit reds
    rns2._red_digit_lazy = red_old
    rns2._red_out_lazy = rns2._red_fast
elif variant == "fma":
    # bias folded into the f32 multiply-subtract (fma idiom)
    def red_fma(v, m, inv_m):
        q = (v.astype(jnp.float32) * inv_m
             - rns2.RED_BIAS_INT * inv_m).astype(jnp.int32)
        return v - q * m
    rns2._red_digit_lazy = red_fma
    rns2._red_out_lazy = red_fma
elif variant == "fast":
    pass
else:
    raise SystemExit(f"unknown variant {variant}")

nbits = 4096
rng = np.random.default_rng(7)
n_mod = int.from_bytes(rng.bytes(nbits // 8)) | (1 << (nbits - 1)) | 1
eng = rns2.Rns2Engine(n_mod)
B = 4096
xs = [int.from_bytes(rng.bytes(nbits // 8)) % n_mod for _ in range(B)]
x = eng.from_limbs(jnp.asarray(host.ints_to_limbs(xs, eng.converter.L)))
np.asarray(x[:1, :1])
e = int.from_bytes(rng.bytes(256)) | (1 << 2047)
want = [pow(xi, e, n_mod) for xi in xs[:4]]

from paillier_tpu.bigint.pallas_rns2 import rns2_pow_sliding_pallas

sched = jnp.asarray(rns2.sliding_window_schedule(e, 6))
out = rns2_pow_sliding_pallas(eng.ctx, x, sched, 6, block=block)
ok = eng.decode(out[:4]) == want
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    out = rns2_pow_sliding_pallas(eng.ctx, x, sched, 6, block=block)
    np.asarray(out[:1, :1])
    ts.append(time.perf_counter() - t0)
dt = min(ts)
print(f"variant={variant} block={block} {dt*1e3:7.1f}ms "
      f"enc/s={B/dt:8,.0f} correct={ok}", flush=True)
