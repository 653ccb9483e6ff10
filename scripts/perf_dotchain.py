"""Pure dependent int8 dot chain inside one Pallas kernel — isolates
MXU + cast latency at the production extension shapes ([B,2k]x[2k,k]
twice per step, like one Montgomery multiply's two extensions)."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
k = 320
STEPS = 2374


def kernel(x_ref, mlo_ref, mhi_ref, o_ref, *, steps):
    mlo = mlo_ref[...]
    mhi = mhi_ref[...]

    def body(i, x):
        # extension 1
        lo = lax.dot_general(x, mlo, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
        hi = lax.dot_general(x, mhi, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
        v = (lo + hi) & 127
        x1 = jnp.concatenate([v, v], axis=-1).astype(jnp.int8)
        # extension 2
        lo2 = lax.dot_general(x1, mlo, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
        hi2 = lax.dot_general(x1, mhi, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
        v2 = (lo2 + hi2) & 127
        return jnp.concatenate([v2, v2], axis=-1).astype(jnp.int8)

    o_ref[...] = lax.fori_loop(0, steps, body, x_ref[...])


@functools.partial(jax.jit, static_argnames=("steps",))
def run(x, mlo, mhi, steps):
    spec = lambda a: pl.BlockSpec(a.shape, lambda: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(kernel, steps=steps),
        in_specs=[spec(x), spec(mlo), spec(mhi)],
        out_specs=spec(x),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * (1 << 20)),
    )(x, mlo, mhi)


rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 100, (B, 2 * k), dtype=np.int8))
mlo = jnp.asarray(rng.integers(0, 100, (2 * k, k), dtype=np.int8))
mhi = jnp.asarray(rng.integers(0, 100, (2 * k, k), dtype=np.int8))

out = run(x, mlo, mhi, STEPS)
jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(3):
    out = run(x, mlo, mhi, STEPS)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / 3
per_mmul = dt / STEPS
macs = 2 * (B * 2 * k * k)              # 4 dots, ideal
macs_pad = 2 * (B * 2 * k * 2 * 384)
print(f"B={B}: {dt*1e3:.1f}ms total, {per_mmul*1e6:.2f}us/mmul-equiv, "
      f"{2*macs/per_mmul/1e12:.0f} TOPS ideal / "
      f"{2*macs_pad/per_mmul/1e12:.0f} TOPS padded")
