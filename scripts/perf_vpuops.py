"""Per-op VPU cost on [4096, 320] int32 tiles inside one Pallas kernel.

Times a chain of REPS identical ops per variant to get the cost of one
VPU pass for each op class (int32 add / int32 mul / f32 mul / cast /
where-select / shift / lane-sum), pipelined timing.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, k = 4096, 320
BLK = 512
REPS = 2000


def mk(variant):
    def kern(x_ref, f_ref, o_ref):
        x = x_ref[...]
        f = f_ref[...]

        def body(i, x):
            if variant == "add":
                return x + 12345
            if variant == "mul":
                return x * 12347
            if variant == "mulvar":
                return (x * (x | 1)) & 0x3FFF
            if variant == "shift":
                return (x << 7) & 0xFFFF
            if variant == "where":
                return jnp.where(x > 8192, x - 8192, x)
            if variant == "castf":
                return x + f.astype(jnp.int32)
            if variant == "fmul":
                return x + (f * 1.5).astype(jnp.int32)
            if variant == "floor":
                return x + jnp.floor(f).astype(jnp.int32)
            if variant == "lanesum":
                return x + jnp.sum(f, axis=-1, keepdims=True
                                   ).astype(jnp.int32)
            if variant == "red":
                q = jnp.floor(x.astype(jnp.float32)
                              * 6.1e-5).astype(jnp.int32)
                r = x - q * 16383
                r = jnp.where(r < 0, r + 16383, r)
                return jnp.where(r >= 16383, r - 16383, r)
            if variant == "redfast":
                q = ((x - 420).astype(jnp.float32)
                     * 6.1e-5).astype(jnp.int32)
                return x - q * 16383
            if variant == "redlazy":
                q = jnp.floor(x.astype(jnp.float32)
                              * 6.1e-5).astype(jnp.int32)
                return x - q * 16383
            raise ValueError(variant)

        o_ref[...] = lax.fori_loop(0, REPS, body, x)
    return kern


rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 16000, (B, k), dtype=np.int32))
f = jnp.asarray(rng.random((B, k), dtype=np.float32) * 100)

base = None
for variant in (sys.argv[1:] or
                ["add", "mul", "mulvar", "shift", "where", "castf",
                 "fmul", "floor", "lanesum", "red", "redfast",
                 "redlazy"]):
    xs = pl.BlockSpec((BLK, k), lambda b: (b, 0), memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        mk(variant), grid=(B // BLK,), in_specs=[xs, xs], out_specs=xs,
        out_shape=jax.ShapeDtypeStruct((B, k), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * (1 << 20)))
    g = jax.jit(fn)
    try:
        np.asarray(g(x, f)[:1, :1])
    except Exception as ex:
        print(f"{variant:8s} FAIL {str(ex)[:100]}", flush=True)
        continue
    t0 = time.perf_counter()
    for _ in range(5):
        out = g(x, f)
    np.asarray(out[:1, :1])
    dt = (time.perf_counter() - t0) / 5
    ns = dt / REPS * 1e9
    print(f"{variant:8s} {dt*1e3:7.2f}ms  {ns:6.0f} ns/pass", flush=True)
