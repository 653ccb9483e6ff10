"""In-kernel dot-shape variants at production scale (B=4096, block=512,
k=320, 2374 steps of 4-dot Montgomery-multiply-like chains).

  split4 : 4 dots [B,640]x[640,320]           (production)
  gap2   : 2 dots [B,640]x[640,768]           (lo|0|hi aligned gap, then
                                               aligned 384-slices)
  fused2 : 2 dots [B,640]x[640,640]           (lo|hi, pair via roll 320)
  wide1  : 1 dot  [B,640]x[640,768] reused 2x (weight-stationary probe)
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

B = 4096
BLK = 512
k = 320
STEPS = 2374


def dot(a, b):
    return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.int32)


def mk_kernel(variant):
    def kern(x_ref, mlo_ref, mhi_ref, gap_ref, fus_ref, o_ref):
        mlo, mhi = mlo_ref[...], mhi_ref[...]
        gap, fus = gap_ref[...], fus_ref[...]

        def step(x):
            if variant == "split4":
                lo = dot(x, mlo)
                hi = dot(x, mhi)
                v = lo + (hi << 7)
                lo2 = dot(x, mlo)
                hi2 = dot(x, mhi)
                v = v + lo2 + (hi2 << 7)
                v = v & 127
                return jnp.concatenate([v, v], axis=-1).astype(jnp.int8)
            if variant == "gap2":
                P = dot(x, gap)                      # [B, 768]
                v = (P[:, :384] + (P[:, 384:] << 7))[:, :k]
                P2 = dot(x, gap)
                v = v + (P2[:, :384] + (P2[:, 384:] << 7))[:, :k]
                v = v & 127
                return jnp.concatenate([v, v], axis=-1).astype(jnp.int8)
            if variant == "fused2":
                P = dot(x, fus)                      # [B, 640]
                Pr = pltpu.roll(P, 2 * k - k, 1)     # lane j <- j+k
                v = (P + (Pr << 7))[:, :k]
                P2 = dot(x, fus)
                P2r = pltpu.roll(P2, 2 * k - k, 1)
                v = v + (P2 + (P2r << 7))[:, :k]
                v = v & 127
                return jnp.concatenate([v, v], axis=-1).astype(jnp.int8)
            if variant == "wide1":
                P = dot(x, gap)
                v = (P[:, :384] + (P[:, 384:] << 7))[:, :k]
                v = v & 127
                return jnp.concatenate([v, v], axis=-1).astype(jnp.int8)
            raise ValueError(variant)

        o_ref[...] = lax.fori_loop(0, STEPS, lambda i, x: step(x),
                                   x_ref[...])
    return kern


rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 100, (B, 2 * k), dtype=np.int8))
mlo = jnp.asarray(rng.integers(0, 100, (2 * k, k), dtype=np.int8))
mhi = jnp.asarray(rng.integers(0, 100, (2 * k, k), dtype=np.int8))
gapm = np.zeros((2 * k, 768), dtype=np.int8)
gapm[:, :k] = np.asarray(mlo)
gapm[:, 384:384 + k] = np.asarray(mhi)
gap = jnp.asarray(gapm)
fus = jnp.asarray(np.concatenate([np.asarray(mlo), np.asarray(mhi)],
                                 axis=1))

for variant in (sys.argv[1:] or ["split4", "gap2", "fused2", "wide1"]):
    xs = pl.BlockSpec((BLK, 2 * k), lambda b: (b, 0),
                      memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda b: (0, 0),
                                  memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        mk_kernel(variant),
        grid=(B // BLK,),
        in_specs=[xs, full(mlo), full(mhi), full(gap), full(fus)],
        out_specs=xs,
        out_shape=jax.ShapeDtypeStruct((B, 2 * k), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * (1 << 20)),
    )
    g = jax.jit(f)
    try:
        np.asarray(g(x, mlo, mhi, gap, fus)[:1, :1])
    except Exception as ex:
        print(f"{variant:7s} FAIL {type(ex).__name__}: {str(ex)[:120]}",
              flush=True)
        continue
    t0 = time.perf_counter()
    for _ in range(3):
        out = g(x, mlo, mhi, gap, fus)
    np.asarray(out[:1, :1])
    dt = (time.perf_counter() - t0) / 3
    print(f"{variant:7s} {dt*1e3:7.2f}ms", flush=True)
