"""Can Mosaic overlap MXU dots with independent VPU work at all?

Three kernels at the production shapes (block x k = 512 x 320):
  dots : chain of STEPS iterations, 4 dependent int8 dots each
         ([B,2k]x[2k,k], the two base extensions' lo/hi pairs)
  vpu  : chain of STEPS iterations of a representative VPU pass mix
         (muls + float-reciprocal reductions on [B,k] int32)
  both : the two chains, fully independent, interleaved in program order

If both ~= max(dots, vpu): the units overlap and the production kernel's
serial behavior is a scheduling problem worth attacking.
If both ~= dots + vpu: MXU streaming and VPU ALU ops share issue slots
and the only wins are issue-count reductions.
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
k = 320
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 600
VPU_PASSES = 3          # red-like groups per step (~10 ops each)


def dot(a, b):
    return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.int32)


def dots_step(x, mlo, mhi):
    lo = dot(x, mlo)
    hi = dot(x, mhi)
    lo2 = dot(x, mlo)
    hi2 = dot(x, mhi)
    v = (lo + hi + lo2 + hi2) & 127
    return jnp.concatenate([v, v], axis=-1).astype(jnp.int8)


def vpu_step(y, m, inv):
    for _ in range(VPU_PASSES):
        t = y * 12345
        q = jnp.floor(t.astype(jnp.float32) * inv).astype(jnp.int32)
        y = t - q * m
        y = jnp.where(y < 0, y + m, y)
        y = jnp.where(y >= m, y - m, y)
    return y


def k_dots(x_ref, mlo_ref, mhi_ref, y_ref, m_ref, inv_ref, o_ref, p_ref,
           *, steps):
    mlo, mhi = mlo_ref[...], mhi_ref[...]
    x = lax.fori_loop(0, steps,
                      lambda i, x: dots_step(x, mlo, mhi), x_ref[...])
    o_ref[...] = x
    p_ref[...] = y_ref[...]


def k_vpu(x_ref, mlo_ref, mhi_ref, y_ref, m_ref, inv_ref, o_ref, p_ref,
          *, steps):
    m, inv = m_ref[...], inv_ref[...]
    y = lax.fori_loop(0, steps,
                      lambda i, y: vpu_step(y, m, inv), y_ref[...])
    o_ref[...] = x_ref[...]
    p_ref[...] = y


def k_both(x_ref, mlo_ref, mhi_ref, y_ref, m_ref, inv_ref, o_ref, p_ref,
           *, steps):
    mlo, mhi = mlo_ref[...], mhi_ref[...]
    m, inv = m_ref[...], inv_ref[...]

    def body(i, c):
        x, y = c
        return dots_step(x, mlo, mhi), vpu_step(y, m, inv)

    x, y = lax.fori_loop(0, steps, body, (x_ref[...], y_ref[...]))
    o_ref[...] = x
    p_ref[...] = y


def run(kern, steps):
    f = pl.pallas_call(
        functools.partial(kern, steps=steps),
        out_shape=(jax.ShapeDtypeStruct((B, 2 * k), jnp.int8),
                   jax.ShapeDtypeStruct((B, k), jnp.int32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * (1 << 20)),
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 100, (B, 2 * k), dtype=np.int8))
    mlo = jnp.asarray(rng.integers(0, 100, (2 * k, k), dtype=np.int8))
    mhi = jnp.asarray(rng.integers(0, 100, (2 * k, k), dtype=np.int8))
    y = jnp.asarray(rng.integers(0, 10000, (B, k), dtype=np.int32))
    m = jnp.asarray(rng.integers(12000, 15000, (1, k), dtype=np.int32))
    m = jnp.broadcast_to(m, (B, k))
    inv = 1.0 / m.astype(jnp.float32)
    g = jax.jit(lambda *a: f(*a))
    args = (x, mlo, mhi, y, m, inv)
    np.asarray(g(*args)[1][:1, :1])
    t0 = time.perf_counter()
    for _ in range(3):
        out = g(*args)
    np.asarray(out[1][:1, :1])
    return (time.perf_counter() - t0) / 3


td = run(k_dots, STEPS)
tv = run(k_vpu, STEPS)
tb = run(k_both, STEPS)
print(f"B={B} k={k} steps={STEPS} vpu_groups={VPU_PASSES}")
print(f"dots alone : {td*1e3:7.2f}ms")
print(f"vpu  alone : {tv*1e3:7.2f}ms")
print(f"both       : {tb*1e3:7.2f}ms   sum={1e3*(td+tv):.2f}  "
      f"max={1e3*max(td,tv):.2f}  overlap_frac="
      f"{(td+tv-tb)/min(td,tv):.2f}")
