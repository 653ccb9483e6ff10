"""Sustained int8 MXU rate for the extension-dot shapes.

Chains dependent dots the way the ladder does (output feeds next input
through a cheap mask+cast) and reports TOPS for:
  split:  [B,2k] x [2k,k] twice (current kernel shape)
  fused:  [B,2k] x [2k,2k] once
  chain of independent pairs (2-wide ILP)
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
k = int(sys.argv[2]) if len(sys.argv) > 2 else 320
STEPS = 200

rng = np.random.default_rng(0)
lhs0 = jnp.asarray(rng.integers(0, 100, (B, 2 * k), dtype=np.int8))
m_lo = jnp.asarray(rng.integers(0, 100, (2 * k, k), dtype=np.int8))
m_hi = jnp.asarray(rng.integers(0, 100, (2 * k, k), dtype=np.int8))
m_f = jnp.asarray(rng.integers(0, 100, (2 * k, 2 * k), dtype=np.int8))


def dot(a, b):
    return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.int32)


@jax.jit
def split_chain(x):
    def body(x, _):
        lo = dot(x, m_lo)
        hi = dot(x, m_hi)
        v = (lo + (hi << 7)) & 127
        x = jnp.concatenate([v, v], axis=-1).astype(jnp.int8)
        return x, None
    x, _ = lax.scan(body, x, None, length=STEPS)
    return x


@jax.jit
def fused_chain(x):
    def body(x, _):
        p = dot(x, m_f)
        x = (p & 127).astype(jnp.int8)
        return x, None
    x, _ = lax.scan(body, x, None, length=STEPS)
    return x


@jax.jit
def split_chain2(x):
    """Two independent chains (ILP)."""
    def body(c, _):
        a, b = c
        lo_a, hi_a = dot(a, m_lo), dot(a, m_hi)
        lo_b, hi_b = dot(b, m_lo), dot(b, m_hi)
        va = (lo_a + (hi_a << 7)) & 127
        vb = (lo_b + (hi_b << 7)) & 127
        a = jnp.concatenate([va, va], axis=-1).astype(jnp.int8)
        b = jnp.concatenate([vb, vb], axis=-1).astype(jnp.int8)
        return (a, b), None
    c, _ = lax.scan(body, (x[: B // 2], x[B // 2:]), None, length=STEPS)
    return c[0]


def bench(fn, x, macs_per_step):
    jax.block_until_ready(fn(x))
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 5
    tops = 2 * macs_per_step * STEPS / dt / 1e12
    print(f"  {dt*1e3:7.2f}ms  {tops:6.1f} TOPS")
    return tops


print(f"B={B} k={k}")
print("split (2x [B,2k]x[2k,k]):", end="")
bench(split_chain, lhs0, 2 * (B * 2 * k * k))
print("fused ([B,2k]x[2k,2k])  :", end="")
bench(fused_chain, lhs0, B * 2 * k * 2 * k)
print("split, 2 indep chains   :", end="")
bench(split_chain2, lhs0, 2 * (B * 2 * k * k))
