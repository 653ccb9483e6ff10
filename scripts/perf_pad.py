"""Ablation: can the 320->384 output-lane padding of the merged base
extensions be removed (VERDICT r4 #1b)?

The production merged ext dot is [B, 2k] x [2k, 2*pk] with pk =
roundup(k, 128): at k = 320 that issues 768 output lanes where only
2*320 = 640 carry data — 20% of issued MACs are padding, put there so
both chunk-group output slices sit at 128-aligned lane offsets (Mosaic
rejects non-aligned slices/broadcasts).

Experiments (all on the real chip, chained-on-device timing):
  1. dot-chain micro: [B,640]x[640,768] vs [B,640]x[640,640] vs
     [B,640]x[640,384] — does the MXU actually issue fewer MACs at 640
     lanes (5 groups) than 768 (6 groups)?
  2. lane-extraction micro: cost of pltpu.roll by 320 lanes on
     [B, 640] int32 inside a kernel (the unpadded layout needs
     P[:, 320:640] brought to lane 0; 320 = 2.5 vregs, so this is a
     genuine cross-lane rotate).
  3. if 1 shows the saving and 2 is cheap: a full nopad-ladder kernel
     variant vs the production sliding kernel, bit-checked.

Usage: python scripts/perf_pad.py [dots|roll|ladder]
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

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")


def sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf.ravel()[:1])
    return out


def time_chained(fn, x, inner=64, reps=3):
    @jax.jit
    def k_iter(a):
        out = lax.fori_loop(0, inner, lambda i, c: fn(c), a)
        return out.ravel()[:1]

    sync(k_iter(x))
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(k_iter(x))
    return (time.perf_counter() - t0) / (reps * inner)


def bench_dots():
    """Chained int8 dot at the three lane widths, inside one kernel
    (mirrors the ladder's VMEM-resident dots)."""
    B = 1024
    rng = np.random.default_rng(0)

    for lanes in (768, 640, 384):
        W = jnp.asarray(rng.integers(-100, 100, (640, lanes), np.int8))

        def kern(x_ref, w_ref, o_ref, *, steps=8):
            x = x_ref[...]
            w = w_ref[...]

            def body(i, acc):
                p = lax.dot_general(
                    acc.astype(jnp.int8), w,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                # fold lanes back to 640 feed width, data-dependent
                return jnp.concatenate(
                    [p & 63, jnp.zeros((B, 640 - min(lanes, 640)),
                                       jnp.int32)], axis=-1)[:, :640] \
                    if lanes < 640 else (p[:, :640] & 63)

            o_ref[...] = lax.fori_loop(0, steps, body, x)

        x = jnp.asarray(rng.integers(0, 64, (B, 640), np.int32))
        f = pl.pallas_call(
            functools.partial(kern),
            in_specs=[pl.BlockSpec((B, 640), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((640, lanes), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((B, 640), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 640), jnp.int32),
        )
        t = time_chained(lambda a: f(a, W), x, inner=16)
        # 8 dots per call
        per_dot = t / 8
        print(f"lanes={lanes}: {per_dot*1e6:8.1f} us/dot "
              f"({B*640*lanes/per_dot/1e12:.1f} Tmac/s)", flush=True)


def bench_roll():
    """Cost of a 320-lane rotate on [B, 640] int32 inside a kernel,
    vs a no-op baseline of the same elementwise work."""
    B = 1024

    def kern_roll(x_ref, o_ref, *, steps=32):
        x = x_ref[...]

        def body(i, acc):
            r = pltpu.roll(acc, 320, 1)
            return (acc + r) & 0xFFFF

        o_ref[...] = lax.fori_loop(0, steps, body, x)

    def kern_base(x_ref, o_ref, *, steps=32):
        x = x_ref[...]

        def body(i, acc):
            return (acc + acc) & 0xFFFF

        o_ref[...] = lax.fori_loop(0, steps, body, x)

    x = jnp.arange(B * 640, dtype=jnp.int32).reshape(B, 640)
    spec = pl.BlockSpec((B, 640), lambda: (0, 0), memory_space=pltpu.VMEM)
    for name, kern in (("roll+add", kern_roll), ("add-only", kern_base)):
        f = pl.pallas_call(
            functools.partial(kern),
            in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, 640), jnp.int32),
        )
        t = time_chained(f, x, inner=16)
        print(f"{name}: {t/32*1e6:8.2f} us/step", flush=True)


def bench_ladder():
    """Production sliding kernel, padded vs nopad (rns2._ext_split roll
    path), same shapes as the enc2048 headline ladder: k=320, w6,
    4096-bit shared exponent, B=4096, blk=1024.  Bit-checked, then
    chained-on-device timing for both variants."""
    import random

    from paillier_tpu.bigint.pallas_rns2 import rns2_pow_sliding_pallas
    from paillier_tpu.bigint.rns2 import (Rns2Engine,
                                          sliding_window_schedule)

    rng = random.Random(0xBE7C)
    n = rng.getrandbits(4096) | (1 << 4095) | 1
    eng = Rns2Engine(n)
    ctx = eng.ctx
    k = ctx.k
    print(f"k={k} pk={ctx.pk}", flush=True)
    window, B = 6, 4096
    e = n >> 2048          # 2048-bit exponent: the r^n production shape
    sched = jnp.asarray(sliding_window_schedule(e, window))
    xs = [rng.randrange(n) for _ in range(B)]
    xr = jnp.asarray(eng.encode(xs))

    for nopad in (False, True):
        t0 = time.perf_counter()
        out = rns2_pow_sliding_pallas(ctx, xr, sched, window, nopad=nopad)
        sync(out)
        print(f"nopad={nopad}: compile+run {time.perf_counter()-t0:.1f}s",
              flush=True)
        got = eng.decode(out[:4])
        want = [pow(x, e, n) for x in xs[:4]]
        assert got == want, f"nopad={nopad} WRONG"

        def step(c):
            o = rns2_pow_sliding_pallas(ctx, c, sched, window,
                                        nopad=nopad)
            return (o & 0x1FFF) + 2     # keep values in residue range

        @jax.jit
        def chain(c):
            o = lax.fori_loop(0, 4, lambda i, cc: step(cc), c)
            return o.ravel()[:1]

        sync(chain(xr))
        t0 = time.perf_counter()
        for _ in range(3):
            sync(chain(xr))
        t = (time.perf_counter() - t0) / 12
        print(f"nopad={nopad}: {t*1e3:7.1f} ms/ladder "
              f"({B/t:,.0f} exp/s)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["dots", "roll"]
    if "dots" in which:
        bench_dots()
    if "roll" in which:
        bench_roll()
    if "ladder" in which:
        bench_ladder()
