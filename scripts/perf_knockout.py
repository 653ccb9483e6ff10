"""Knockout ablation: remove one piece of the Montgomery-multiply stage
pipeline at a time (results become WRONG — timing only) to see where the
per-mmul time goes on the live chip.

Usage: python scripts/perf_knockout.py [KNOCKOUT ...]
Knockouts:
  full     : production kernel (correctness-checked)
  noalpha  : cox alpha = 0            (removes f32 cast+mul+lane-sum+floor)
  nosum    : alpha without lane-sum   (isolates the [B,k] lane reduction)
  nohidot  : hi dots reuse lo dots    (halves MXU issue: 4 -> 2 dots)
  nodot2   : ext2 reuses ext1 output  (removes 2 of 4 dots, keeps deps)
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import paillier_tpu.bigint.rns2 as rns2
from paillier_tpu.bigint import host

import os
BLOCK = int(os.environ.get("BLOCK", "512"))
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

orig = {n: getattr(rns2, n) for n in
        ("_mm_lhs1", "_mm_ext1", "_mm_lhs2", "_mm_ext2", "_mm_finish",
         "_red_digit_lazy", "_red_out_lazy")}


def restore():
    for n, f in orig.items():
        setattr(rns2, n, f)


def apply(ko):
    restore()
    if ko == "full":
        return
    if ko == "noalpha":
        def fin(ctx, V, sg, lazy):
            Vlo, Vhi = V
            out_red = rns2._red_out_lazy if lazy else rns2._red
            v1 = Vlo + (Vhi << rns2.CHUNK)
            return out_red(v1, ctx.ic1[rns2.I1_M], ctx.f1[0])
        rns2._mm_finish = fin
    elif ko == "nosum":
        def fin(ctx, V, sg, lazy):
            Vlo, Vhi = V
            out_red = rns2._red_out_lazy if lazy else rns2._red
            v1 = Vlo + (Vhi << rns2.CHUNK)
            alpha = jnp.floor(
                sg[..., :1].astype(jnp.float32) * ctx.f2[0, :1]
                + rns2.COX_EPS).astype(jnp.int32)
            return out_red(v1 + alpha * ctx.ic1[rns2.I1_M2M],
                           ctx.ic1[rns2.I1_M], ctx.f1[0])
        rns2._mm_finish = fin
    elif ko == "nohidot":
        def ext1(ctx, lhs1):
            lo = rns2._dot_i8(lhs1, ctx.e1g[:, :ctx.k])
            return lo, lo
        def ext2(ctx, lhs2):
            lo = rns2._dot_i8(lhs2, ctx.e2g[:, :ctx.k])
            return lo, lo
        rns2._mm_ext1 = ext1
        rns2._mm_ext2 = ext2
    elif ko == "nodot2":
        def ext2(ctx, lhs2):
            lo = rns2._dot_i8(lhs2, ctx.e2g[:, :ctx.k])
            return lo, lo
        rns2._mm_ext2 = ext2
    elif ko == "halflhs":
        # lo-chunk-only lhs (wrong results): removes the _pack_digits
        # lane-concat AND halves the dot contraction rows — an upper
        # bound on (pack cost + dot row-scaling) together

        def lhs1(ctx, x, y, lazy):
            x1, x2 = x
            y1, y2 = y
            digit_red = rns2._red_digit_lazy if lazy else rns2._red
            s1 = digit_red(x1 * y1, ctx.ic1[rns2.I1_M], ctx.f1[0])
            s2 = rns2._red_out_lazy(x2 * y2, ctx.ic2[rns2.I2_M], ctx.f2[0])
            return s1.astype(jnp.int8), s2     # [.., k] i8: no concat

        def ext1(ctx, lhs1v):
            k = ctx.k
            P = rns2._dot_i8(lhs1v, ctx.e1g[:k])
            return P[..., :k], P[..., ctx.pk:ctx.pk + k]

        def lhs2(ctx, P, s2, lazy):
            Plo, Phi = P
            m2 = ctx.ic2[rns2.I2_M]
            inv2 = ctx.f2[0]
            digit_red = rns2._red_digit_lazy if lazy else rns2._red
            v = Plo + (Phi << rns2.CHUNK)
            sg = digit_red(v + s2 * ctx.ic2[rns2.I2_U0S], m2, inv2)
            return sg.astype(jnp.int8), sg

        def ext2(ctx, lhs2v):
            k = ctx.k
            P = rns2._dot_i8(lhs2v, ctx.e2g[:k])
            return P[..., :k], P[..., ctx.pk:ctx.pk + k]

        rns2._mm_lhs1 = lhs1
        rns2._mm_ext1 = ext1
        rns2._mm_lhs2 = lhs2
        rns2._mm_ext2 = ext2
    elif ko == "nored":
        # digit reds become a single subtract (wrong results): isolates
        # the 6-op _red_fast cost (4 call sites per mmul)
        def red1(v, m, inv_m):
            return v - m
        rns2._red_digit_lazy = red1
        rns2._red_out_lazy = red1
    else:
        raise SystemExit(f"unknown knockout {ko}")


kos = sys.argv[1:] or ["full", "noalpha", "nosum", "nohidot", "nodot2"]
for ko in kos:
    apply(ko)
    # fresh jit cache per variant (the traced kernel closes over the
    # patched functions only at trace time)
    from paillier_tpu.bigint import pallas_rns2
    pallas_rns2.rns2_pow_sliding_pallas.clear_cache()
    sched = jnp.asarray(rns2.sliding_window_schedule(e, 6))
    out = pallas_rns2.rns2_pow_sliding_pallas(eng.ctx, x, sched, 6,
                                              block=BLOCK)
    ok = (eng.decode(out[:4]) == want) if ko == "full" else "-"
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = pallas_rns2.rns2_pow_sliding_pallas(eng.ctx, x, sched, 6,
                                                  block=BLOCK)
        np.asarray(out[:1, :1])
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{ko:8s} {dt*1e3:7.1f}ms  enc/s={B/dt:8,.0f}  correct={ok}",
          flush=True)
restore()
