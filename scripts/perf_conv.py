"""Pin the non-kernel milliseconds of enc2048 (VERDICT r4 #1 "pin every
remaining millisecond"): from_limbs, to_limbs_mod, the fused-G^m
prologue — each a cheap non-Mosaic jit, measured chained-on-device at
the production batch.  Run on the TPU after bench.py has warmed the
persistent cache (shares the encryptor's key/shapes)."""

import random
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")


def sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf.ravel()[:1])
    return out


def chained(fn, feed, x, inner=32, reps=3, label=""):
    @jax.jit
    def k_iter(a):
        out = lax.fori_loop(0, inner, lambda i, c: feed(fn(c), c), a)
        return jax.tree_util.tree_map(lambda v: v.ravel()[:1], out)

    sync(k_iter(x))
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(k_iter(x))
    dt = (time.perf_counter() - t0) / (reps * inner)
    print(f"  {label:38s} {dt*1e3:8.3f} ms/iter", flush=True)
    return dt


def main():
    from paillier_tpu.core.encrypt import Encryptor
    from paillier_tpu.core.keygen import keygen
    from paillier_tpu.core.keys import LEVEL_ONE, encode_batch
    from paillier_tpu.bigint.rns2 import rns2_one_plus_mul

    rng = random.Random(0xBE7C)
    sk, pk = keygen(2048, rng)
    dk = pk.device()
    enc = Encryptor(pk, LEVEL_ONE, window=4, rng=rng)
    eng = dk.rns(1)
    B = 4096
    ms = [rng.randrange(pk.n) for _ in range(B)]
    rs = [rng.randrange(2, pk.n) for _ in range(B)]
    m = encode_batch(ms, dk.L)
    r = encode_batch(rs, 2 * dk.L)
    L = dk.L

    print("enc2048 non-kernel decomposition (chained, B=4096):", flush=True)

    # identity feed baseline: measures the fori_loop/readback harness
    chained(lambda a: (a[0] + 1, a[1]), lambda out, a: out, (m, r),
            label="harness baseline (add-1)")

    # from_limbs: r limbs -> residues; feed residue low bits back as limbs
    res0 = eng.from_limbs(r)
    sync(res0)
    chained(lambda a: eng.from_limbs(a[0]),
            lambda out, a: ((out[..., :2 * L] & 0x7FFF)
                            .astype(jnp.uint32),),
            (r,), label="from_limbs(r) [2L limbs]")

    # to_limbs_mod: residues -> exact limbs mod N
    chained(lambda a: eng.to_limbs_mod(a[0]),
            lambda out, a: (jnp.concatenate(
                [out.astype(jnp.int32),
                 jnp.zeros((B, res0.shape[-1] - out.shape[-1]),
                           jnp.int32)], axis=-1) & 0x1FFF,),
            (res0,), label="to_limbs_mod(res)")

    # gm prologue: pad + from_limbs + one_plus_mul
    nrow = jnp.asarray(np.asarray(
        [pk.n % mi for mi in eng.spec.b1 + eng.spec.b2], dtype=np.int32))

    def gm(a):
        mw = jnp.pad(a, [(0, 0), (0, L)])
        return rns2_one_plus_mul(eng.ctx, eng.from_limbs(mw), nrow)

    chained(lambda a: gm(a[0]),
            lambda out, a: ((out[..., :L] & 0x7FFF).astype(jnp.uint32),),
            (m,), label="G^m prologue (pad+conv+affine)")

    # full fused encryption for reference
    chained(lambda a: enc._fn(m, a[0]), lambda out, a: (out,), (r,),
            inner=8, label="full fused enc._fn")


if __name__ == "__main__":
    main()
