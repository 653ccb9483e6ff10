"""Stage-by-stage profile of the (3,5)-threshold flow and the enc2048
overhead (VERDICT r4 #1/#3): where do 1.34 s/flow and the ~5.7 ms of
non-kernel encryption time actually go?

Replicates bench.py's exact shapes/seeds so every ladder compile hits
the warm persistent cache.  Run on the TPU (no env override).
"""

import random
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from bench import _SAFE_P1024, _SAFE_Q1024  # noqa: E402  (same fixtures)


def sync(out):
    # NOTE: plain dataclasses (PartialDecryptionBatch) are NOT pytrees —
    # tree_leaves would yield the object and silently skip the device
    # sync (r5: the partials stage briefly read as 2.7 ms dispatch-only).
    # Unwrap known containers to their arrays for the sync only.
    arrs = out
    if isinstance(out, (list, tuple)):
        arrs = [getattr(o, "c", o) for o in out]
    for leaf in jax.tree_util.tree_leaves(arrs):
        np.asarray(leaf.ravel()[:1] if hasattr(leaf, "ravel") else leaf)
    return out


def tstage(name, fn, warm=1, iters=2):
    for _ in range(warm):
        sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = sync(fn())
    dt = (time.perf_counter() - t0) / iters
    print(f"  {name:42s} {dt*1e3:9.1f} ms", flush=True)
    return out, dt


def profile_threshold():
    from paillier_tpu.core.encrypt import Encryptor
    from paillier_tpu.core.keys import LEVEL_ONE, encode_batch, decode_batch
    from paillier_tpu.threshold.decrypt import (combine, compute_lambda,
                                                lagrange_powers,
                                                partial_decrypt,
                                                partial_decrypt_all,
                                                verify_partial_decryptions,
                                                _tree_modmul)
    from paillier_tpu.threshold.keygen import ThresholdKeyGenerator
    from paillier_tpu.bigint import host, vpu
    from paillier_tpu.bigint import montgomery as mont

    batch, l, t_, window = 4096, 5, 3, 5
    rng = random.Random(0x7357)
    p, q = _SAFE_P1024, _SAFE_Q1024
    t0 = time.perf_counter()
    keys = ThresholdKeyGenerator(2048, l, t_, rng).generate_from_primes(
        p, (p - 1) // 2, q, (q - 1) // 2)
    print(f"threshold keygen: {time.perf_counter()-t0:.1f}s", flush=True)
    tpk = keys[0].public()
    enc = Encryptor(tpk, LEVEL_ONE, window=window, rng=rng)
    ms = [rng.randrange(tpk.n) for _ in range(batch)]
    ct = enc.encrypt(ms)
    sync(ct.c)

    print("threshold flow stages (batch=4096):", flush=True)

    shares, t_part = tstage("partial_decrypt_all (stacked)",
                            lambda: partial_decrypt_all(
                                keys[:t_], ct, window))

    # combine internals
    dk = tpk.device()
    ctx = dk.ctx_n2
    L = dk.L
    ids = [s.id for s in shares]
    lam2s = [2 * compute_lambda(tpk, s.id, ids) for s in shares]
    use = [(s, l2) for s, l2 in zip(shares, lam2s) if l2 != 0]
    stacked = jnp.stack([s.c.reshape((-1, 2 * L)) for s, _ in use])
    sync(stacked)

    powed, _ = tstage("lagrange_powers (stacked ladder)",
                      lambda: lagrange_powers(
                          tpk, stacked, [abs(l2) for _, l2 in use], window))

    one_r = jnp.zeros_like(powed).at[..., 0].set(1)
    sel = jnp.asarray(np.asarray([l2 > 0 for _, l2 in use]))[:, None, None]

    def trees():
        pos = _tree_modmul(ctx, jnp.where(sel, powed, one_r))
        neg = _tree_modmul(ctx, jnp.where(sel, one_r, powed))
        return pos, neg

    (pos, neg), _ = tstage("pos/neg tree products", trees)

    neg_vals = None

    def dec_neg():
        return decode_batch(neg.reshape((-1, 2 * L)))

    neg_vals, _ = tstage("decode_batch(neg) [host]", dec_neg)
    inv_vals, _ = tstage("modinv_batch mod n^2 [host]",
                         lambda: host.modinv_batch(neg_vals, tpk.n2))
    neg_inv_arr, _ = tstage("encode_batch(inv) [host]",
                            lambda: encode_batch(inv_vals, 2 * L))
    neg_inv = neg_inv_arr.reshape(neg.shape)

    def tail():
        cprime = mont.modmul(ctx, pos, neg_inv)
        onew = jnp.zeros_like(cprime).at[..., 0].set(1)
        um1, _ = vpu.sub(cprime, onew)
        lval = mont.exact_div(um1, dk.n_hensel_2L, 2 * L)[..., :L]
        const = jnp.asarray(host.int_to_limbs(
            tpk.combine_shares_constant, L))
        return mont.modmul(dk.ctx_n, lval,
                           jnp.broadcast_to(const, lval.shape))

    m_arr, _ = tstage("cprime+L+final mul (device)", tail)
    _, _ = tstage("decode_batch(m) [host]",
                  lambda: decode_batch(m_arr.reshape((-1, L))))

    out, t_flow = tstage("FULL flow (as bench)", lambda: combine(
        tpk, partial_decrypt_all(keys[:t_], ct, window),
        window), warm=0, iters=2)
    assert out == ms
    print(f"  => full flow {batch/t_flow:,.0f} flows/s", flush=True)


def profile_enc():
    from paillier_tpu.core.encrypt import Encryptor, gm_binomial
    from paillier_tpu.core.keygen import keygen
    from paillier_tpu.core.keys import LEVEL_ONE, encode_batch

    rng = random.Random(0xBE7C)
    t0 = time.perf_counter()
    sk, pk = keygen(2048, rng)
    print(f"keygen: {time.perf_counter()-t0:.1f}s", flush=True)
    dk = pk.device()
    enc = Encryptor(pk, LEVEL_ONE, window=4, rng=rng)
    batch = 4096
    ms = [rng.randrange(pk.n) for _ in range(batch)]
    rs = [rng.randrange(2, pk.n) for _ in range(batch)]
    m = encode_batch(ms, dk.L)
    r = encode_batch(rs, 2 * dk.L)
    eng = dk.rns(1)
    ns = pk.n

    print("enc2048 decomposition (single-dispatch, B=4096):", flush=True)
    tstage("full enc._fn", lambda: enc._fn(m, r), warm=2, iters=4)

    ladder_conv = jax.jit(lambda rr: eng.pow_shared(eng.from_limbs(rr), ns))
    rn_res, _ = tstage("from_limbs + ladder (residues out)",
                       lambda: ladder_conv(r), warm=2, iters=4)

    x_res = eng.from_limbs(r)
    sync(x_res)
    ladder_only = jax.jit(lambda xx: eng.pow_shared(xx, ns))
    tstage("ladder only (residues in/out)",
           lambda: ladder_only(x_res), warm=2, iters=4)

    gm_fn = jax.jit(lambda mm: gm_binomial(dk, mm, LEVEL_ONE))
    gm_arr, _ = tstage("gm_binomial alone", lambda: gm_fn(m), warm=2,
                       iters=4)

    def tail_fn(gm, rn):
        c_rns = eng.mul(eng.from_limbs(gm), rn)
        return dk._widen(eng.to_limbs_mod(c_rns), 1)

    tail_jit = jax.jit(tail_fn)
    tstage("gm->rns, eng.mul, to_limbs_mod, widen",
           lambda: tail_jit(gm_arr, rn_res), warm=2, iters=4)

    conv_jit = jax.jit(lambda rr: eng.from_limbs(rr))
    tstage("from_limbs alone", lambda: conv_jit(r), warm=2, iters=4)
    out_jit = jax.jit(lambda xx: dk._widen(eng.to_limbs_mod(xx), 1))
    tstage("to_limbs_mod + widen alone",
           lambda: out_jit(rn_res), warm=2, iters=4)


if __name__ == "__main__":
    which = sys.argv[1:] or ["enc", "threshold"]
    if "enc" in which:
        profile_enc()
    if "threshold" in which:
        profile_threshold()
