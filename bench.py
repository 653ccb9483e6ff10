"""Benchmark driver.  Prints ONE JSON line with the headline metric:
2048-bit Paillier encryptions/sec/chip (BASELINE target: 100,000).

Runs on whatever backend the ambient environment provides (the real TPU
chip under the driver).  Extra configs via argv:

    python bench.py            # headline: 2048-bit batched encryption
    python bench.py all        # every BASELINE config, one JSON line each
    python bench.py enc2048 dec2048 agg threshold ddleq enc1024
"""

import json
import random
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    """Force a real device->host readback: jax.block_until_ready can
    return early through the axon tunnel (measured r3), so timing must
    anchor on materialized bytes."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).ravel()[:1]
    return out


def _time(fn, *args, warmup=1, iters=3):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def _key(bits, seed=0xBE7C):
    from paillier_tpu.core.keygen import keygen
    rng = random.Random(seed)
    t0 = time.perf_counter()
    sk, pk = keygen(bits, rng)
    print(f"# keygen({bits}) took {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    return sk, pk, rng


def bench_encrypt(bits=2048, batch=4096, window=4, engine="auto",
                  check=64):
    from paillier_tpu.core.decrypt import Decryptor
    from paillier_tpu.core.encrypt import Encryptor
    from paillier_tpu.core.keys import LEVEL_ONE, Ciphertext, encode_batch
    sk, pk, rng = _key(bits)
    dk = pk.device()
    enc = Encryptor(pk, LEVEL_ONE, window=window, rng=rng, engine=engine)
    print(f"# engine: {enc.engine}", file=sys.stderr)
    ms = [rng.randrange(pk.n) for _ in range(batch)]
    rs = [rng.randrange(2, pk.n) for _ in range(batch)]
    m = encode_batch(ms, dk.L)
    r = encode_batch(rs, 2 * dk.L)
    t = _time(enc._fn, m, r)
    # correctness gate (VERDICT r2 #2): the TIMED kernel's output must
    # decrypt back — a miscompiled Mosaic kernel cannot emit a number.
    ct = Ciphertext(c=enc._fn(m, r)[:check], level=LEVEL_ONE)
    dec = Decryptor(sk, LEVEL_ONE, crt=True, window=window)
    got = dec.decrypt(ct)
    assert got == ms[:check], (
        f"encrypt bench output FAILED decrypt roundtrip "
        f"({sum(g != w for g, w in zip(got, ms[:check]))}/{check} wrong)")
    print(f"# correctness gate: {check}/{check} decrypt-roundtrip ok",
          file=sys.stderr)
    return batch / t


def bench_encrypt_alt(bits=2048, batch=4096, window=4):
    """Damgard-Jurik alternative encryption (h_s^r, short randomness;
    reference: paillier.go:221-238) via the fixed-base comb kernel."""
    from paillier_tpu.core.encrypt import Encryptor
    from paillier_tpu.core.keys import ALTERNATIVE, LEVEL_ONE, encode_batch
    import numpy as np
    from paillier_tpu.bigint import montgomery as mont
    sk, pk, rng = _key(bits)
    dk = pk.device()
    enc = Encryptor(pk, LEVEL_ONE, method=ALTERNATIVE, window=window,
                    rng=rng)
    print(f"# engine: {enc.engine}", file=sys.stderr)
    ms = [rng.randrange(pk.n) for _ in range(batch)]
    rs = [rng.randrange(pk.k) for _ in range(batch)]
    m = encode_batch(ms, dk.L)
    nd = mont.n_digits_for_bits(enc._r_bits, window)
    rd = jnp.asarray(np.stack([mont.exp_digits(r, window, nd) for r in rs]))
    t = _time(enc._fn, m, rd)
    # correctness gate: spot-check vs the host formula c = (1+mn)*h1^r
    from paillier_tpu.core.keys import decode_batch
    got = decode_batch(enc._fn(m, rd)[:8])
    h1 = dk.hs_int_for_level(1)
    want = [((1 + mi * pk.n) * pow(h1, ri % pk.k, pk.n2)) % pk.n2
            for mi, ri in zip(ms[:8], rs[:8])]
    assert got == want, "alt-encrypt bench output WRONG"
    print("# correctness gate: 8/8 alt ciphertexts ok", file=sys.stderr)
    return batch / t


def bench_decrypt_crt(bits=2048, batch=4096, window=4, check=64):
    from paillier_tpu.core.decrypt import Decryptor
    from paillier_tpu.core.encrypt import Encryptor
    from paillier_tpu.core.keys import LEVEL_ONE, decode_batch
    sk, pk, rng = _key(bits)
    enc = Encryptor(pk, LEVEL_ONE, window=window, rng=rng)
    ms = [rng.randrange(pk.n) for _ in range(batch)]
    ct = enc.encrypt(ms)
    dec = Decryptor(sk, LEVEL_ONE, crt=True, window=window)
    t = _time(dec._fn, ct.c)
    # correctness gate: the timed kernel's plaintexts must match
    got = decode_batch(dec._fn(ct.c)[:check])
    assert got == ms[:check], (
        f"decrypt bench output WRONG "
        f"({sum(g != w for g, w in zip(got, ms[:check]))}/{check})")
    print(f"# correctness gate: {check}/{check} plaintexts ok",
          file=sys.stderr)
    return batch / t


def bench_aggregate(bits=2048, batch=1 << 20, window=4, chunk=1 << 16):
    """1M-ciphertext homomorphic aggregation (config #3).  Synthesizes the
    big batch by tiling a smaller encrypted batch (aggregation cost does
    not depend on ciphertext values); processed in chunks so device
    memory stays bounded, with a final combine over the chunk partials."""
    from paillier_tpu.core import homomorphic as hom
    from paillier_tpu.core.encrypt import Encryptor
    from paillier_tpu.core.keys import LEVEL_ONE, Ciphertext
    sk, pk, rng = _key(bits)
    enc = Encryptor(pk, LEVEL_ONE, window=window, rng=rng)
    small = enc.encrypt([rng.randrange(pk.n) for _ in range(1024)])
    big = jnp.tile(small.c, (chunk // 1024, 1))

    def agg_all():
        partials = []
        for _ in range(batch // chunk):
            p = hom.aggregate(pk, Ciphertext(c=big, level=LEVEL_ONE),
                              axis=0)
            partials.append(p.c)
        stacked = jnp.stack(partials)
        return hom.aggregate(pk, Ciphertext(c=stacked, level=LEVEL_ONE),
                             axis=0).c

    _sync(agg_all())      # warmup / compile
    t0 = time.perf_counter()
    _sync(agg_all())
    t = time.perf_counter() - t0
    return batch / t


def bench_threshold(bits=2048, batch=4096, l=5, t_=3, window=5):
    """(3,5)-threshold: batched partial decryption + combination."""
    from paillier_tpu.core.encrypt import Encryptor
    from paillier_tpu.core.keys import LEVEL_ONE
    from paillier_tpu.threshold.decrypt import combine, partial_decrypt
    from paillier_tpu.threshold.keygen import generate_threshold_keys
    rng = random.Random(0x7357)
    t0 = time.perf_counter()
    keys = generate_threshold_keys(bits, l, t_, rng)
    print(f"# threshold keygen({bits}) took {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    tpk = keys[0].public()
    enc = Encryptor(tpk, LEVEL_ONE, window=window, rng=rng)
    ms = [rng.randrange(tpk.n) for _ in range(batch)]
    ct = enc.encrypt(ms)

    def flow():
        shares = [partial_decrypt(keys[i], ct, window) for i in range(t_)]
        return combine(tpk, shares, window)

    # combine includes host-side inverses; time the full flow
    flow()
    t0 = time.perf_counter()
    out = flow()
    dt = time.perf_counter() - t0
    assert out == ms
    return batch / dt


def bench_ddleq(bits=2048, proofs=256, secpar=40, window=5, chunk=128):
    """Batched DDLEQ prove+verify throughput (config #5; proofs/sec for
    prove+verify together, measured over ``proofs`` REAL proofs —
    nothing is extrapolated).  Processes the proof batch in chunks of
    ``chunk`` with device memory bounded per chunk; the 64k-proof
    configuration runs the same loop longer (``ddleq8k`` is the
    at-scale datapoint; 64k is chip-count-scaled from there because the
    chunks are embarrassingly parallel across the mesh batch axis —
    zk/ddleq.py shard path, MULTICHIP dryrun)."""
    from paillier_tpu.core import homomorphic as hom
    from paillier_tpu.core.encrypt import nested_encrypt
    from paillier_tpu.zk.ddleq import prove, verify
    sk, pk, rng = _key(bits)
    ms = [rng.randrange(pk.n) for _ in range(chunk)]
    ct1 = nested_encrypt(pk, ms, rng)
    ct2, a_l, b_l = hom.nested_randomize(pk, ct1, rng)
    # warmup chunk (compiles every ladder)
    proof = prove(sk, ct1, ct2, a_l, b_l, secpar, rng, window)
    assert all(verify(pk, ct1, ct2, proof, window))
    t0 = time.perf_counter()
    done = 0
    while done < proofs:
        proof = prove(sk, ct1, ct2, a_l, b_l, secpar, rng, window)
        ok = verify(pk, ct1, ct2, proof, window)
        assert all(ok)
        done += chunk
    dt = time.perf_counter() - t0
    return done / dt


def bench_weak_scaling(bits=2048, base=1024, factor=8, window=4):
    """Single-chip batch weak-scaling of encryption: elements/sec at
    factor*base vs base.  Ideal = 1.0 (throughput independent of batch);
    this is the on-chip half of the BASELINE scaling target — the
    sharded encryption path has no collectives, so per-chip throughput
    at large local batch is the whole multi-host story for config #2."""
    from paillier_tpu.core.encrypt import Encryptor
    from paillier_tpu.core.keys import LEVEL_ONE, encode_batch
    sk, pk, rng = _key(bits)
    dk = pk.device()
    enc = Encryptor(pk, LEVEL_ONE, window=window, rng=rng)
    thr = {}
    for B in (base, base * factor):
        ms = [rng.randrange(pk.n) for _ in range(B)]
        rs = [rng.randrange(2, pk.n) for _ in range(B)]
        m = encode_batch(ms, dk.L)
        r = encode_batch(rs, 2 * dk.L)
        thr[B] = B / _time(enc._fn, m, r)
        print(f"# weak-scaling B={B}: {thr[B]:,.0f} enc/s", file=sys.stderr)
    return thr[base * factor] / thr[base]


def bench_mesh_scaling():
    """Collective/partitioning overhead of the two sharded seams at mesh
    sizes 1/2/4/8 (virtual CPU devices; fixed total work, so ideal
    T(n) == T(1)).  Returns efficiency T(1)/T(8) for the aggregate seam;
    prints the full table to stderr."""
    import os
    import subprocess
    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    rows = []
    for n in (1, 2, 4, 8):
        out = subprocess.run(
            [sys.executable, os.path.join(here, "scripts",
                                          "scaling_probe.py"), str(n)],
            capture_output=True, text=True, env=env, timeout=1200)
        if out.returncode != 0 or not out.stdout.strip():
            raise RuntimeError(
                f"scaling_probe.py (mesh={n}) failed rc={out.returncode}:\n"
                f"{out.stderr[-2000:]}")
        line = out.stdout.strip().splitlines()[-1]
        rows.append(json.loads(line))
        print(f"# mesh={n}: {line}", file=sys.stderr)
    eff_agg = rows[0]["t_aggregate_s"] / rows[-1]["t_aggregate_s"]
    eff_comb = rows[0]["t_combine_s"] / rows[-1]["t_combine_s"]
    print(f"# efficiency 1->8 devices: aggregate {eff_agg:.2f}, "
          f"combine {eff_comb:.2f}", file=sys.stderr)
    return min(eff_agg, eff_comb)


def emit(metric, value, unit, baseline):
    print(json.dumps({
        "metric": metric,
        "value": round(value, 2),
        "unit": unit,
        "vs_baseline": round(value / baseline, 4),
    }))


def main():
    args = sys.argv[1:] or ["enc2048"]
    if "all" in args:
        i = args.index("all")
        args[i:i + 1] = ["enc2048", "enc2048alt", "enc1024", "dec2048",
                         "agg", "threshold", "ddleq"]
    for a in args:
        if a == "enc2048":
            v = bench_encrypt(2048)
            try:
                from paillier_tpu.ops.profiling import encryption_roofline
                print(encryption_roofline(2048).report(v), file=sys.stderr)
            except Exception as ex:     # roofline must never break the bench
                print(f"# roofline unavailable: {ex}", file=sys.stderr)
            emit("2048-bit Paillier encryptions/sec/chip", v, "enc/s", 100_000)
        elif a == "enc2048alt":
            v = bench_encrypt_alt(2048)
            emit("2048-bit DJ-alternative encryptions/sec/chip", v, "enc/s",
                 100_000)
        elif a == "enc1024":
            v = bench_encrypt(1024)
            emit("1024-bit Paillier encryptions/sec/chip", v, "enc/s", 100_000)
        elif a == "enc4096":
            # SURVEY §5 long-axis top width; wide-spec (k>=640) kernel path
            v = bench_encrypt(4096, batch=1024)
            emit("4096-bit Paillier encryptions/sec/chip", v, "enc/s", 100_000)
        elif a == "dec2048":
            v = bench_decrypt_crt(2048)
            emit("2048-bit CRT decryptions/sec/chip", v, "dec/s", 100_000)
        elif a == "agg":
            v = bench_aggregate(2048)
            emit("2048-bit homomorphic adds/sec (1M aggregate)", v,
                 "adds/s", 1_000_000)
        elif a == "threshold":
            v = bench_threshold(2048)
            emit("2048-bit (3,5)-threshold decryptions/sec", v, "dec/s",
                 100_000)
        elif a == "ddleq":
            v = bench_ddleq(2048)
            emit("2048-bit DDLEQ prove+verify/sec (secpar=40)", v,
                 "proofs/s", 1_000)
        elif a == "ddleq8k":
            # at-scale measured run (r2 VERDICT #3): 8192 real proofs
            v = bench_ddleq(2048, proofs=8192, chunk=256)
            emit("2048-bit DDLEQ prove+verify/sec (secpar=40, 8k proofs)",
                 v, "proofs/s", 1_000)
        elif a == "scaling":
            v = bench_weak_scaling(2048)
            emit("encryption batch weak-scaling efficiency (1 chip)", v,
                 "ratio", 0.8)
            v = bench_mesh_scaling()
            emit("mesh scaling efficiency 1->8 dev (collective overhead)",
                 v, "ratio", 0.8)
        else:
            print(f"unknown bench {a!r}", file=sys.stderr)


if __name__ == "__main__":
    main()
