"""Device SHA-256 vs hashlib, including the reference's variable-length
big-endian byte semantics (leading zeros stripped)."""

import hashlib
import random

import jax.numpy as jnp
import numpy as np

from paillier_tpu.bigint import host
from paillier_tpu.ops.oracle import go_bytes, zkp_hash
from paillier_tpu.ops.sha256 import (concat_be, digest_to_ints,
                                     limbs_to_be_bytes, sha256_bytes)

R = random.Random(777)


def _ref_digest(data: bytes) -> int:
    return int.from_bytes(hashlib.sha256(data).digest(), "big")


class TestSha256:
    def test_fixed_vectors(self):
        msgs = [b"", b"abc", b"a" * 55, b"a" * 56, b"a" * 64, b"a" * 119,
                bytes(range(100))]
        W = 128
        data = np.zeros((len(msgs), W), np.uint32)
        lens = np.zeros(len(msgs), np.int32)
        for i, m in enumerate(msgs):
            data[i, :len(m)] = np.frombuffer(m, np.uint8)
            lens[i] = len(m)
        got = digest_to_ints(sha256_bytes(jnp.asarray(data),
                                          jnp.asarray(lens)))
        assert got == [_ref_digest(m) for m in msgs]

    def test_random_lengths(self):
        W = 300
        B = 16
        msgs = [bytes(R.getrandbits(8) for _ in range(R.randrange(0, W)))
                for _ in range(B)]
        data = np.zeros((B, W), np.uint32)
        lens = np.zeros(B, np.int32)
        for i, m in enumerate(msgs):
            data[i, :len(m)] = np.frombuffer(m, np.uint8)
            lens[i] = len(m)
        got = digest_to_ints(sha256_bytes(jnp.asarray(data),
                                          jnp.asarray(lens)))
        assert got == [_ref_digest(m) for m in msgs]

    def test_limbs_to_be_bytes(self):
        L = 8
        xs = [R.getrandbits(100) for _ in range(6)] + [0, 1, 255, 256]
        X = jnp.asarray(host.ints_to_limbs(xs, L))
        be, ln = limbs_to_be_bytes(X)
        for i, x in enumerate(xs):
            gb = go_bytes(x)
            assert int(ln[i]) == len(gb)
            got = bytes(np.asarray(be[i], np.uint8)[2 * L - len(gb):])
            assert got == gb

    def test_concat_and_zkp_hash_parity(self):
        """Device digest of a||b||c4||ci2 must equal the host zkp_hash
        (thresholdkey.go:319-326 semantics)."""
        L = 8
        B = 6
        quads = [[R.getrandbits(120) for _ in range(4)] for _ in range(B)]
        quads.append([0, 1, R.getrandbits(50), 0])
        parts_arrays = []
        for j in range(4):
            X = jnp.asarray(host.ints_to_limbs([q[j] for q in quads], L))
            parts_arrays.append(limbs_to_be_bytes(X))
        buf, total = concat_be(parts_arrays, 4 * 2 * L)
        got = digest_to_ints(sha256_bytes(buf, total))
        exp = [zkp_hash(*q) for q in quads]
        assert got == exp
