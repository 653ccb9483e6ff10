"""Randomness and group sampling (host control plane).

Mirrors the reference's crypto substrate (reference: utils.go:26-59):
uniform sampling below n, rejection sampling of Z_n^*, and random
quadratic-residue generators.  Entropy is drawn host-side (``secrets``)
and shipped to device as limb tensors; a seeded deterministic mode is
provided for reproducible tests and multi-host determinism.
"""

from __future__ import annotations

import math
import random as _random
import secrets
from typing import Optional

SystemRandom = secrets.SystemRandom


def make_rng(seed: Optional[int] = None):
    """CSPRNG by default; deterministic ``random.Random`` when seeded."""
    return _random.Random(seed) if seed is not None else secrets.SystemRandom()


def random_below(n: int, rng=None) -> int:
    """Uniform in [0, n) (reference: utils.go:26-33)."""
    rng = rng or secrets.SystemRandom()
    return rng.randrange(n)


def random_unit(n: int, rng=None) -> int:
    """Uniform in Z_n^* by rejection (reference: utils.go:36-49)."""
    rng = rng or secrets.SystemRandom()
    while True:
        r = rng.randrange(n)
        if r != 0 and math.gcd(r, n) == 1:
            return r


def random_units(n: int, count: int, rng=None) -> list[int]:
    rng = rng or secrets.SystemRandom()
    return [random_unit(n, rng) for _ in range(count)]


def random_units_limbs(n: int, count: int, rng=None,
                       n_limbs: Optional[int] = None):
    """Uniform Z_n^* as uint32[count, n_limbs] little-endian 16-bit limbs.

    Vectorized (numpy) version of :func:`random_units` for proof-batch
    scale — entropy arrives as one ``randbytes`` call and rejection
    resampling runs on whole arrays, never per element.  For n of at
    least 192 bits the gcd(r, n) == 1 check is waived: for RSA-type
    moduli the failure probability is (p + q) / n < 2^-94, far below
    the 2^-80 soundness floor anywhere this sampler is used (the
    reference rejection-samples at utils.go:36-49; the distributions
    are indistinguishable).
    """
    import numpy as np

    from ..bigint import host
    rng = rng or secrets.SystemRandom()
    if n.bit_length() < 192:
        vals = random_units(n, count, rng)
        L = n_limbs or host.limbs_for_bits(n.bit_length())
        return host.ints_to_limbs(vals, L)

    nbits = n.bit_length()
    nbytes = (nbits + 7) // 8
    L = n_limbs or host.limbs_for_bits(nbits)
    topmask = (1 << (((nbits - 1) % 8) + 1)) - 1
    n_le = np.frombuffer(n.to_bytes(2 * ((nbytes + 1) // 2), "little"),
                         dtype=np.uint8).astype(np.uint16)
    n_limbs_arr = (n_le[0::2] | (n_le[1::2] << 8)).astype(np.int64)

    out = np.zeros((count, L), dtype=np.uint32)
    todo = np.arange(count)
    while todo.size:
        raw = np.frombuffer(rng.randbytes(todo.size * nbytes),
                            dtype=np.uint8).reshape(todo.size, nbytes).copy()
        raw[:, 0] &= topmask                       # big-endian draw < 2^nbits
        le = raw[:, ::-1]                          # little-endian bytes
        if nbytes % 2:
            le = np.concatenate(
                [le, np.zeros((todo.size, 1), np.uint8)], axis=1)
        limbs = (le[:, 0::2].astype(np.uint32)
                 | (le[:, 1::2].astype(np.uint32) << 8))
        # vectorized compare vs n (most-significant differing limb decides)
        diff = limbs.astype(np.int64) - n_limbs_arr[None, :]
        nzcols = diff != 0
        rev = nzcols[:, ::-1]
        msd = limbs.shape[1] - 1 - np.argmax(rev, axis=1)
        any_diff = nzcols.any(axis=1)
        top_sign = diff[np.arange(todo.size), msd]
        ok = any_diff & (top_sign < 0) & (limbs.any(axis=1))
        good = todo[ok]
        out[good, :limbs.shape[1]] = limbs[ok]
        todo = todo[~ok]
    return out


def random_qr_generator(n: int, rng=None) -> int:
    """Random generator of the quadratic residues mod n, w.h.p. valid when n
    is a product of safe primes (reference: utils.go:53-59): r^2 mod n."""
    r = random_unit(n, rng)
    return (r * r) % n
