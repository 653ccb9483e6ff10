"""Fiat-Shamir random oracle (reference: random_oracle.go:10-32) and the
share-ZKP hash (reference: thresholdkey.go:319-326).

Byte semantics replicate Go's ``gmp.Int.Bytes()``: minimal big-endian
encoding, *empty* for zero — lengths vary per value, which matters for
hash parity.  Two quirks are preserved deliberately:

* ``oracle_digest`` SKIPS ITS FIRST ARGUMENT (the ``if i == 0: continue``
  at random_oracle.go:24-26) — DDLEQ challenges therefore do not bind
  ct1.C.  We reproduce it bit-exactly for cross-implementation parity.
* The threshold ZKP hash uses the UNREDUCED integers c^4 and c_i^2
  (thresholdkey.go:241,248 call Exp with a nil modulus).

The host path (hashlib) is the control-plane implementation; a batched
device SHA-256 lives in paillier_tpu.ops.sha256 for the proof-batch hot
path.
"""

from __future__ import annotations

import hashlib
from typing import Iterable


def go_bytes(v: int) -> bytes:
    """Go gmp.Int.Bytes(): minimal big-endian, empty for 0."""
    if v == 0:
        return b""
    return v.to_bytes((v.bit_length() + 7) // 8, "big")


def oracle_digest(*values: int) -> bytes:
    """SHA-256 over concatenated go_bytes of values[1:] — the first input
    is skipped (random_oracle.go:24-26)."""
    h = hashlib.sha256()
    for i, v in enumerate(values):
        if i == 0:
            continue
        h.update(go_bytes(v))
    return h.digest()


def oracle_bit(*values: int) -> bool:
    """Digest mod 2 == 1 (random_oracle.go:10-16)."""
    d = int.from_bytes(oracle_digest(*values), "big")
    return (d % 2) == 1


def zkp_hash(a: int, b: int, c4: int, ci2: int) -> int:
    """SHA-256(a || b || c^4 || c_i^2) as an integer
    (thresholdkey.go:319-326).  c4 and ci2 must be the unreduced powers."""
    h = hashlib.sha256()
    h.update(go_bytes(a))
    h.update(go_bytes(b))
    h.update(go_bytes(c4))
    h.update(go_bytes(ci2))
    return int.from_bytes(h.digest(), "big")
