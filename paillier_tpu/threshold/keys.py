"""Threshold key material (reference: thresholdkey.go:26-58).

ThresholdPublicKey carries the verification base V (a QR generator of
Z_{n^2}) and per-server verification keys V_i for the share-decryption
ZKPs; ThresholdSecretKey adds the server ID and Shamir share.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

from ..bigint import host
from ..core.keys import PublicKey


@dataclass
class ThresholdPublicKey(PublicKey):
    """(reference: thresholdkey.go:26-32).  Inherits the plain PublicKey
    surface so threshold keys encrypt with the same Encryptor (regular
    method; the reference's threshold keys likewise have no H for
    alternative encryption)."""

    l: int = 0            # TotalNumberOfDecryptionServers
    t: int = 0            # Threshold
    v: int = 0            # VerificationKey
    vi: Tuple[int, ...] = ()   # VerificationKeys (server i at vi[i-1])

    @property
    def delta(self) -> int:
        """l! (thresholdkey.go:70-72)."""
        return host.factorial(self.l)

    @property
    def combine_shares_constant(self) -> int:
        """(4*delta^2)^{-1} mod n (thresholdkey.go:63-66)."""
        return pow(4 * self.delta * self.delta, -1, self.n)

    def public(self) -> "ThresholdPublicKey":
        return ThresholdPublicKey(n=self.n, g=self.g, h=self.h, k=self.k,
                                  bits=self.bits, l=self.l, t=self.t,
                                  v=self.v, vi=tuple(self.vi))


@dataclass
class ThresholdSecretKey(ThresholdPublicKey):
    """Per-server secret share (reference: thresholdkey.go:38-42)."""

    id: int = 0           # servers are indexed from 1
    share: int = 0


@dataclass
class PartialDecryption:
    """(reference: thresholdkey.go:44-48)."""

    id: int
    decryption: int


@dataclass
class PartialDecryptionZKP(PartialDecryption):
    """Non-interactive Fiat-Shamir proof of correct share decryption
    (reference: thresholdkey.go:50-58)."""

    key: ThresholdPublicKey = None
    e: int = 0            # challenge
    z: int = 0            # response
    c: int = 0            # the ciphertext value proven about
