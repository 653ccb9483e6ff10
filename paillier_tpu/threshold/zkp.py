"""Share-decryption zero-knowledge proofs (reference:
thresholdkey.go:225-326).

Fiat-Shamir: a = (c^4)^r, b = V^r mod n^2, e = SHA256(a||b||c^4||c_i^2),
z = r + e*delta*s_i.  Note the hash covers the UNREDUCED integers c^4 and
c_i^2 (the reference exponentiates with a nil modulus at
thresholdkey.go:241,248) — we compute those full-width products on device
and hash their minimal big-endian bytes for bit parity.

Proving runs the two modexps batched on device with per-element exponent
digits; hashes and the z response are control-plane (host).
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from ..bigint import host, vpu
from ..bigint import montgomery as mont
from ..core.keys import Ciphertext, decode_batch, encode_batch
from ..ops import random as prand
from ..ops.oracle import zkp_hash
from .decrypt import PartialDecryptionBatch, partial_decrypt
from .keys import (PartialDecryption, PartialDecryptionZKP,
                   ThresholdPublicKey, ThresholdSecretKey)


def partial_decrypt_with_zkp(tsk: ThresholdSecretKey, ct: Ciphertext,
                             rng=None, window: int = 4
                             ) -> List[PartialDecryptionZKP]:
    """Batched PartialDecryptionWithZKP (thresholdkey.go:225-255)."""
    rng = rng or prand.make_rng()
    dk = tsk.device()
    ctx2 = dk.ctx_n2
    L = dk.L

    pd = partial_decrypt(tsk, ct, window)
    c_vals = decode_batch(ct.c.reshape((-1, 2 * L)))
    ci_vals = decode_batch(pd.c.reshape((-1, 2 * L)))
    B = len(c_vals)

    rs = [rng.randrange(tsk.n2) for _ in range(B)]

    # c^4 mod n^2 on device; the unreduced c^4 and c_i^2 for hashing (host,
    # cheap: two squarings per value)
    c4m = mont.modmul(ctx2, mont.modmul(ctx2, ct.c, ct.c),
                      mont.modmul(ctx2, ct.c, ct.c))
    nd = mont.n_digits_for_bits(tsk.n2.bit_length(), window)
    r_digits = jnp.asarray(np.stack(
        [mont.exp_digits(r, window, nd) for r in rs]))
    r_digits = r_digits.reshape(ct.c.shape[:-1] + (nd,))
    a = dk.pow(1, c4m, r_digits, window)
    vbase = jnp.broadcast_to(jnp.asarray(host.int_to_limbs(tsk.v, 2 * L)),
                             c4m.shape)
    b = dk.pow(1, vbase, r_digits, window)

    a_vals = decode_batch(a.reshape((-1, 2 * L)))
    b_vals = decode_batch(b.reshape((-1, 2 * L)))

    proofs = []
    ds = tsk.delta * tsk.share
    key_pub = tsk.public()
    for j in range(B):
        c4_full = c_vals[j] ** 4          # unreduced (thresholdkey.go:241)
        ci2_full = ci_vals[j] ** 2        # unreduced (thresholdkey.go:248)
        e = zkp_hash(a_vals[j], b_vals[j], c4_full, ci2_full)
        z = rs[j] + e * ds                # thresholdkey.go:313-317
        proofs.append(PartialDecryptionZKP(
            id=tsk.id, decryption=ci_vals[j], key=key_pub, e=e, z=z,
            c=c_vals[j]))
    return proofs


def verify_proof(pd: PartialDecryptionZKP) -> bool:
    """VerifyProof (thresholdkey.go:278-311), host control-plane."""
    tpk = pd.key
    n2 = tpk.n2
    c4 = pd.c ** 4
    ci2 = pd.decryption ** 2
    # a = (c^4)^Z * (c_i^2)^{-E} mod n^2
    a = (pow(c4 % n2, pd.z, n2)
         * host.modinv(pow(ci2 % n2, pd.e, n2), n2)) % n2
    # b = V^Z * (v_i)^{-E} mod n^2
    vi = tpk.vi[pd.id - 1]
    b = (pow(tpk.v, pd.z, n2)
         * host.modinv(pow(vi, pd.e, n2), n2)) % n2
    return zkp_hash(a, b, c4, ci2) == pd.e


def verify_partial_decryption(tsk: ThresholdSecretKey, rng=None) -> None:
    """Self-test of one share (reference VerifyPartialDecryption,
    thresholdkey.go:258-275): encrypt a random message under the public
    key, produce this share's ZKP partial decryption, and verify the
    proof.  Raises ValueError("Invalid share") on failure."""
    from ..core.encrypt import Encryptor
    rng = rng or prand.make_rng()
    m = rng.randrange(tsk.n)
    ct = Encryptor(tsk.public(), rng=rng).encrypt([m])
    proofs = partial_decrypt_with_zkp(tsk, ct, rng)
    if not all(verify_proof(p) for p in proofs):
        raise ValueError("Invalid share")


def combine_with_zkp(tpk: ThresholdPublicKey,
                     proofs_per_server: Sequence[Sequence[PartialDecryptionZKP]],
                     window: int = 4) -> List[int]:
    """CombinePartialDecryptionsZKP (thresholdkey.go:164-172): filter
    shares whose proofs fail, then combine the survivors, batched."""
    from .decrypt import combine
    dk = tpk.device()
    L = dk.L
    valid_batches = []
    for proofs in proofs_per_server:
        if all(verify_proof(p) for p in proofs):
            vals = [p.decryption for p in proofs]
            valid_batches.append(PartialDecryptionBatch(
                id=proofs[0].id, c=encode_batch(vals, 2 * L)))
    return combine(tpk, valid_batches, window)


def verify_decryption(tpk: ThresholdPublicKey, encrypted: int, decrypted: int,
                      proofs: Sequence[PartialDecryptionZKP]) -> None:
    """VerifyDecryption (thresholdkey.go:175-189): end-to-end check that
    ``proofs`` decrypt ``encrypted`` to ``decrypted``."""
    from .decrypt import combine_ints, verify_partial_decryptions
    for p in proofs:
        if p.c != encrypted:
            raise ValueError("The encrypted message is not the same than "
                             "the one in the shares")
    survivors = [PartialDecryption(id=p.id, decryption=p.decryption)
                 for p in proofs if verify_proof(p)]
    res = combine_ints(tpk, survivors)
    if res != decrypted:
        raise ValueError("The decrypted message is not the same than the "
                         "one in the shares")
