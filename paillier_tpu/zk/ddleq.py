"""DDLEQ zero-knowledge proofs of nested re-encryption (reference:
ddleq.go:9-153).

Proves ct2 = ct1^(a^n mod n^2) * b^(n^2) mod n^3 (the NestedRandomize
relation) without revealing (a, b).  A proof is ``secpar`` independent
Fiat-Shamir instances, each with soundness 1/2.

TPU-first batching: the reference loops instances sequentially
(ddleq.go:32-37); here all (proof, instance) pairs form one flat batch
axis and every modexp runs as a single batched device ladder.  The
Fiat-Shamir challenge bit preserves the reference's random-oracle quirk
of skipping the first hash input (random_oracle.go:24-26) — ct1.C is not
bound by the digest.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from ..bigint import host, vpu
from ..bigint import montgomery as mont
from ..core import homomorphic as hom
from ..core.keys import (LEVEL_TWO, Ciphertext, PublicKey, SecretKey,
                         decode_batch, encode_batch)
from ..ops import random as prand
from ..ops.oracle import oracle_bit


@dataclass
class DDLEQProof:
    """Batched proof: B proofs x S instances (reference DDLEQProof holds
    S instances for one ciphertext pair; ddleq.go:15-19)."""

    x: List[List[int]]       # [B][S]
    y: List[List[int]]
    alpha: List[List[int]]
    e: List[List[int]]
    f: List[List[int]]

    @property
    def secpar(self) -> int:
        return len(self.x[0])


def _flat_digits(vals: Sequence[int], bits: int, window: int) -> jnp.ndarray:
    nd = mont.n_digits_for_bits(bits, window)
    return jnp.asarray(np.stack(
        [mont.exp_digits(v, window, nd) for v in vals]))


def prove(sk: SecretKey, ct1: Ciphertext, ct2: Ciphertext,
          a_list: Sequence[int], b_list: Sequence[int], secpar: int,
          rng=None, window: int = 4) -> DDLEQProof:
    """ProveDDLEQ (ddleq.go:27-40, 55-127), batched over proofs and
    instances.  Requires the secret key (randomness extraction)."""
    rng = rng or prand.make_rng()
    if ct1.level != LEVEL_TWO or ct2.level != LEVEL_TWO:
        raise ValueError("DDLEQ operates on level-2 (nested) ciphertexts")
    dk = sk.device()
    L = dk.L
    n, n2, n3 = sk.n, sk.n2, sk.n3
    c1_vals = decode_batch(ct1.c.reshape((-1, 3 * L)))
    c2_vals = decode_batch(ct2.c.reshape((-1, 3 * L)))
    B = len(c1_vals)
    S = secpar

    # sanity check the relation (ddleq.go:62-69)
    an_list = [pow(a, n, n2) for a in a_list]
    for c1, c2, an, b in zip(c1_vals, c2_vals, an_list, b_list):
        if (pow(c1, an, n3) * pow(b, n2, n3)) % n3 != c2:
            raise ValueError(
                "cannot prove re-encryption because inputs are wrong")

    # s = extracted randomness of ct1, one per proof (ddleq.go:103)
    s_vals = hom.extract_randomness(sk, ct1, window)

    # per-(proof, instance) randomness
    xs = [[prand.random_unit(n, rng) for _ in range(S)] for _ in range(B)]
    ys = [[prand.random_unit(n, rng) for _ in range(S)] for _ in range(B)]
    flat_x = [x for row in xs for x in row]
    flat_y = [y for row in ys for y in row]

    ctx2, ctx3 = dk.ctx_n2, dk.ctx_n3

    # x^n mod n^2 and y^(n^2) mod n^3, shared exponents (ddleq.go:81-82)
    X = encode_batch(flat_x, 2 * L)
    Y = encode_batch(flat_y, 3 * L)
    xn = dk.pow_int(1, X, n, window)
    yn2 = dk.pow_int(2, Y, n2, window)

    # alpha = ct1^(x^n) * y^(n^2) mod n^3 (ddleq.go:85-87)
    # device-extracted exponent digits use window 4 (must divide 16)
    c1_rep = jnp.repeat(ct1.c.reshape((-1, 3 * L)), S, axis=0)
    xn_digits = mont.limbs_to_digits(xn, 4)
    c1x = dk.pow(2, c1_rep, xn_digits, 4)
    alpha = mont.modmul(ctx3, c1x, yn2)

    alpha_vals = decode_batch(alpha)
    xn_vals = decode_batch(xn)

    # challenge bits (ddleq.go:91); first argument skipped by the oracle
    chal = [[oracle_bit(c1_vals[i], c2_vals[i], xs[i][j], ys[i][j],
                        alpha_vals[i * S + j])
             for j in range(S)] for i in range(B)]

    # e = chal ? x * a^{-1} mod n^2 : x (ddleq.go:94-99)
    ainv = [pow(a, -1, n2) for a in a_list]
    es = [[(xs[i][j] * ainv[i]) % n2 if chal[i][j] else xs[i][j]
           for j in range(S)] for i in range(B)]

    # f = chal ? y * s^(x^n) * (s^(a^n) * b)^{-(e^n mod n2)} mod n^3 : y
    # (ddleq.go:101-115).  t_i = s^(a^n) * b mod n^3 is shared per proof.
    t_vals = [(pow(s_vals[i], an_list[i], n3) * b_list[i]) % n3
              for i in range(B)]
    flat_e = [e for row in es for e in row]
    E = encode_batch(flat_e, 2 * L)
    en = dk.pow_int(1, E, n, window)                # e^n mod n^2
    en_digits = mont.limbs_to_digits(en, 4)
    T = encode_batch([t_vals[i] for i in range(B) for _ in range(S)], 3 * L)
    t_pow = dk.pow(2, T, en_digits, 4)
    Srep = encode_batch([s_vals[i] for i in range(B) for _ in range(S)],
                        3 * L)
    s_xn = dk.pow(2, Srep, xn_digits, 4)
    t_pow_vals = decode_batch(t_pow)
    s_xn_vals = decode_batch(s_xn)

    fs = []
    for i in range(B):
        row = []
        for j in range(S):
            if chal[i][j]:
                inv = pow(t_pow_vals[i * S + j], -1, n3)
                row.append((ys[i][j] * s_xn_vals[i * S + j] * inv) % n3)
            else:
                row.append(ys[i][j])
        fs.append(row)

    return DDLEQProof(x=xs, y=ys,
                      alpha=[[alpha_vals[i * S + j] for j in range(S)]
                             for i in range(B)],
                      e=es, f=fs)


def verify(pk: PublicKey, ct1: Ciphertext, ct2: Ciphertext,
           proof: DDLEQProof, window: int = 4) -> List[bool]:
    """VerifyDDLEQProof (ddleq.go:44-53, 129-153), batched.  Returns one
    bool per proof (all S instances must check)."""
    dk = pk.device()
    L = dk.L
    n, n2, n3 = pk.n, pk.n2, pk.n3
    ctx2, ctx3 = dk.ctx_n2, dk.ctx_n3
    c1_vals = decode_batch(ct1.c.reshape((-1, 3 * L)))
    c2_vals = decode_batch(ct2.c.reshape((-1, 3 * L)))
    B = len(proof.x)
    S = proof.secpar

    chal = [[oracle_bit(c1_vals[i], c2_vals[i], proof.x[i][j],
                        proof.y[i][j], proof.alpha[i][j])
             for j in range(S)] for i in range(B)]

    flat_e = [e for row in proof.e for e in row]
    flat_f = [f for row in proof.f for f in row]
    E = encode_batch(flat_e, 2 * L)
    F = encode_batch(flat_f, 3 * L)
    en = dk.pow_int(1, E, n, window)                 # e^n mod n^2
    fn2 = dk.pow_int(2, F, n2, window)               # f^(n^2) mod n^3

    # base = chal ? ct2 : ct1, per instance
    bases = encode_batch(
        [c2_vals[i] if chal[i][j] else c1_vals[i]
         for i in range(B) for j in range(S)], 3 * L)
    en_digits = mont.limbs_to_digits(en, 4)
    powed = dk.pow(2, bases, en_digits, 4)
    check = mont.modmul(ctx3, powed, fn2)
    check_vals = decode_batch(check)

    out = []
    for i in range(B):
        ok = all(check_vals[i * S + j] == proof.alpha[i][j]
                 for j in range(S))
        out.append(ok)
    return out
