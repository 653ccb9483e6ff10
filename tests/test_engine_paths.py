"""Coverage for the accelerator code paths on CPU: PAILLIER_TPU_FORCE_RNS
routes encryption, CRT decryption (limbmm Toeplitz matmul kernel),
aggregation and const-mult through the RNS engine + limbmm plans that
normally only run on TPU (the jnp fallback executes identical math)."""

import random

import pytest


@pytest.fixture()
def force_rns(monkeypatch):
    monkeypatch.setenv("PAILLIER_TPU_FORCE_RNS", "1")


def test_rns_enc_dec_roundtrip_with_limbmm_crt(force_rns, keypair_256, rng):
    from paillier_tpu.core import homomorphic as hom
    from paillier_tpu.core.decrypt import Decryptor
    from paillier_tpu.core.encrypt import Encryptor
    from paillier_tpu.core.keys import LEVEL_ONE, Ciphertext
    sk, pk = keypair_256
    # fresh device key so the cached jit entries don't leak across the
    # forced-RNS boundary
    sk = type(sk)(**{f.name: getattr(sk, f.name)
                     for f in __import__("dataclasses").fields(sk)})
    pk = sk.public()
    enc = Encryptor(pk, LEVEL_ONE, rng=rng, engine="rns")
    dec = Decryptor(sk, LEVEL_ONE, crt=True, engine="rns")
    vals = [rng.randrange(pk.n) for _ in range(6)] + [0, 1, pk.n - 1]
    ct = enc.encrypt(vals)
    assert dec.decrypt(ct) == vals

    agg = hom.aggregate(pk, Ciphertext(c=ct.c[:4], level=LEVEL_ONE), axis=0)
    total = dec.decrypt(Ciphertext(c=agg.c[None], level=LEVEL_ONE))[0]
    assert total == sum(vals[:4]) % pk.n

    cm = hom.const_mult(pk, Ciphertext(c=ct.c[:4], level=LEVEL_ONE), 12345)
    assert dec.decrypt(cm) == [(12345 * v) % pk.n for v in vals[:4]]
