"""Vectorized SHA-256 on device (uint32 lanes, batch axis SIMD).

Replaces the host hashlib path for Fiat-Shamir challenges at batch scale
(reference: crypto/sha256 via random_oracle.go:4, thresholdkey.go:5).
Reproduces the reference's byte semantics exactly: each big integer is
hashed as its minimal big-endian encoding (empty for zero), so message
lengths vary per batch element; assembly, padding and block counts are
all handled element-wise with masks and gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..bigint.host import LIMB_BITS

_K = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5,
    0x3956c25b, 0x59f111f1, 0x923f82a4, 0xab1c5ed5,
    0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174,
    0xe49b69c1, 0xefbe4786, 0x0fc19dc6, 0x240ca1cc,
    0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7,
    0xc6e00bf3, 0xd5a79147, 0x06ca6351, 0x14292967,
    0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85,
    0xa2bfe8a1, 0xa81a664b, 0xc24b8b70, 0xc76c51a3,
    0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5,
    0x391c0cb3, 0x4ed8aa4a, 0x5b9cca4f, 0x682e6ff3,
    0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2], dtype=np.uint32)

_H0 = np.array([
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19], dtype=np.uint32)


def _rotr(x, n):
    return (x >> n) | (x << (32 - n))


def limbs_to_be_bytes(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """uint32[B, L] little-endian 16-bit limbs -> (bytes[B, 2L], len[B]).

    Bytes are the big-endian encoding padded with leading zeros to the
    full width; ``len`` is the minimal encoding length (0 for zero),
    matching Go's Bytes() (utils.go: gmp Int.Bytes semantics).
    """
    B_, L = x.shape
    hi = (x >> 8) & 0xFF
    lo = x & 0xFF
    le = jnp.stack([lo, hi], axis=-1).reshape(B_, 2 * L)  # little-endian
    be = jnp.flip(le, axis=-1)
    nz = be != 0
    idx = jnp.argmax(nz, axis=-1)                          # first nonzero
    any_nz = jnp.any(nz, axis=-1)
    length = jnp.where(any_nz, 2 * L - idx, 0).astype(jnp.int32)
    return be, length


def concat_be(parts: list[tuple[jnp.ndarray, jnp.ndarray]],
              out_len: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Concatenate minimal encodings of full-width byte arrays.

    Each part is (bytes[B, W_i] big-endian with leading zeros, len[B]).
    Returns (buffer[B, out_len], total_len[B]) with each part's minimal
    suffix packed contiguously from offset 0 — one gather per part.
    """
    B_ = parts[0][0].shape[0]
    buf = jnp.zeros((B_, out_len), jnp.uint32)
    pos = jnp.arange(out_len, dtype=jnp.int32)[None, :]
    offset = jnp.zeros((B_, 1), jnp.int32)
    for be, ln in parts:
        W = be.shape[-1]
        ln_c = ln[:, None]
        # source index within this part for output position j:
        # j in [offset, offset+len) maps to be[W - len + (j - offset)]
        src = W - ln_c + (pos - offset)
        valid = (pos >= offset) & (pos < offset + ln_c)
        src_cl = jnp.clip(src, 0, W - 1)
        gathered = jnp.take_along_axis(be, src_cl, axis=-1)
        buf = jnp.where(valid, gathered, buf)
        offset = offset + ln_c
    return buf, offset[:, 0]


@functools.partial(jax.jit, static_argnames=("max_len",))
def sha256_bytes(data: jnp.ndarray, lengths: jnp.ndarray,
                 max_len: int | None = None) -> jnp.ndarray:
    """SHA-256 over per-element byte strings.

    data: uint32[B, W] with byte values; lengths: int32[B] actual sizes.
    Returns digests as uint32[B, 8] (big-endian words).
    """
    B_, W = data.shape
    max_len = max_len or W
    # padded length per element: ceil((len + 9) / 64) * 64; buffer covers
    # the worst case
    PAD = ((max_len + 9 + 63) // 64) * 64
    pos = jnp.arange(PAD, dtype=jnp.int32)[None, :]
    ln = lengths[:, None]
    padded = jnp.zeros((B_, PAD), jnp.uint32)
    padded = padded.at[:, :W].set(data)
    padded = jnp.where(pos == ln, jnp.uint32(0x80), padded)
    padded = jnp.where(pos > ln, jnp.uint32(0), padded)
    # bit-length field in the last 8 bytes of each element's final block
    nblocks = (lengths + 9 + 63) // 64
    total = nblocks * 64
    bitlen = (lengths.astype(jnp.uint32) * 8)
    for i in range(8):
        bpos = total - 1 - i
        val = (bitlen >> (8 * i)) & 0xFF
        padded = jnp.where(pos == bpos[:, None], val[:, None], padded)

    # pack bytes into big-endian 32-bit words [B, PAD//4]
    w32 = (padded[:, 0::4] << 24) | (padded[:, 1::4] << 16) | \
          (padded[:, 2::4] << 8) | padded[:, 3::4]

    state = jnp.broadcast_to(jnp.asarray(_H0), (B_, 8)).astype(jnp.uint32)
    K = jnp.asarray(_K)

    # Everything below is fori_loops so the round body compiles exactly
    # once (a fully unrolled 64-round body makes XLA's scheduler blow up).
    def block_body(blk, state):
        block = lax.dynamic_slice(w32, (0, blk * 16), (B_, 16))
        ws0 = jnp.concatenate(
            [jnp.swapaxes(block, 0, 1),
             jnp.zeros((48, B_), jnp.uint32)], axis=0)        # [64, B]

        def sched(t, ws):
            w15 = ws[t - 15]
            w2 = ws[t - 2]
            s0 = _rotr(w15, 7) ^ _rotr(w15, 18) ^ (w15 >> 3)
            s1 = _rotr(w2, 17) ^ _rotr(w2, 19) ^ (w2 >> 10)
            return ws.at[t].set(ws[t - 16] + s0 + ws[t - 7] + s1)

        ws = lax.fori_loop(16, 64, sched, ws0)

        def round_body(t, carry):
            a, b, c, d, e, f, g, h = carry
            S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = h + S1 + ch + K[t] + ws[t]
            S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
            mj = (a & b) ^ (a & c) ^ (b & c)
            t2 = S0 + mj
            return (t1 + t2, a, b, c, d + t1, e, f, g)

        init = tuple(state[:, i] for i in range(8))
        out = lax.fori_loop(0, 64, round_body, init)
        new = state + jnp.stack(out, axis=-1)
        # only elements whose message includes this block advance
        active = (blk < nblocks)[:, None]
        return jnp.where(active, new, state)

    return lax.fori_loop(0, PAD // 64, block_body, state)


def digest_to_ints(digest: jnp.ndarray) -> list[int]:
    """uint32[B, 8] -> list of 256-bit ints (big-endian word order)."""
    d = np.asarray(jax.device_get(digest), dtype=np.uint64)
    out = []
    for row in d:
        v = 0
        for word in row:
            v = (v << 32) | int(word)
        out.append(v)
    return out
