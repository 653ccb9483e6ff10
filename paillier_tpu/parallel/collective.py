"""Distributed homomorphic reductions: collectives in the multiplicative
group Z*_{n^s+1}.

The two seams where the framework crosses devices:

* ``sharded_aggregate``: the 1M-ciphertext homomorphic sum (BASELINE
  config #3).  Each shard tree-reduces its local ciphertexts into one
  modular product; an ``all_gather`` over the batch axis moves one residue
  per device; a log-depth product of those finishes.  Communication is
  O(devices * limbs) — independent of the batch size.

* ``distributed_combine``: threshold share combining (the reference's
  CombinePartialDecryptions, thresholdkey.go:149-161) where each mesh row
  holds one decryption server's partial decryptions.  Each server raises
  its share to its Lagrange weight locally; the weighted contributions
  all-reduce (as separate positive/negative products so the single
  modular inverse stays on host).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..bigint import host, vpu
from ..bigint import montgomery as mont
from ..core.homomorphic import _tree_r_power, aggregate_kernel
from ..core.keys import Ciphertext, MIXED, PublicKey, decode_batch, encode_batch
from .mesh import BATCH_AXIS, SERVER_AXIS


def _mont_tree_product(ctx: mont.MontCtx, x: jnp.ndarray) -> jnp.ndarray:
    """Product over axis 0 via log-depth mont_muls; returns [*, L] and the
    R^-1 deficit is _tree_r_power(m)."""
    while x.shape[0] > 1:
        if x.shape[0] % 2:
            pad_one = jnp.zeros_like(x[:1]).at[..., 0].set(1)
            x = jnp.concatenate([x, pad_one], axis=0)
        x = mont.mont_mul(ctx, x[0::2], x[1::2])
    return x[0]


def _mesh_key(mesh: Mesh) -> tuple:
    return (tuple(mesh.shape.items()),
            tuple(d.id for d in mesh.devices.flat))


def sharded_aggregate(pk: PublicKey, ct: Ciphertext, mesh: Mesh
                      ) -> Ciphertext:
    """Homomorphic sum of a batch sharded over the mesh's batch axis."""
    dk = pk.device()
    ctx = dk.ctx_for_level(ct.level)
    Ltot = ct.c.shape[-1]
    B = ct.c.shape[0]
    n_shards = mesh.shape[BATCH_AXIS]
    if B % n_shards:
        raise ValueError("batch must divide evenly across the mesh")
    local = B // n_shards
    mod = pk.modulus_for_level(ct.level)
    R = 1 << (host.LIMB_BITS * Ltot)

    key = ("sharded_agg", ct.level, Ltot, B, _mesh_key(mesh))
    if key not in dk.jit_cache:
        # R^-1 deficits: each of the n_shards gathered values carries its
        # local tree's deficit; the cross-shard tree adds its own; +1 for
        # the fixup
        r_pow = n_shards * _tree_r_power(local) + _tree_r_power(n_shards)
        r_fix = jnp.asarray(host.int_to_limbs(pow(R, r_pow + 1, mod), Ltot))

        @jax.jit
        @partial(shard_map, mesh=mesh,
                 in_specs=(P(BATCH_AXIS, None),),
                 out_specs=P(), check_vma=False)
        def agg(c_local):
            loc = _mont_tree_product(ctx, c_local)        # [L]
            gathered = lax.all_gather(loc, BATCH_AXIS)    # [n_shards, L]
            total = _mont_tree_product(ctx, gathered)
            return mont.mont_mul(ctx, total, r_fix)[None]

        dk.jit_cache[key] = agg

    out = dk.jit_cache[key](ct.c)
    return Ciphertext(c=out[0], level=ct.level, method=MIXED)


def distributed_combine(tpk, server_powed: jnp.ndarray, signs: Sequence[int],
                        mesh: Mesh) -> List[int]:
    """Threshold combining across a server-sharded mesh axis.

    ``server_powed``: uint32[S, B, 2L] where row s is that server's
    c_s^(|2*lambda_s|) mod n^2 (computed locally by each server);
    ``signs``: +1/-1 per server for the Lagrange weight sign.  The
    positive and negative products all-reduce over the server axis; the
    final inverse + L-function finish on the combiner host.
    """
    dk = tpk.device()
    ctx = dk.ctx_n2
    L = dk.L
    S = server_powed.shape[0]
    n_rows = mesh.shape[SERVER_AXIS]
    s_local = S // n_rows

    key = ("dist_combine", S, server_powed.shape[1], tuple(signs),
           _mesh_key(mesh))
    if key not in dk.jit_cache:
        signs_arr = jnp.asarray(np.asarray(signs, dtype=np.int32))
        R = 1 << (host.LIMB_BITS * 2 * L)
        # R^-1 deficit: local tree per row, then each of n_rows inputs
        # carries that deficit into the cross-row tree; the +1 in the
        # exponent covers the fixup mont_mul itself
        r_pow = n_rows * _tree_r_power(s_local) + _tree_r_power(n_rows)
        r_fix = jnp.asarray(host.int_to_limbs(pow(R, r_pow + 1, tpk.n2),
                                              2 * L))

        @jax.jit
        @partial(shard_map, mesh=mesh,
                 in_specs=(P(SERVER_AXIS, BATCH_AXIS, None),),
                 out_specs=P(None, BATCH_AXIS, None), check_vma=False)
        def reduce_products(powed_local):
            # powed_local: [S/rows, B/cols, 2L]
            one = jnp.zeros_like(powed_local).at[..., 0].set(1)
            srow = lax.axis_index(SERVER_AXIS) * powed_local.shape[0]
            idx = srow + jnp.arange(powed_local.shape[0])
            sel = jnp.take(signs_arr, idx)[:, None, None]
            pos_l = jnp.where(sel > 0, powed_local, one)
            neg_l = jnp.where(sel < 0, powed_local, one)
            # local product over this shard's servers, then gather rows
            pos = _mont_tree_product(ctx, pos_l)          # [B_local, 2L]
            neg = _mont_tree_product(ctx, neg_l)
            pos_g = lax.all_gather(pos, SERVER_AXIS)      # [rows, B_l, 2L]
            neg_g = lax.all_gather(neg, SERVER_AXIS)
            pos_t = _mont_tree_product(ctx, pos_g)
            neg_t = _mont_tree_product(ctx, neg_g)
            pos_t = mont.mont_mul(ctx, pos_t,
                                  jnp.broadcast_to(r_fix, pos_t.shape))
            neg_t = mont.mont_mul(ctx, neg_t,
                                  jnp.broadcast_to(r_fix, neg_t.shape))
            return jnp.stack([pos_t, neg_t])              # [2, B_l, 2L]

        dk.jit_cache[key] = reduce_products

    out = dk.jit_cache[key](server_powed)                 # [2, B, 2L]
    pos_vals = decode_batch(out[0])
    neg_vals = decode_batch(out[1])
    n2 = tpk.n2
    neg_inv = host.modinv_batch(neg_vals, n2)
    cprimes = [(p * v) % n2 for p, v in zip(pos_vals, neg_inv)]
    const = tpk.combine_shares_constant
    return [(const * ((cp - 1) // tpk.n)) % tpk.n for cp in cprimes]
