"""Ring all-pairs descriptor matching over a device mesh.

The TPU-native replacement for the reference's all-pairs cross-matching loop
(nRobustViewMatching::computeCrossMatch, libmv/correspondence/
nRobustViewMatching.cc:154 — sequential O(N^2) knnMatch): each device owns a
block of images' descriptors; blocks travel around the ring with
jax.lax.ppermute while every device matches its resident block against the
visitor — after n_shards steps every (i, j) pair has been matched, with
bisection-bandwidth traffic instead of an all-gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def _pair_match_block(q_desc, q_valid, t_desc, t_valid, ratio: float):
    """2-NN ratio-test matching of every query image in the block against
    every train image: q_desc (Bq, K, D), t_desc (Bt, K, D) ->
    best train idx (Bq, Bt, K), valid (Bq, Bt, K)."""
    d = (
        jnp.sum(q_desc * q_desc, axis=-1)[:, None, :, None]
        + jnp.sum(t_desc * t_desc, axis=-1)[None, :, None, :]
        - 2.0 * jnp.einsum("qkd,tld->qtkl", q_desc, t_desc)
    )
    d = jnp.where(t_valid[None, :, None, :], d, jnp.inf)
    neg, idx = jax.lax.top_k(-d, 2)  # (Bq, Bt, K, 2)
    best, second = -neg[..., 0], -neg[..., 1]
    ok = q_valid[:, None, :] & (best < ratio * ratio * second) & jnp.isfinite(best)
    return idx[..., 0].astype(jnp.int32), best, ok


def ring_all_pairs_match(descs, valids, mesh: Mesh, ratio: float = 0.8):
    """All-pairs matching of N images sharded over the mesh's sp axis.

    descs (N, K, D) float32, valids (N, K) bool — N divisible by mesh sp size.
    Returns (train_idx (N, N, K), dist (N, N, K), valid (N, N, K)) where
    entry [i, j] holds matches of image i's descriptors into image j.
    """
    n_sp = mesh.shape["sp"]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("sp", None, None), P("sp", None)),
        out_specs=(P("sp", None, None), P("sp", None, None), P("sp", None, None)),
        check_vma=False,
    )
    def sweep(d_block, v_block):
        # d_block: (B, K, D) local block; visitor starts as own block
        B, K, _ = d_block.shape
        my = jax.lax.axis_index("sp")

        def step(carry, s):
            vis_d, vis_v, outs = carry
            src = (my - s) % n_sp  # which shard's block is visiting
            # DOUBLE BUFFERING: issue the ring transfer of the NEXT visitor
            # BEFORE matching the current one — the ppermute has no data
            # dependency on the match, so XLA's latency-hiding scheduler
            # overlaps ICI transfer with the MXU matmuls
            nxt_d = jax.lax.ppermute(vis_d, "sp", [(k, (k + 1) % n_sp) for k in range(n_sp)])
            nxt_v = jax.lax.ppermute(vis_v, "sp", [(k, (k + 1) % n_sp) for k in range(n_sp)])
            idx, dist, ok = _pair_match_block(d_block, v_block, vis_d, vis_v, ratio)
            outs_idx, outs_dist, outs_ok = outs
            outs_idx = _dyn_set(outs_idx, idx, src, B)
            outs_dist = _dyn_set(outs_dist, dist, src, B)
            outs_ok = _dyn_set(outs_ok, ok, src, B)
            return (nxt_d, nxt_v, (outs_idx, outs_dist, outs_ok)), None

        N = B * n_sp
        outs0 = (
            jnp.zeros((B, N, K), jnp.int32),
            jnp.full((B, N, K), jnp.inf, jnp.float32),
            jnp.zeros((B, N, K), bool),
        )
        (_, _, outs), _ = jax.lax.scan(step, (d_block, v_block, outs0), jnp.arange(n_sp))
        return outs

    def _dyn_set(buf, val, src, B):
        # buf (B, N, K), val (B, Bt=B, K): write columns [src*B, (src+1)*B)
        return jax.lax.dynamic_update_slice(buf, val.astype(buf.dtype), (0, src * B, 0))

    idx, dist, ok = sweep(jnp.asarray(descs), jnp.asarray(valids))
    return idx, dist, ok


def all_pairs_match_reference(descs, valids, ratio: float = 0.8):
    """Single-device reference implementation (for parity tests)."""
    idx, dist, ok = _pair_match_block(descs, valids, descs, valids, ratio)
    return idx, dist, ok
