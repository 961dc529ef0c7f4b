"""BinaryDescriptorMatcher — multi-index hashing over binary LBD descriptors.

Reference anchor: line_descriptor/src/binary_descriptor_matcher.cpp
(cv::line_descriptor::BinaryDescriptorMatcher) — Norouzi et al. multi-index
hashing: a B-bit code is split into m substrings; a query probes each
substring's hash bucket, and by pigeonhole any code within Hamming radius
r < m collides exactly in at least one table. Candidates are then verified
with exact Hamming distance.

TPU-first: tables are dense (m, 2^b, cap) int32 bucket arrays built by a
sort (no host hash maps); query probing is a static gather; verification is
XOR + bitwise_count over the candidate set, then top_k. Also provides
`lbd_binarize` — the reference's float-LBD -> binary conversion (pairwise
band comparisons).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


@jax.jit
def lbd_binarize(desc: jnp.ndarray) -> jnp.ndarray:
    """Binarize float LBD descriptors (N, D) into packed uint32 words
    (parity: BinaryDescriptor's binary LBD stage — bits are comparisons of
    descriptor component pairs). Produces ceil(D*(D-1)/2 / 32)*32 bits from
    all ordered pairs i<j, packed little-endian per word."""
    N, D = desc.shape
    ii, jj = jnp.triu_indices(D, k=1)
    bits = (desc[:, ii] > desc[:, jj]).astype(jnp.uint32)  # (N, P)
    P = bits.shape[1]
    pad = (-P) % 32
    bits = jnp.pad(bits, ((0, 0), (0, pad)))
    bits = bits.reshape(N, -1, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return (bits << shifts[None, None]).sum(-1).astype(jnp.uint32)


class MIHIndex(NamedTuple):
    buckets: jnp.ndarray   # (m, 2^b, cap) int32 descriptor ids, -1 = empty
    codes: jnp.ndarray     # (N, n_words) uint32 database codes
    b: int                 # substring bits (8)


def _substrings(codes: jnp.ndarray, b: int = 8) -> jnp.ndarray:
    """(N, n_words) uint32 -> (N, m) uint32 b-bit substring keys."""
    per = 32 // b
    mask = jnp.uint32((1 << b) - 1)
    subs = [(codes >> jnp.uint32(b * k)) & mask for k in range(per)]
    return jnp.stack(subs, -1).reshape(codes.shape[0], -1)


def mih_build(codes: jnp.ndarray, b: int = 8, cap: int = 32) -> MIHIndex:
    """Build the multi-index (parity: BinaryDescriptorMatcher::add+train)."""
    return MIHIndex(buckets=_mih_build(codes, b, cap), codes=codes, b=b)


@partial(jax.jit, static_argnames=("b", "cap"))
def _mih_build(codes: jnp.ndarray, b: int, cap: int) -> jnp.ndarray:
    """Sort-based bucket fill: per table, stable-sort ids by bucket key and
    scatter into each bucket's first `cap` slots (overflow dropped — the
    reference's buckets are unbounded; cap trades recall for static shape)."""
    N = codes.shape[0]
    subs = _substrings(codes, b)  # (N, m)
    m = subs.shape[1]
    n_buckets = 1 << b

    def build_table(keys):
        order = jnp.argsort(keys)
        sk = keys[order]
        # rank within bucket = position - first position of this key
        first = jnp.searchsorted(sk, jnp.arange(n_buckets, dtype=sk.dtype))
        rank = jnp.arange(N) - first[sk]
        tbl = jnp.full((n_buckets, cap), -1, jnp.int32)
        ok = rank < cap
        flat = sk.astype(jnp.int32) * cap + jnp.clip(rank, 0, cap - 1).astype(jnp.int32)
        tbl = tbl.reshape(-1).at[flat].set(
            jnp.where(ok, order.astype(jnp.int32), -1), mode="drop")
        return tbl.reshape(n_buckets, cap)

    buckets = jax.vmap(build_table, in_axes=1)(subs)  # (m, 2^b, cap)
    return buckets


def mih_knn_match(index: MIHIndex, queries: jnp.ndarray, k: int = 2):
    """kNN match with exact-Hamming verification of the probed candidates
    (parity: BinaryDescriptorMatcher::knnMatch). Returns (idx (Q, k),
    dist (Q, k)); unfilled slots have idx -1 and dist = B+1."""
    return _mih_knn(index.buckets, index.codes, queries, b=index.b, k=k)


@partial(jax.jit, static_argnames=("b", "k"))
def _mih_knn(buckets, codes, queries, b: int, k: int):
    B_bits = codes.shape[1] * 32
    subs_q = _substrings(queries, b)  # (Q, m)
    m = subs_q.shape[1]

    def one(q_code, q_subs):
        cand = buckets[jnp.arange(m), q_subs.astype(jnp.int32)]  # (m, cap)
        cand = cand.reshape(-1)
        safe = jnp.maximum(cand, 0)
        dbc = codes[safe]  # (C, n_words)
        ham = jnp.bitwise_count(jnp.bitwise_xor(dbc, q_code[None])).sum(-1).astype(jnp.int32)
        ham = jnp.where(cand >= 0, ham, B_bits + 1)
        # dedupe: same id may appear in several tables — keep the first by
        # penalizing duplicates (same id, later position)
        order = jnp.argsort(cand)
        sc = cand[order]
        dup = jnp.concatenate([jnp.array([False]), sc[1:] == sc[:-1]])
        ham = ham.at[order].set(jnp.where(dup, B_bits + 1, ham[order]))
        neg = -ham
        top_v, top_i = jax.lax.top_k(neg, k)
        return jnp.where(top_v > -(B_bits + 1), cand[top_i], -1), -top_v

    return jax.vmap(one)(queries, subs_q)


def mih_radius_match(index: MIHIndex, queries: jnp.ndarray, radius: int,
                     max_results: int = 16):
    """Radius match (parity: BinaryDescriptorMatcher::radiusMatch): all
    probed candidates within Hamming `radius`. Exact for radius < m tables
    (pigeonhole), as in the reference."""
    idx, dist = mih_knn_match(index, queries, k=max_results)
    ok = dist <= radius
    return jnp.where(ok, idx, -1), jnp.where(ok, dist, index.codes.shape[1] * 32 + 1)
