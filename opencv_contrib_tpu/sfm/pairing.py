"""Image-pair pruning for large-scale matching.

The reference brute-forces ALL image pairs (nRobustViewMatching::
computeCrossMatch, nRobustViewMatching.cc:154 — O(N^2) knnMatch sweeps),
which SURVEY §7 flags as infeasible at thousands of images. This module
adds the vocabulary-style pruning the build plan calls for: a compact
global descriptor per image (BoW over a random codebook — VLAD-lite),
an all-pairs similarity MATMUL (cheap: N x D), and top-k pair selection.

TPU-first: descriptor->word assignment is one matmul + argmax; the
codebook is a fixed random projection (deterministic, training-free), and
the whole N^2 similarity is a single MXU product on normalized BoW
vectors.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def make_codebook(dim: int, n_words: int = 128, seed: int = 0):
    """Random unit codebook (training-free vocabulary)."""
    rng = np.random.default_rng(seed)
    C = rng.normal(size=(n_words, dim)).astype(np.float32)
    return jnp.asarray(C / np.linalg.norm(C, axis=1, keepdims=True))


@partial(jax.jit, static_argnames=())
def bow_descriptor(descs, valid, codebook):
    """(K, D) local descriptors -> (n_words,) tf-normalized BoW vector."""
    sim = descs @ codebook.T  # (K, W)
    word = jnp.argmax(sim, axis=1)
    h = jnp.zeros(codebook.shape[0]).at[word].add(valid.astype(jnp.float32))
    return h / jnp.maximum(jnp.linalg.norm(h), 1e-9)


@jax.jit
def pair_similarity(bows):
    """(N, W) image BoWs -> (N, N) cosine similarity (one matmul)."""
    s = bows @ bows.T
    return s - jnp.diag(jnp.diag(s))


def select_pairs(descs, valids, codebook=None, k: int = 8):
    """Top-k candidate pairs per image by BoW similarity.

    descs (N, K, D), valids (N, K). Returns a sorted, deduplicated list of
    (i, j) pairs — the match schedule that replaces the all-pairs sweep.
    """
    descs = jnp.asarray(descs)
    if codebook is None:
        codebook = make_codebook(descs.shape[-1])
    bows = jax.vmap(lambda d, v: bow_descriptor(d, v, codebook))(descs, jnp.asarray(valids))
    sim = np.asarray(pair_similarity(bows))
    N = sim.shape[0]
    k = min(k, N - 1)
    pairs = set()
    for i in range(N):
        for j in np.argsort(-sim[i])[:k]:
            if i != int(j):
                pairs.add((min(i, int(j)), max(i, int(j))))
    return sorted(pairs)
