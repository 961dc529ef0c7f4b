"""GPC: Global Patch Collider sparse matching.

Reference anchor: optflow/src/sparse_matching_gpc.cpp (GPCForest: decision
trees over patch descriptors hash every pixel of both images to leaves;
pixels colliding in the same leaf across all trees become correspondences;
sparse_matching_gpc.hpp:295 findCorrespondences).

TPU-first: patch descriptors for EVERY pixel come from a stack of DCT-like
separable filters (one conv pass); each "tree" is a sequence of learned or
random hyperplane splits evaluated for all pixels at once, yielding an
integer leaf code per pixel per tree; the collision join is a sort-based
equi-join on the (tree-code tuple) hash — the same sorted-key join used by
surface_matching's PPF tables.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from opencv_contrib_tpu.ops import filters

DESC_DIM = 9


def patch_descriptors(img):
    """Per-pixel descriptors: responses to 3x3 separable DCT filters
    (the reference's patch descriptor is a DCT of the patch; a filter bank
    computes the same coefficients densely). Returns (H, W, 9)."""
    img = jnp.asarray(img, jnp.float32)
    b = [jnp.asarray([1.0, 1.0, 1.0]) / jnp.sqrt(3.0),
         jnp.asarray([1.0, 0.0, -1.0]) / jnp.sqrt(2.0),
         jnp.asarray([1.0, -2.0, 1.0]) / jnp.sqrt(6.0)]
    out = []
    for ky in b:
        for kx in b:
            out.append(filters.sep_filter2d(img, ky, kx))
    return jnp.stack(out, axis=-1)


def make_forest(key, n_trees: int = 4, depth: int = 8):
    """Random hyperplane forest: (n_trees, depth, DESC_DIM + 1) [w | b]."""
    kw, kb = jax.random.split(key)
    w = jax.random.normal(kw, (n_trees, depth, DESC_DIM))
    w = w / jnp.linalg.norm(w, axis=-1, keepdims=True)
    b = jnp.zeros((n_trees, depth, 1))
    return jnp.concatenate([w, b], axis=-1)


def train_forest(forest, descs):
    """Set each split's bias to the median response over training
    descriptors (balances the tree, GPCTree::trainNode's role).
    descs (N, DESC_DIM)."""
    resp = jnp.einsum("tdk,nk->tdn", forest[..., :DESC_DIM], descs)
    med = jnp.median(resp, axis=-1, keepdims=True)
    return jnp.concatenate([forest[..., :DESC_DIM], med], axis=-1)


@jax.jit
def leaf_codes(img, forest):
    """Hash every pixel: bit d of tree t = sign of hyperplane (t, d).
    Returns (H, W) int32 combined code over all trees."""
    d = patch_descriptors(img)
    resp = jnp.einsum("hwk,tdk->hwtd", d, forest[..., :DESC_DIM]) - forest[None, None, ..., DESC_DIM]
    bits = (resp > 0).astype(jnp.int32)
    depth = forest.shape[1]
    tree_code = (bits * (2 ** jnp.arange(depth))[None, None, None]).sum(-1)  # (H, W, T)
    T = forest.shape[0]
    # combine trees into one hash (collision requires ALL trees to agree)
    mult = (2**depth) ** jnp.arange(T)
    return (tree_code * mult[None, None]).sum(-1)


def find_correspondences(I0, I1, forest, max_matches: int = 2048):
    """Pixels with identical forest codes in both images and unique within
    each image become matches (GPCForest::findCorrespondences). Returns
    (pts0 (M, 2), pts1 (M, 2)) numpy arrays."""
    c0 = np.asarray(leaf_codes(jnp.asarray(I0, jnp.float32), forest)).reshape(-1)
    c1 = np.asarray(leaf_codes(jnp.asarray(I1, jnp.float32), forest)).reshape(-1)
    H, W = np.asarray(I0).shape

    def unique_map(c):
        order = np.argsort(c, kind="stable")
        cs = c[order]
        first = np.r_[True, cs[1:] != cs[:-1]]
        last = np.r_[cs[1:] != cs[:-1], True]
        uniq = first & last
        return cs[uniq], order[uniq]

    k0, i0 = unique_map(c0)
    k1, i1 = unique_map(c1)
    inter, a, b = np.intersect1d(k0, k1, return_indices=True)
    p0 = np.stack(np.unravel_index(i0[a], (H, W)), 1)
    p1 = np.stack(np.unravel_index(i1[b], (H, W)), 1)
    if p0.shape[0] > max_matches:
        p0, p1 = p0[:max_matches], p1[:max_matches]
    return p0.astype(np.float32), p1.astype(np.float32)
