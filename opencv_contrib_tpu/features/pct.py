"""PCT signatures: keypoint-free image signatures + SQFD distance.

Parity: xfeatures2d pct_signatures.cpp (PCTSignatures: grayscale-position-
contrast-entropy feature points clustered into a weighted signature) and
pct_signatures_sqfd.cpp (SQFD: Signature Quadratic Form Distance).

TPU-first: sampling is a fixed pseudo-random grid gather; clustering is a
fixed-iteration Lloyd k-means entirely in-graph (one-hot assignment
matmul, static shapes); SQFD is three small matmuls with a Gaussian
similarity kernel.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.ops.image import sample_bilinear_multi


class Signature(NamedTuple):
    centroids: jnp.ndarray  # (K, D) feature-space centroids
    weights: jnp.ndarray  # (K,) cluster masses (sum 1 over valid)
    valid: jnp.ndarray  # (K,) bool


def _sample_features(img: jnp.ndarray, n_samples: int, seed: int) -> jnp.ndarray:
    """Feature points (N, 6): [x, y, L, contrast, entropy-proxy, gradmag],
    positions/intensities normalized to [0, 1] (pct_signatures feature
    layout minus chroma for grayscale input)."""
    H, W = img.shape
    g = img / (jnp.abs(img).max() + 1e-9)
    rng = np.random.default_rng(seed)
    ys = jnp.asarray(rng.uniform(2, H - 3, n_samples).astype(np.float32))
    xs = jnp.asarray(rng.uniform(2, W - 3, n_samples).astype(np.float32))

    blur = filters.fast_gaussian_blur(g, 2.0)
    local_sq = filters.box_filter(g * g, 2)
    local_mean = filters.box_filter(g, 2)
    contrast = jnp.sqrt(jnp.maximum(local_sq - local_mean**2, 0.0))
    gy, gx = filters.gradients(g)
    gmag = jnp.sqrt(gx * gx + gy * gy)
    maps = jnp.stack([blur, contrast, gmag])
    vals = sample_bilinear_multi(maps, ys, xs)  # (3, N)
    return jnp.stack(
        [xs / W, ys / H, vals[0], vals[1], vals[2], vals[1] * vals[2]], axis=1
    )


@partial(jax.jit, static_argnames=("k", "iters"))
def _kmeans(feats: jnp.ndarray, init: jnp.ndarray, k: int, iters: int = 8):
    """Fixed-iteration Lloyd: assignment via one distance matmul, update via
    one-hot matmul — static shapes, MXU-resident."""

    def step(cents, _):
        d = ((feats[:, None] - cents[None]) ** 2).sum(-1)  # (N, K)
        a = jnp.argmin(d, 1)
        oh = jax.nn.one_hot(a, k, dtype=jnp.float32)  # (N, K)
        mass = oh.sum(0)
        newc = (oh.T @ feats) / jnp.maximum(mass[:, None], 1.0)
        cents = jnp.where(mass[:, None] > 0, newc, cents)
        return cents, mass

    cents, masses = jax.lax.scan(step, init, None, length=iters)
    return cents, masses[-1]


def compute_signature(img: jnp.ndarray, k: int = 8, n_samples: int = 512,
                      iters: int = 8, seed: int = 0, min_weight: float = 1e-3) -> Signature:
    """PCTSignatures::computeSignature analog: sample -> k-means -> weighted
    signature."""
    feats = _sample_features(jnp.asarray(img, jnp.float32), n_samples, seed)
    init = feats[:: max(n_samples // k, 1)][:k]
    cents, mass = _kmeans(feats, init, k, iters)
    w = mass / mass.sum()
    return Signature(centroids=cents, weights=w, valid=w > min_weight)


@partial(jax.jit, static_argnames=())
def sqfd(s1: Signature, s2: Signature, alpha: float = 2.0) -> jnp.ndarray:
    """Signature Quadratic Form Distance with the Gaussian similarity
    kernel sim(a,b) = exp(-alpha |a-b|^2): d^2 = wᵀ A w for concatenated
    w = [w1, -w2] (pct_signatures_sqfd.cpp)."""
    c = jnp.concatenate([s1.centroids, s2.centroids])
    w = jnp.concatenate([s1.weights * s1.valid, -(s2.weights * s2.valid)])
    d2 = ((c[:, None] - c[None]) ** 2).sum(-1)
    A = jnp.exp(-alpha * d2)
    q = w @ A @ w
    return jnp.sqrt(jnp.maximum(q, 0.0))
