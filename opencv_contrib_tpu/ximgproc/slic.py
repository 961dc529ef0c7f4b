"""SLIC superpixels (parity: cv::ximgproc::SuperpixelSLIC, slic.hpp:78).

TPU-first: instead of the sequential per-cluster local search, each ITERATION
assigns every pixel to the best of its 9 neighboring cluster seeds (static
gather of 9 candidate labels) and recomputes centers by segment-sum — the
classic SLIC update as fully batched ops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("grid", "n_iters"))
def slic(img: jnp.ndarray, grid: int = 8, compactness: float = 10.0, n_iters: int = 8):
    """img (H, W) or (H, W, C) in [0,1]; grid x grid superpixels.

    Returns (labels (H, W) int32 in [0, grid*grid), centers (grid*grid, 2))."""
    if img.ndim == 2:
        img = img[..., None]
    H, W, C = img.shape
    S = (H / grid + W / grid) / 2.0  # nominal spacing
    K = grid * grid

    # initial seeds on a regular grid
    cy = (jnp.arange(grid) + 0.5) * (H / grid)
    cx = (jnp.arange(grid) + 0.5) * (W / grid)
    seeds_y = jnp.repeat(cy, grid)
    seeds_x = jnp.tile(cx, grid)
    seeds_c = img[
        jnp.clip(seeds_y.astype(jnp.int32), 0, H - 1),
        jnp.clip(seeds_x.astype(jnp.int32), 0, W - 1),
    ]

    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    m2 = (compactness / S) ** 2

    def body(state, _):
        sy, sx, sc = state
        # cell index of each pixel + 9 candidate clusters
        gy = jnp.clip((y / (H / grid)).astype(jnp.int32), 0, grid - 1)
        gx = jnp.clip((x / (W / grid)).astype(jnp.int32), 0, grid - 1)
        best_d = jnp.full((H, W), jnp.inf)
        best_k = jnp.zeros((H, W), jnp.int32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ky = jnp.clip(gy + dy, 0, grid - 1)
                kx = jnp.clip(gx + dx, 0, grid - 1)
                k = ky * grid + kx
                dc = jnp.sum((img - sc[k]) ** 2, axis=-1)
                ds = (y - sy[k]) ** 2 + (x - sx[k]) ** 2
                d = dc + m2 * ds
                upd = d < best_d
                best_d = jnp.where(upd, d, best_d)
                best_k = jnp.where(upd, k, best_k)
        # recompute centers
        flat_k = best_k.reshape(-1)
        ones = jnp.ones_like(flat_k, jnp.float32)
        cnt = jnp.zeros(K).at[flat_k].add(ones)
        sy_new = jnp.zeros(K).at[flat_k].add(y.reshape(-1)) / jnp.maximum(cnt, 1)
        sx_new = jnp.zeros(K).at[flat_k].add(x.reshape(-1)) / jnp.maximum(cnt, 1)
        sc_new = jnp.zeros((K, C)).at[flat_k].add(img.reshape(-1, C)) / jnp.maximum(cnt, 1)[:, None]
        keep = cnt > 0
        sy_new = jnp.where(keep, sy_new, sy)
        sx_new = jnp.where(keep, sx_new, sx)
        sc_new = jnp.where(keep[:, None], sc_new, sc)
        return (sy_new, sx_new, sc_new), best_k

    (sy, sx, sc), labels_hist = jax.lax.scan(body, (seeds_y, seeds_x, seeds_c), None, length=n_iters)
    labels = labels_hist[-1]
    centers = jnp.stack([sy, sx], axis=1)
    return labels, centers
