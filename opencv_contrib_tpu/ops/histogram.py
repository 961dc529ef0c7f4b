"""Histograms + CLAHE-class contrast ops (cudaimgproc-class capability).

TPU-first: histograms as one-hot segment sums (matmul-able), equalization as
gather through the cumulative LUT.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def histogram(img: jnp.ndarray, bins: int = 256, vmin: float = 0.0, vmax: float = 1.0) -> jnp.ndarray:
    """Histogram of values in [vmin, vmax] over `bins` buckets."""
    x = jnp.clip((img - vmin) / (vmax - vmin), 0.0, 1.0 - 1e-7)
    idx = (x * bins).astype(jnp.int32).reshape(-1)
    return jnp.zeros((bins,), jnp.float32).at[idx].add(1.0)


def equalize_hist(img: jnp.ndarray, bins: int = 256) -> jnp.ndarray:
    """Histogram equalization of a float image in [0, 1]."""
    h = histogram(img, bins)
    cdf = jnp.cumsum(h)
    cdf = cdf / jnp.maximum(cdf[-1], 1.0)
    idx = jnp.clip((img * bins).astype(jnp.int32), 0, bins - 1)
    return jnp.take(cdf, idx)


def clahe(img: jnp.ndarray, clip_limit: float = 4.0, grid: int = 8, bins: int = 256) -> jnp.ndarray:
    """Contrast-limited adaptive histogram equalization on (H, W) in [0,1].

    Parity target: cv::cuda::CLAHE (cudaimgproc). Tiles the image into a
    grid x grid lattice, clips each tile histogram, builds per-tile LUTs and
    bilinearly blends them — all as one batched computation.
    """
    H, W = img.shape
    th, tw = H // grid, W // grid
    img_c = img[: th * grid, : tw * grid]
    tiles = img_c.reshape(grid, th, grid, tw).transpose(0, 2, 1, 3).reshape(grid * grid, th * tw)
    idx = jnp.clip((tiles * bins).astype(jnp.int32), 0, bins - 1)
    onehot_sum = jax.vmap(lambda ix: jnp.zeros((bins,), jnp.float32).at[ix].add(1.0))(idx)
    # clip and redistribute
    limit = clip_limit * (th * tw) / bins
    excess = jnp.sum(jnp.maximum(onehot_sum - limit, 0.0), axis=1, keepdims=True)
    clipped = jnp.minimum(onehot_sum, limit) + excess / bins
    cdf = jnp.cumsum(clipped, axis=1)
    luts = cdf / jnp.maximum(cdf[:, -1:], 1.0)  # (grid*grid, bins)
    luts = luts.reshape(grid, grid, bins)

    y = jnp.arange(H, dtype=jnp.float32)
    x = jnp.arange(W, dtype=jnp.float32)
    ty = jnp.clip((y - th / 2) / th, 0.0, grid - 1.0)
    tx = jnp.clip((x - tw / 2) / tw, 0.0, grid - 1.0)
    ty0 = jnp.floor(ty).astype(jnp.int32)
    tx0 = jnp.floor(tx).astype(jnp.int32)
    ty1 = jnp.minimum(ty0 + 1, grid - 1)
    tx1 = jnp.minimum(tx0 + 1, grid - 1)
    wy = (ty - ty0)[:, None]
    wx = (tx - tx0)[None, :]

    bi = jnp.clip((img * bins).astype(jnp.int32), 0, bins - 1)

    # gather per-pixel from the 4 neighboring tile LUTs
    flat_luts = luts.reshape(-1)

    def sample_lut(tyi, txi):
        tid = tyi[:, None] * grid + txi[None, :]
        return jnp.take(flat_luts, tid * bins + bi)

    v00 = sample_lut(ty0, tx0)
    v01 = sample_lut(ty0, tx1)
    v10 = sample_lut(ty1, tx0)
    v11 = sample_lut(ty1, tx1)
    out = (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx + v10 * wy * (1 - wx) + v11 * wy * wx)
    return out
