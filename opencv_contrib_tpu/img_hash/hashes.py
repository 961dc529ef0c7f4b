"""Perceptual hash implementations (see package docstring for anchors)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from opencv_contrib_tpu.ops.image import resize
from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.core import color


def _to_gray(img):
    if img.ndim == 3:
        return color.rgb_to_gray(img)
    return img.astype(jnp.float32)


def average_hash(img: jnp.ndarray) -> jnp.ndarray:
    """AverageHash: 8x8 mean-threshold bits -> (64,) bool."""
    small = resize(_to_gray(img), (8, 8), method="area") if _to_gray(img).shape[0] % 8 == 0 else resize(_to_gray(img), (8, 8))
    return (small > small.mean()).reshape(-1)


def block_mean_hash(img: jnp.ndarray, blocks: int = 16) -> jnp.ndarray:
    """BlockMeanHash mode 0: blocks x blocks block means vs median."""
    g = resize(_to_gray(img), (blocks * 4, blocks * 4))
    means = g.reshape(blocks, 4, blocks, 4).mean(axis=(1, 3))
    return (means > jnp.median(means)).reshape(-1)


def _dct_matrix(n: int) -> jnp.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    M = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    M[0] /= np.sqrt(2.0)
    return jnp.asarray(M, jnp.float32)


def phash(img: jnp.ndarray) -> jnp.ndarray:
    """PHash: 32x32 DCT, top-left 8x8 (minus DC) vs median -> 64 bits."""
    g = resize(_to_gray(img), (32, 32))
    M = _dct_matrix(32)
    d = M @ g @ M.T
    block = d[:8, :8]
    vals = block.reshape(-1)
    med = jnp.median(vals[1:])
    return (vals > med).reshape(-1)


def color_moment_hash(img: jnp.ndarray) -> jnp.ndarray:
    """ColorMomentHash: first 3 moments per channel in RGB + HSV (42-dim in
    the reference incl. YCrCb; we use RGB+HSV+YCrCb = 27 floats)."""
    assert img.ndim == 3
    feats = []
    for space in (img, color.rgb_to_hsv(jnp.clip(img, 0, 1)), color.rgb_to_ycrcb(img)):
        for c in range(3):
            ch = space[..., c]
            mu = ch.mean()
            sd = jnp.sqrt(jnp.mean((ch - mu) ** 2))
            sk = jnp.cbrt(jnp.mean((ch - mu) ** 3))
            feats += [mu, sd, sk]
    return jnp.stack(feats)


def radial_variance_hash(img: jnp.ndarray, n_angles: int = 40) -> jnp.ndarray:
    """RadialVarianceHash: variance of projections along radial lines ->
    DCT -> 40 floats (simplified: the radial-projection variance vector)."""
    g = resize(_to_gray(img), (64, 64))
    H, W = 64, 64
    cy = cx = 31.5
    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) - cy
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) - cx
    ang = jnp.arctan2(y, x) % jnp.pi
    bins = jnp.clip((ang / jnp.pi * n_angles).astype(jnp.int32), 0, n_angles - 1)
    flat_b = bins.reshape(-1)
    flat_g = g.reshape(-1)
    s1 = jnp.zeros(n_angles).at[flat_b].add(flat_g)
    s2 = jnp.zeros(n_angles).at[flat_b].add(flat_g * flat_g)
    n = jnp.zeros(n_angles).at[flat_b].add(1.0)
    var = s2 / jnp.maximum(n, 1) - (s1 / jnp.maximum(n, 1)) ** 2
    return var / jnp.maximum(var.max(), 1e-9)


def marr_hildreth_hash(img: jnp.ndarray) -> jnp.ndarray:
    """MarrHildrethHash: LoG response signs over blocks -> bits."""
    g = resize(_to_gray(img), (64, 64))
    log = filters.laplacian(filters.gaussian_blur(g, 2.0))
    blocks = log.reshape(16, 4, 16, 4).mean(axis=(1, 3))
    # each 3x3 block neighborhood comparison vs center
    c = blocks[1:-1, 1:-1]
    bits = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            bits.append((blocks[1 + dy : 15 + dy, 1 + dx : 15 + dx] > c).reshape(-1))
    return jnp.concatenate(bits)


def hamming_compare(h1: jnp.ndarray, h2: jnp.ndarray) -> jnp.ndarray:
    """Bit hash distance (ImgHashBase::compare for binary hashes)."""
    return jnp.sum(h1 != h2)
