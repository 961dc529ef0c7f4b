"""BIF — biologically inspired features for face/age analysis.

Reference anchor: face/src/bif.cpp (cv::face::BIF::create(num_bands,
num_rotations)): a bank of Gabor filters over num_bands scale bands x
num_rotations orientations; within each band, responses of two consecutive
Gabor scales are combined with max pooling over local grids (HMAX C1 units),
then standard-deviation-pooled into the output feature vector.

TPU-first: the whole Gabor bank is ONE grouped convolution (stack the
kernels on the output-channel axis, let the MXU chew it); band max and grid
pooling are reduce_windows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _gabor_kernel(ksize: int, sigma: float, theta: float, lam: float, gamma: float = 0.3):
    half = ksize // 2
    ys, xs = np.mgrid[-half:half + 1, -half:half + 1].astype(np.float32)
    xr = xs * np.cos(theta) + ys * np.sin(theta)
    yr = -xs * np.sin(theta) + ys * np.cos(theta)
    g = np.exp(-(xr ** 2 + gamma ** 2 * yr ** 2) / (2 * sigma ** 2)) * np.cos(2 * np.pi * xr / lam)
    g -= g.mean()
    n = np.sqrt((g ** 2).sum())
    return g / max(n, 1e-9)


def _bank(num_bands: int, num_rotations: int):
    """(n_filters, k, k) Gabor bank padded to a common kernel size; scales
    follow the HMAX band schedule (two consecutive sizes per band)."""
    sizes = [7 + 2 * i for i in range(2 * num_bands)]
    kmax = sizes[-1]
    kernels = []
    meta = []  # (band, rot) per filter
    for b in range(num_bands):
        for s_idx in (2 * b, 2 * b + 1):
            k = sizes[s_idx]
            sigma = 0.0036 * k * k + 0.35 * k + 0.18
            lam = sigma / 0.8
            for r in range(num_rotations):
                theta = np.pi * r / num_rotations
                g = _gabor_kernel(k, sigma, theta, lam)
                pad = (kmax - k) // 2
                kernels.append(np.pad(g, pad))
                meta.append((b, r))
    return jnp.asarray(np.stack(kernels), jnp.float32), meta, kmax


@partial(jax.jit, static_argnames=("num_bands", "num_rotations"))
def bif_features(img: jnp.ndarray, num_bands: int = 8, num_rotations: int = 12) -> jnp.ndarray:
    """BIF descriptor of a (H, W) face crop (parity: cv::face::BIF::compute).

    Returns the concatenated per-band per-rotation grid standard deviations.
    Feature length = num_bands * num_rotations * 4 (2x2 pooling grid)."""
    bank, meta, kmax = _bank(num_bands, num_rotations)
    f = img.astype(jnp.float32)
    f = (f - f.mean()) / jnp.maximum(f.std(), 1e-6)
    H, W = f.shape

    # one conv: input (1, 1, H, W), kernel (n_filters, 1, k, k)
    x = f[None, None]
    k = bank[:, None]
    resp = jax.lax.conv_general_dilated(x, k, (1, 1), "SAME")[0]  # (n_filters, H, W)
    resp = jnp.abs(resp)

    n_rot = num_rotations
    feats = []
    for b in range(num_bands):
        base = b * 2 * n_rot
        # C1: max over the two scales of the band
        c1 = jnp.maximum(resp[base:base + n_rot], resp[base + n_rot:base + 2 * n_rot])
        # grid std pooling (2x2)
        hh, ww = H // 2, W // 2
        cells = [c1[:, :hh, :ww], c1[:, :hh, ww:], c1[:, hh:, :ww], c1[:, hh:, ww:]]
        for cell in cells:
            feats.append(cell.std(axis=(1, 2)))
    return jnp.concatenate(feats)
