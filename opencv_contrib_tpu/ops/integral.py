"""Integral images + box sums — the substrate of SURF/BEBLID/Star detectors.

Reference capability covered: cv::integral as used by
xfeatures2d/src/surf.cpp:936 (Fast-Hessian on integral image) and
beblid.cpp's average-gray box responses.

TPU-first: the integral image is two `jnp.cumsum`s (XLA lowers cumsum to a
log-depth scan — bandwidth-bound, no scalar loop). Box sums are 4 gathers on
the padded integral image; Haar responses are differences of box sums.
"""

from __future__ import annotations

import jax.numpy as jnp

from opencv_contrib_tpu.ops.image import _gather2d


def integral(img: jnp.ndarray) -> jnp.ndarray:
    """Summed-area table with one row/col of zero padding: out (H+1, W+1),
    out[i, j] = sum(img[:i, :j]) — same convention as cv::integral."""
    s = jnp.cumsum(jnp.cumsum(img.astype(jnp.float32), axis=0), axis=1)
    return jnp.pad(s, ((1, 0), (1, 0)))


def integral_sq(img: jnp.ndarray):
    """(integral, squared integral) pair — cv::integral's sqsum output."""
    f = img.astype(jnp.float32)
    return integral(f), integral(f * f)


def box_sum(ii: jnp.ndarray, y0, x0, h, w) -> jnp.ndarray:
    """Sum over img[y0:y0+h, x0:x0+w] from integral image ii (H+1, W+1).

    y0/x0 may be integer arrays (any shape); h/w scalars or arrays. Indices
    are clipped, matching the clamped Haar evaluation in surf.cpp.
    """
    y0 = jnp.asarray(y0, jnp.int32)
    x0 = jnp.asarray(x0, jnp.int32)
    y1 = y0 + h
    x1 = x0 + w
    a = _gather2d(ii, y0, x0)
    b = _gather2d(ii, y0, x1)
    c = _gather2d(ii, y1, x0)
    d = _gather2d(ii, y1, x1)
    return d - b - c + a


def box_mean(ii: jnp.ndarray, y0, x0, h, w) -> jnp.ndarray:
    return box_sum(ii, y0, x0, h, w) / (h * w)


def haar_x(ii: jnp.ndarray, yc, xc, size) -> jnp.ndarray:
    """Horizontal Haar wavelet response of width `size` centered at (yc, xc):
    right half minus left half (SURF orientation wavelets, surf.cpp:625)."""
    half = size // 2
    y0 = yc - half
    left = box_sum(ii, y0, xc - half, size, half)
    right = box_sum(ii, y0, xc, size, half)
    return right - left


def haar_y(ii: jnp.ndarray, yc, xc, size) -> jnp.ndarray:
    half = size // 2
    x0 = xc - half
    top = box_sum(ii, yc - half, x0, half, size)
    bot = box_sum(ii, yc, x0, half, size)
    return bot - top
