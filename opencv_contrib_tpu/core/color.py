"""Color conversion (parity with the cvtColor calls the reference pipelines
use: BGR/RGB->gray before feature extraction, e.g. xfeatures2d/src/surf.cpp:929)."""

from __future__ import annotations

import jax.numpy as jnp


def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) -> (..., H, W), ITU-R BT.601 weights (matches OpenCV)."""
    w = jnp.array([0.299, 0.587, 0.114], dtype=jnp.float32)
    return jnp.einsum("...c,c->...", img.astype(jnp.float32), w)


def bgr_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    w = jnp.array([0.114, 0.587, 0.299], dtype=jnp.float32)
    return jnp.einsum("...c,c->...", img.astype(jnp.float32), w)


def rgb_to_hsv(img: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) in [0,1] -> HSV with H in [0, 360)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = mx - mn
    safe = jnp.where(diff == 0, 1.0, diff)
    h = jnp.where(
        mx == r,
        60.0 * ((g - b) / safe),
        jnp.where(mx == g, 60.0 * ((b - r) / safe) + 120.0, 60.0 * ((r - g) / safe) + 240.0),
    )
    h = jnp.where(diff == 0, 0.0, jnp.mod(h, 360.0))
    s = jnp.where(mx == 0, 0.0, diff / jnp.where(mx == 0, 1.0, mx))
    return jnp.stack([h, s, mx], axis=-1)


def rgb_to_ycrcb(img: jnp.ndarray) -> jnp.ndarray:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cr = (r - y) * 0.713 + 0.5
    cb = (b - y) * 0.564 + 0.5
    return jnp.stack([y, cr, cb], axis=-1)


def ycrcb_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    y, cr, cb = img[..., 0], img[..., 1], img[..., 2]
    r = y + 1.403 * (cr - 0.5)
    g = y - 0.714 * (cr - 0.5) - 0.344 * (cb - 0.5)
    b = y + 1.773 * (cb - 0.5)
    return jnp.stack([r, g, b], axis=-1)


def rgb_to_lab(img: jnp.ndarray) -> jnp.ndarray:
    """sRGB in [0,1] -> CIE L*a*b* (D65). Used by mcc/xphoto-class modules."""
    img = jnp.clip(img, 0.0, 1.0)
    lin = jnp.where(img > 0.04045, ((img + 0.055) / 1.055) ** 2.4, img / 12.92)
    M = jnp.array(
        [
            [0.412453, 0.357580, 0.180423],
            [0.212671, 0.715160, 0.072169],
            [0.019334, 0.119193, 0.950227],
        ],
        dtype=jnp.float32,
    )
    xyz = jnp.einsum("...c,dc->...d", lin, M)
    white = jnp.array([0.950456, 1.0, 1.088754], dtype=jnp.float32)
    xyz = xyz / white
    f = jnp.where(xyz > 0.008856, jnp.cbrt(xyz), 7.787 * xyz + 16.0 / 116.0)
    L = jnp.where(xyz[..., 1] > 0.008856, 116.0 * jnp.cbrt(xyz[..., 1]) - 16.0, 903.3 * xyz[..., 1])
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return jnp.stack([L, a, b], axis=-1)
