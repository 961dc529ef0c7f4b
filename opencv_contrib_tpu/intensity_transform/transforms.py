"""Global intensity transforms on float images in [0, 1]."""

from __future__ import annotations

import jax.numpy as jnp

from opencv_contrib_tpu.ops import filters


def gamma_correction(img: jnp.ndarray, gamma: float) -> jnp.ndarray:
    return jnp.clip(img, 0.0, 1.0) ** gamma


def log_transform(img: jnp.ndarray) -> jnp.ndarray:
    """out = log(1 + img) scaled to [0, 1] (logTransform semantics)."""
    c = 1.0 / jnp.log1p(jnp.maximum(img.max(), 1e-9))
    return c * jnp.log1p(jnp.clip(img, 0.0, None))


def autoscaling(img: jnp.ndarray) -> jnp.ndarray:
    mn, mx = img.min(), img.max()
    return (img - mn) / jnp.maximum(mx - mn, 1e-9)


def contrast_stretching(img: jnp.ndarray, r1: float, s1: float, r2: float, s2: float) -> jnp.ndarray:
    """Piecewise-linear contrast stretch through (r1, s1), (r2, s2)."""
    a = jnp.where(
        img < r1,
        img * (s1 / jnp.maximum(r1, 1e-9)),
        jnp.where(
            img < r2,
            s1 + (img - r1) * (s2 - s1) / jnp.maximum(r2 - r1, 1e-9),
            s2 + (img - r2) * (1.0 - s2) / jnp.maximum(1.0 - r2, 1e-9),
        ),
    )
    return jnp.clip(a, 0.0, 1.0)


def bimef(img: jnp.ndarray, mu: float = 0.5) -> jnp.ndarray:
    """BIMEF-style low-light enhancement (simplified): illumination map from
    smoothed max-channel, camera-response-model exposure boost of dark
    regions, weighted fusion."""
    if img.ndim == 3:
        lum = img.max(axis=-1)
    else:
        lum = img
    illum = filters.guided_filter(lum, lum, radius=7, eps=1e-3)
    illum = jnp.clip(illum, 1e-3, 1.0)
    # exposure ratio per pixel
    k = (1.0 / illum) ** 0.8
    if img.ndim == 3:
        k = k[..., None]
    enhanced = jnp.clip(img * k, 0.0, 1.0)
    w = illum**mu
    if img.ndim == 3:
        w = w[..., None]
    return jnp.clip(w * img + (1 - w) * enhanced, 0.0, 1.0)
