"""White balance (parity: xphoto SimpleWB / GrayworldWB)."""

from __future__ import annotations

import jax.numpy as jnp


def simple_wb(img: jnp.ndarray, p: float = 0.005) -> jnp.ndarray:
    """SimpleWB: per-channel percentile stretch to [0, 1]
    (xphoto/src/simple_color_balance.cpp)."""
    flat = img.reshape(-1, img.shape[-1])
    lo = jnp.quantile(flat, p, axis=0)
    hi = jnp.quantile(flat, 1.0 - p, axis=0)
    return jnp.clip((img - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0)


def grayworld_wb(img: jnp.ndarray, sat_thresh: float = 0.98) -> jnp.ndarray:
    """GrayworldWB: scale channels so their (saturation-gated) means agree
    (xphoto/src/grayworld_white_balance.cpp)."""
    mx = jnp.max(img, axis=-1)
    ok = (mx < sat_thresh)[..., None]
    w = ok.astype(img.dtype)
    means = jnp.sum(img * w, axis=(0, 1)) / jnp.maximum(jnp.sum(w, axis=(0, 1)), 1.0)
    gray = jnp.mean(means)
    gains = gray / jnp.maximum(means, 1e-6)
    return jnp.clip(img * gains, 0.0, 1.0)
