"""Rasterize a 2D curve into an image (Plot2d::render contract)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def plot2d(x, y, shape=(240, 320), line_value: float = 1.0, bg_value: float = 0.0, margin: int = 10, samples_per_seg: int = 8):
    """Render curve (x, y) -> (H, W) image with the curve drawn bright.

    Vectorized: segments are densified by linear interpolation and splatted
    with scatter-max."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    H, W = shape
    xmin, xmax = x.min(), x.max()
    ymin, ymax = y.min(), y.max()
    sx = (W - 1 - 2 * margin) / jnp.maximum(xmax - xmin, 1e-9)
    sy = (H - 1 - 2 * margin) / jnp.maximum(ymax - ymin, 1e-9)
    px = (x - xmin) * sx + margin
    py = (H - 1 - margin) - (y - ymin) * sy  # y up

    # densify segments
    t = jnp.linspace(0.0, 1.0, samples_per_seg)[None, :]
    qx = px[:-1, None] * (1 - t) + px[1:, None] * t
    qy = py[:-1, None] * (1 - t) + py[1:, None] * t
    xi = jnp.clip(jnp.round(qx).astype(jnp.int32), 0, W - 1).reshape(-1)
    yi = jnp.clip(jnp.round(qy).astype(jnp.int32), 0, H - 1).reshape(-1)
    img = jnp.full((H, W), bg_value, jnp.float32)
    return img.at[yi, xi].max(line_value)
