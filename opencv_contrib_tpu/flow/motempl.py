"""Motion templates (motion history images).

Parity: optflow/src/motempl.cpp + include/opencv2/optflow/motempl.hpp:
updateMotionHistory, calcMotionGradient, calcGlobalOrientation,
segmentMotion (segmentation simplified to connected regions by threshold).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ops import filters


def update_motion_history(mhi: jnp.ndarray, silhouette: jnp.ndarray, timestamp: float, duration: float) -> jnp.ndarray:
    """cv::motempl::updateMotionHistory: set mhi=timestamp where moving,
    clear entries older than timestamp - duration."""
    mhi = jnp.where(silhouette > 0, timestamp, mhi)
    return jnp.where(mhi < timestamp - duration, 0.0, mhi)


def calc_motion_gradient(mhi: jnp.ndarray, delta1: float, delta2: float, aperture: int = 3):
    """Orientation of the MHI gradient + validity mask
    (cv::motempl::calcMotionGradient)."""
    gy = filters.sobel(mhi, dx=0, dy=1)
    gx = filters.sobel(mhi, dx=1, dy=0)
    orient = jnp.rad2deg(jnp.arctan2(gy, gx)) % 360.0
    lo, hi = min(delta1, delta2), max(delta1, delta2)
    # valid where local mhi range within [lo, hi]
    mx = jax.lax.reduce_window(mhi, -jnp.inf, jax.lax.max, (aperture, aperture), (1, 1), "SAME")
    mn = jax.lax.reduce_window(
        jnp.where(mhi > 0, mhi, jnp.inf), jnp.inf, jax.lax.min, (aperture, aperture), (1, 1), "SAME"
    )
    rng = jnp.where(jnp.isfinite(mn), mx - mn, 0.0)
    valid = (rng >= lo) & (rng <= hi) & (mhi > 0)
    return orient, valid


def calc_global_orientation(orient: jnp.ndarray, mask: jnp.ndarray, mhi: jnp.ndarray, timestamp: float, duration: float) -> jnp.ndarray:
    """Dominant motion direction weighted by recency
    (cv::motempl::calcGlobalOrientation)."""
    w = jnp.where(mask, jnp.clip((mhi - (timestamp - duration)) / jnp.maximum(duration, 1e-9), 0, 1), 0.0)
    rad = jnp.deg2rad(orient)
    s = jnp.sum(w * jnp.sin(rad))
    c = jnp.sum(w * jnp.cos(rad))
    return jnp.rad2deg(jnp.arctan2(s, c)) % 360.0
