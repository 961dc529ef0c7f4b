"""Depth frame pipeline: bilateral filter -> depth pyramid -> per-level
points + normals.

Parity: makeFrameFromDepth (reference: rgbd/src/kinfu_frame.cpp:407
computePointsNormals, :255 pyrDownBilateral, :163 pyrDownPointsNormals).

Conventions: depth in meters, 0 = invalid; camera looks down +z; intr is the
core.camera 9-vector (distortion ignored for depth cameras, like the
reference's reprojector).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import pyramid
from opencv_contrib_tpu.ops import filters


class DepthFrame(NamedTuple):
    """One pyramid level: depth (H, W), points (H, W, 3), normals (H, W, 3),
    valid (H, W)."""

    depth: jnp.ndarray
    points: jnp.ndarray
    normals: jnp.ndarray
    valid: jnp.ndarray


def depth_to_points(depth: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    """Back-project depth map to camera-frame points (H, W, 3)."""
    H, W = depth.shape
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    x = (u - intr[2]) / intr[0] * depth
    y = (v - intr[3]) / intr[1] * depth
    return jnp.stack([x, y, depth], axis=-1)


def compute_normals(points: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Normals from central differences of the point map, oriented toward the
    camera (computePointsNormals, kinfu_frame.cpp:407)."""
    dx = jnp.roll(points, -1, axis=1) - jnp.roll(points, 1, axis=1)
    dy = jnp.roll(points, -1, axis=0) - jnp.roll(points, 1, axis=0)
    n = jnp.cross(dy, dx)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-12)
    # orient towards camera: n . p < 0 (camera at origin looking +z)
    flip = jnp.sum(n * points, axis=-1, keepdims=True) > 0
    n = jnp.where(flip, -n, n)
    ok = (
        valid
        & jnp.roll(valid, -1, 1) & jnp.roll(valid, 1, 1)
        & jnp.roll(valid, -1, 0) & jnp.roll(valid, 1, 0)
        & (norm[..., 0] > 1e-12)
    )
    return jnp.where(ok[..., None], n, 0.0), ok


@partial(jax.jit, static_argnames=("levels", "use_bilateral"))
def make_frame(
    depth: jnp.ndarray,
    intr: jnp.ndarray,
    levels: int = 3,
    sigma_depth: float = 0.04,
    sigma_spatial: float = 4.5,
    use_bilateral: bool = True,
) -> tuple[DepthFrame, ...]:
    """Full frame pipeline -> tuple of DepthFrame, finest first.

    Intrinsics halve per level (kinfu.cpp pyramid convention).
    """
    if use_bilateral:
        d0 = filters.bilateral_filter(depth, sigma_spatial, sigma_depth, radius=3)
    else:
        d0 = depth
    depths = pyramid.build_depth_pyramid(d0, levels, sigma_depth)
    frames = []
    it = intr
    for l in range(levels):
        d = depths[l]
        valid = d > 0
        pts = depth_to_points(d, it)
        normals, nvalid = compute_normals(pts, valid)
        frames.append(DepthFrame(depth=d, points=pts * valid[..., None], normals=normals, valid=nvalid))
        it = level_intrinsics(it, 1)
    return tuple(frames)


def level_intrinsics(intr: jnp.ndarray, levels_down: int = 1) -> jnp.ndarray:
    """Halve focal/center per pyramid level."""
    f = 0.5**levels_down
    return intr.at[:4].set(intr[:4] * f)
