"""RgbdNormals — the three normal-estimation methods of rgbd/src/normal.cpp.

Reference anchors:
- RgbdNormals::RGBD_NORMALS_METHOD_FALS — per-pixel least-squares plane fit
  over a window, solved with precomputed ray-geometry matrices (normal.cpp,
  FALS functor). Here: windowed 3x3 scatter matrices via box filters + one
  vmapped closed-form 3x3 solve per pixel (all dense, XLA-fused).
- RGBD_NORMALS_METHOD_LINEMOD — normals from depth-gradient tangent vectors
  (normal.cpp LINEMOD functor, also linemod.cpp quantizeNormals).
- RGBD_NORMALS_METHOD_SRI — spherical range image derivatives; here realized
  as range-domain smoothing + cross-product of smoothed tangents (same
  estimator family; the camera grid stands in for the spherical grid).

The existing cross-product method lives in rgbd.frame.compute_normals
(kinfu_frame.cpp computePointsNormals).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.rgbd.frame import depth_to_points


def _orient_to_camera(n, points):
    flip = jnp.sum(n * points, axis=-1, keepdims=True) > 0
    return jnp.where(flip, -n, n)


@partial(jax.jit, static_argnames=("radius",))
def normals_fals(depth: jnp.ndarray, intr: jnp.ndarray, radius: int = 3) -> jnp.ndarray:
    """FALS normals: for each pixel fit the plane n . p = 1 over the window's
    3D points (minimizes sum (n.p_i - 1)^2 -> (sum p p^T) n = sum p); the
    3x3 window scatter matrices are 6 box-filtered product maps and the
    solve is a batched explicit inverse."""
    pts = depth_to_points(depth.astype(jnp.float32), intr)
    valid = depth > 0
    w = valid.astype(jnp.float32)
    pw = pts * w[..., None]

    def box(x):
        return filters.box_filter(x, radius) * (2 * radius + 1) ** 2

    # scatter matrix entries and right-hand side
    S = {}
    for i in range(3):
        for j in range(i, 3):
            S[(i, j)] = box(pw[..., i] * pts[..., j])
    b = jnp.stack([box(pw[..., i]) for i in range(3)], -1)  # (H, W, 3)

    A = jnp.stack([
        jnp.stack([S[(0, 0)], S[(0, 1)], S[(0, 2)]], -1),
        jnp.stack([S[(0, 1)], S[(1, 1)], S[(1, 2)]], -1),
        jnp.stack([S[(0, 2)], S[(1, 2)], S[(2, 2)]], -1),
    ], -2)  # (H, W, 3, 3)
    A = A + 1e-9 * jnp.eye(3)
    n = jnp.linalg.solve(A, b[..., None])[..., 0]
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-12)
    n = _orient_to_camera(n, pts)
    return jnp.where((valid & (norm[..., 0] > 1e-12))[..., None], n, 0.0)


@jax.jit
def normals_linemod(depth: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    """LINEMOD normals: tangents from central depth differences in camera
    units; n = normalize((-fx*dz/du, -fy*dz/dv, ...) cross structure) —
    equivalent to the cross product of the two tangent vectors of the
    back-projected surface, computed directly from depth gradients."""
    d = depth.astype(jnp.float32)
    valid = d > 0
    pts = depth_to_points(d, intr)
    # tangent vectors along u and v
    tu = (jnp.roll(pts, -1, 1) - jnp.roll(pts, 1, 1)) / 2.0
    tv = (jnp.roll(pts, -1, 0) - jnp.roll(pts, 1, 0)) / 2.0
    n = jnp.cross(tv, tu)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-12)
    n = _orient_to_camera(n, pts)
    ok = (valid & jnp.roll(valid, -1, 1) & jnp.roll(valid, 1, 1)
          & jnp.roll(valid, -1, 0) & jnp.roll(valid, 1, 0))
    return jnp.where(ok[..., None], n, 0.0)


@partial(jax.jit, static_argnames=())
def normals_sri(depth: jnp.ndarray, intr: jnp.ndarray, sigma: float = 1.5) -> jnp.ndarray:
    """SRI normals: smooth the range image (|p| rather than z), rebuild the
    points on the smoothed range along the original rays, then cross the
    tangents — the range-domain smoothing is what distinguishes SRI from
    LINEMOD and suppresses quantization noise on oblique surfaces."""
    d = depth.astype(jnp.float32)
    valid = d > 0
    pts = depth_to_points(d, intr)
    rng = jnp.linalg.norm(pts, axis=-1)
    rays = pts / jnp.maximum(rng[..., None], 1e-12)
    # masked range smoothing
    w = valid.astype(jnp.float32)
    rs = filters.gaussian_blur(rng * w, sigma) / jnp.maximum(
        filters.gaussian_blur(w, sigma), 1e-6)
    p2 = rays * rs[..., None]
    tu = (jnp.roll(p2, -1, 1) - jnp.roll(p2, 1, 1)) / 2.0
    tv = (jnp.roll(p2, -1, 0) - jnp.roll(p2, 1, 0)) / 2.0
    n = jnp.cross(tv, tu)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-12)
    n = _orient_to_camera(n, p2)
    return jnp.where((valid & (norm[..., 0] > 1e-12))[..., None], n, 0.0)


def rgbd_normals(depth: jnp.ndarray, intr: jnp.ndarray, method: str = "fals",
                 **kw) -> jnp.ndarray:
    """Factory dispatch (parity: cv::rgbd::RgbdNormals::create(method))."""
    fn = {"fals": normals_fals, "linemod": normals_linemod, "sri": normals_sri}[method]
    return fn(depth, intr, **kw)
