"""Mei unified-sphere omnidirectional camera model.

Projection (omnidir::projectPoints semantics): world point -> unit sphere ->
perspective from a center shifted by xi along z -> radial-tangential
distortion -> pixels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import se3
from opencv_contrib_tpu.ops.image import sample_bilinear, grid_coords


def project_points_omni(X, R, t, K, xi: float, dist=None):
    """X (..., 3) world -> pixels (..., 2). K (3,3); dist = (k1, k2, p1, p2)."""
    Xc = se3.rotate_points(R, X) + t
    s = Xc / jnp.maximum(jnp.linalg.norm(Xc, axis=-1, keepdims=True), 1e-9)
    denom = s[..., 2] + xi
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    xu = s[..., 0] / denom
    yu = s[..., 1] / denom
    if dist is not None:
        k1, k2, p1, p2 = dist
        r2 = xu * xu + yu * yu
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        xd = xu * radial + 2 * p1 * xu * yu + p2 * (r2 + 2 * xu * xu)
        yd = yu * radial + p1 * (r2 + 2 * yu * yu) + 2 * p2 * xu * yu
        xu, yu = xd, yd
    u = K[0, 0] * xu + K[0, 2]
    v = K[1, 1] * yu + K[1, 2]
    return jnp.stack([u, v], axis=-1)


def undistort_points_omni(px, K, xi: float, dist=None, iters: int = 20):
    """Pixels -> unit-sphere ray directions (..., 3) (cam frame)."""
    xd = (px[..., 0] - K[0, 2]) / K[0, 0]
    yd = (px[..., 1] - K[1, 2]) / K[1, 1]
    xu, yu = xd, yd
    if dist is not None:
        k1, k2, p1, p2 = dist

        def body(_, xy):
            x, y = xy
            r2 = x * x + y * y
            radial = 1.0 + k1 * r2 + k2 * r2 * r2
            dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
            dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
            return ((xd - dx) / radial, (yd - dy) / radial)

        xu, yu = jax.lax.fori_loop(0, iters, body, (xu, yu))
    # invert the sphere projection: find unit s with s_xy/(s_z + xi) = (xu, yu)
    r2 = xu * xu + yu * yu
    disc = jnp.sqrt(jnp.maximum(1.0 + (1.0 - xi * xi) * r2, 0.0))
    factor = (xi + disc) / (1.0 + r2)
    sz = factor - xi
    s = jnp.stack([factor * xu, factor * yu, sz], axis=-1)
    return s / jnp.maximum(jnp.linalg.norm(s, axis=-1, keepdims=True), 1e-9)


def undistort_image_omni(img, K, xi: float, K_new=None, dist=None, out_shape=None):
    """Render a perspective view from an omni image
    (omnidir::undistortImage RECTIFY_PERSPECTIVE)."""
    H, W = img.shape[:2] if out_shape is None else out_shape
    if K_new is None:
        K_new = K
    y, x = grid_coords(H, W)
    # perspective ray for each output pixel
    xr = (x - K_new[0, 2]) / K_new[0, 0]
    yr = (y - K_new[1, 2]) / K_new[1, 1]
    rays = jnp.stack([xr, yr, jnp.ones_like(xr)], axis=-1)
    px = project_points_omni(rays, jnp.eye(3), jnp.zeros(3), K, xi, dist)
    return sample_bilinear(img, px[..., 1], px[..., 0])


def calibrate_xi(obj_pts, img_pts, K, R, t, xi0: float = 0.8, iters: int = 30):
    """Refine the mirror parameter xi given known pose/intrinsics
    (the inner loop of omnidir::calibrate; full joint calibration composes
    this with mvg.resection/ba)."""
    obj_pts = jnp.asarray(obj_pts, jnp.float32)
    img_pts = jnp.asarray(img_pts, jnp.float32)

    def residual(xi):
        pred = project_points_omni(obj_pts, R, t, K, xi)
        return jnp.sum((pred - img_pts) ** 2)

    g = jax.grad(residual)
    h = jax.grad(lambda v: g(v))

    def body(_, xi):
        gg = g(xi)
        hh = h(xi)
        step = gg / jnp.where(jnp.abs(hh) > 1e-9, hh, 1e-9)
        return xi - jnp.clip(step, -0.2, 0.2)

    return jax.lax.fori_loop(0, iters, body, jnp.asarray(xi0))
