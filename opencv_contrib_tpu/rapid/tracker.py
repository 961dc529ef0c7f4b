"""RAPID tracker core (rapid/src/rapid.cpp semantics, batched)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import se3
from opencv_contrib_tpu.mvg import resection
from opencv_contrib_tpu.ops.image import sample_bilinear


def extract_control_points(vertices, edges, n_per_edge: int = 8):
    """Sample 3D control points uniformly along model wireframe edges
    (extractControlPoints, rapid.cpp). vertices (V, 3), edges (E, 2) int.
    Returns (pts (E * n_per_edge, 3), dirs (E * n_per_edge, 3)) — each
    point carries its OWN edge's 3D direction so image tangents never mix
    across edges."""
    t = (jnp.arange(n_per_edge) + 0.5) / n_per_edge  # (n,)
    a = vertices[edges[:, 0]]  # (E, 3)
    b = vertices[edges[:, 1]]
    pts = a[:, None, :] + t[None, :, None] * (b - a)[:, None, :]
    d = b - a
    d = d / (jnp.linalg.norm(d, axis=1, keepdims=True) + 1e-9)
    dirs = jnp.broadcast_to(d[:, None, :], pts.shape)
    return pts.reshape(-1, 3), dirs.reshape(-1, 3)


def _project(K, R, t, X):
    Xc = X @ R.T + t[None]
    uv = Xc[:, :2] / jnp.maximum(Xc[:, 2:3], 1e-6)
    return uv @ K[:2, :2].T + K[:2, 2][None], Xc[:, 2]


@partial(jax.jit, static_argnames=("n_samples",))
def extract_line_bundle(img, pts2d, normals, search_len: float = 8.0, n_samples: int = 17):
    """Sample intensities along lines normal to the contour at each point
    (extractLineBundle). Returns (N, n_samples) plus the sample positions."""
    s = jnp.linspace(-search_len, search_len, n_samples)
    pos = pts2d[:, None, :] + s[None, :, None] * normals[:, None, :]  # (N, S, 2)
    vals = sample_bilinear(img, pos[..., 1], pos[..., 0])  # (y, x) order
    return vals, pos


@jax.jit
def find_correspondencies(bundle, pos):
    """Strongest intensity step along each search line -> target 2D point
    (findCorrespondencies uses the max filtered response; here the absolute
    central difference with parabolic subpixel refinement of the peak)."""
    grad = jnp.abs(bundle[:, 2:] - bundle[:, :-2])  # (N, S-2)
    # prefer the edge NEAREST the prediction: a mild taper with distance
    # from the line center breaks plateau ties inward (the reference's
    # search also scores proximity)
    S2 = grad.shape[1]
    center = (S2 - 1) / 2.0
    taper = 1.0 - 0.02 * jnp.abs(jnp.arange(S2) - center)
    idx = jnp.argmax(grad * taper[None], axis=1)
    strength = jnp.take_along_axis(grad, idx[:, None], 1)[:, 0]
    im = jnp.clip(idx - 1, 0, S2 - 1)
    ip = jnp.clip(idx + 1, 0, S2 - 1)
    g0 = jnp.take_along_axis(grad, im[:, None], 1)[:, 0]
    g1 = strength
    g2 = jnp.take_along_axis(grad, ip[:, None], 1)[:, 0]
    denom = g0 - 2 * g1 + g2
    delta = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (g0 - g2) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    # positions along the line: idx in grad space -> idx+1 in bundle space
    p_lo = jnp.take_along_axis(pos, (idx + 1)[:, None, None] - 1, axis=1)[:, 0]
    p_c = jnp.take_along_axis(pos, (idx + 1)[:, None, None], axis=1)[:, 0]
    step = p_c - p_lo
    tgt = p_c + delta[:, None] * step
    return tgt, strength


def _image_normals(K, R, t, pts3d, dirs3d, eps: float = 1e-3):
    """2D contour normals: perpendicular to the projected 3D edge tangent
    at each control point."""
    uv, _ = _project(K, R, t, pts3d)
    uv2, _ = _project(K, R, t, pts3d + 1e-2 * dirs3d)
    d = uv2 - uv
    n = jnp.stack([-d[:, 1], d[:, 0]], axis=1)
    return n / (jnp.linalg.norm(n, axis=1, keepdims=True) + eps), uv


def rapid_step(img, K, R, t, pts3d, dirs3d, search_len: float = 8.0, min_strength: float = 0.05):
    """One RAPID iteration (rapid(), rapid.cpp): project control points,
    search normals for edges, Gauss-Newton pose refinement on the found
    2D-3D correspondences. Returns (R, t, ratio_of_used_points)."""
    normals, uv = _image_normals(K, R, t, pts3d, dirs3d)
    bundle, pos = extract_line_bundle(img, uv, normals, search_len)
    tgt, strength = find_correspondencies(bundle, pos)
    mask = strength > min_strength
    # normalized camera coords for refine_pose
    Kinv = jnp.linalg.inv(K)
    xn = (jnp.concatenate([tgt, jnp.ones((tgt.shape[0], 1))], axis=1) @ Kinv.T)[:, :2]
    R2, t2, _ = resection.refine_pose(R, t, pts3d, xn, mask=mask, iters=5)
    return R2, t2, mask.mean()


def track(img, K, R, t, vertices, edges, n_iters: int = 4, n_per_edge: int = 8,
          search_len: float = 8.0):
    """Full RAPID track call (Tracker::compute): iterate rapid_step with a
    shrinking search range. Returns (R, t, used_ratio)."""
    pts3d, dirs3d = extract_control_points(
        jnp.asarray(vertices, jnp.float32), jnp.asarray(edges), n_per_edge)
    used = 0.0
    for i in range(n_iters):
        sl = search_len * (0.6**i)
        R, t, used = rapid_step(img, K, R, t, pts3d, dirs3d, search_len=sl)
    return R, t, used
