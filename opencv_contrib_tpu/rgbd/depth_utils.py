"""Depth utilities: registration to another camera, plane extraction,
depth cleaning.

Reference anchors:
- registerDepth: rgbd/src/depth_registration.cpp (reproject depth into the
  RGB camera with z-buffering)
- RgbdPlane: rgbd/src/plane.cpp (normal-clustering + region growing plane
  extraction)
- DepthCleaner: rgbd/src/depth_cleaner.cpp (NIL-method depth denoising)

TPU-first: registration's scatter race (many depth pixels landing on one
RGB pixel) is resolved with a min-scatter (`.at[].min`) z-buffer — one
fused op instead of the reference's locked writes. Plane extraction
replaces sequential region growing with RANSAC over normal-consistent
seeds, vmapped across hypotheses, followed by mask refinement.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import se3
from opencv_contrib_tpu.rgbd.frame import compute_normals, depth_to_points


@jax.jit
def register_depth(depth: jnp.ndarray, intr_d: jnp.ndarray, intr_rgb: jnp.ndarray,
                   T_rgb_from_d: jnp.ndarray, out_hw=None):
    """Reproject a depth map into the RGB camera's frame with a z-buffer
    (registerDepth, depth_registration.cpp). Returns (H, W) registered
    depth, 0 where empty."""
    H, W = depth.shape
    if out_hw is None:
        out_hw = (H, W)
    pts = depth_to_points(depth, intr_d)  # (H, W, 3) in depth-cam frame
    R, t = se3.mat_to_rt(T_rgb_from_d)
    pc = jnp.einsum("ij,hwj->hwi", R, pts) + t
    z = pc[..., 2]
    u = pc[..., 0] / jnp.maximum(z, 1e-9) * intr_rgb[0] + intr_rgb[2]
    v = pc[..., 1] / jnp.maximum(z, 1e-9) * intr_rgb[1] + intr_rgb[3]
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    oh, ow = out_hw
    valid = (depth > 0) & (z > 0) & (ui >= 0) & (ui < ow) & (vi >= 0) & (vi < oh)
    flat = jnp.where(valid, vi * ow + ui, oh * ow)
    zbuf = jnp.full(oh * ow + 1, jnp.inf).at[flat.reshape(-1)].min(
        jnp.where(valid, z, jnp.inf).reshape(-1))
    out = zbuf[: oh * ow].reshape(oh, ow)
    return jnp.where(jnp.isfinite(out), out, 0.0)


@partial(jax.jit, static_argnames=("n_hypotheses", "refine_iters"))
def extract_planes(depth: jnp.ndarray, intr: jnp.ndarray, key,
                   n_hypotheses: int = 64, dist_thresh: float = 0.02,
                   normal_thresh: float = 0.9, refine_iters: int = 2):
    """Dominant-plane extraction (RgbdPlane semantics, RANSAC formulation):
    sample point+normal hypotheses, vote inliers by point-plane distance AND
    normal agreement, refine the best plane by masked least squares.
    Returns (plane (4,) [n | d] with n.p + d = 0, inlier_mask (H, W))."""
    H, W = depth.shape
    pts = depth_to_points(depth, intr)
    valid = depth > 0
    normals, _ = compute_normals(pts, valid)

    flat_pts = pts.reshape(-1, 3)
    flat_n = normals.reshape(-1, 3)
    flat_v = valid.reshape(-1)
    idx = jax.random.randint(key, (n_hypotheses,), 0, H * W)

    def score(i):
        p0, n0 = flat_pts[i], flat_n[i]
        d = -jnp.dot(n0, p0)
        dist = jnp.abs(flat_pts @ n0 + d)
        agree = flat_n @ n0
        inl = flat_v & (dist < dist_thresh) & (agree > normal_thresh)
        return inl.sum(), jnp.concatenate([n0, d[None]])

    counts, planes = jax.vmap(score)(idx)
    best = jnp.argmax(counts)
    plane = planes[best]

    def refine(plane, _):
        n0, d = plane[:3], plane[3]
        dist = jnp.abs(flat_pts @ n0 + d)
        agree = flat_n @ n0
        m = (flat_v & (dist < dist_thresh) & (agree > normal_thresh)).astype(jnp.float32)
        # least-squares plane through inliers: centroid + smallest-eigvec
        wsum = jnp.maximum(m.sum(), 1.0)
        c = (flat_pts * m[:, None]).sum(0) / wsum
        X = (flat_pts - c) * m[:, None]
        C = X.T @ X / wsum
        _, V = jnp.linalg.eigh(C)
        n_new = V[:, 0]
        n_new = jnp.where(jnp.dot(n_new, n0) < 0, -n_new, n_new)
        return jnp.concatenate([n_new, -jnp.dot(n_new, c)[None]]), None

    plane, _ = jax.lax.scan(refine, plane, None, length=refine_iters)
    n0, d = plane[:3], plane[3]
    dist = jnp.abs(flat_pts @ n0 + d)
    mask = (flat_v & (dist < dist_thresh)).reshape(H, W)
    return plane, mask


@jax.jit
def clean_depth(depth: jnp.ndarray, intr: jnp.ndarray, window: int = 1):
    """DepthCleaner (NIL method): re-estimate each depth sample from the
    local tangent plane fitted to its neighborhood, suppressing quantization
    staircase noise."""
    H, W = depth.shape
    pts = depth_to_points(depth, intr)
    valid = (depth > 0).astype(jnp.float32)
    # local plane fit via box sums of the neighborhood (3x3)
    k = 2 * window + 1

    def boxsum(x):
        p = jnp.pad(x, ((window, window), (window, window)))
        c = jnp.cumsum(jnp.cumsum(p, 0), 1)
        c = jnp.pad(c, ((1, 0), (1, 0)))
        return c[k:, k:] - c[:-k, k:] - c[k:, :-k] + c[:-k, :-k]

    n = boxsum(valid)
    mean = jnp.stack([boxsum(pts[..., i] * valid) for i in range(3)], -1) / jnp.maximum(n, 1)[..., None]
    # project the ray through the local mean: d_clean = (mean . ray)/(ray . ray)
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    ray = jnp.stack([(u - intr[2]) / intr[0], (v - intr[3]) / intr[1], jnp.ones((H, W))], -1)
    d_clean = (mean * ray).sum(-1) / (ray * ray).sum(-1)
    return jnp.where(depth > 0, d_clean, 0.0)
