"""N-view triangulation.

Parity: cv::sfm::triangulatePoints (sfm/include/opencv2/sfm/triangulation.hpp:57,
libmv NViewTriangulateAlgebraic) — DLT triangulation from >= 2 views.

TPU-first: fixed maximum view count with a per-view weight/validity mask; the
whole (n_points x n_views) problem is one batched eigh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def triangulate_dlt(pts2d: jnp.ndarray, Ps: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Triangulate one 3D point from V views.

    pts2d (V, 2), Ps (V, 3, 4), mask (V,) valid-view flags.
    Returns X (3,). Invalid views contribute zero rows.
    """
    if mask is None:
        mask = jnp.ones(pts2d.shape[0], bool)
    u = pts2d[:, 0][:, None]
    v = pts2d[:, 1][:, None]
    rows = jnp.concatenate(
        [u * Ps[:, 2] - Ps[:, 0], v * Ps[:, 2] - Ps[:, 1]], axis=0
    )  # (2V, 4)
    m2 = jnp.concatenate([mask, mask]).astype(rows.dtype)[:, None]
    # row normalization equilibrates the system (f32 accuracy in
    # badly-scaled projective frames); direct SVD avoids squaring A
    norm = jnp.linalg.norm(rows, axis=-1, keepdims=True)
    rows = rows / jnp.maximum(norm, 1e-12) * m2
    _, _, Vt = jnp.linalg.svd(rows, full_matrices=True)
    X = Vt[-1]
    return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])


def triangulate_points(pts2d: jnp.ndarray, Ps: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Batched DLT: pts2d (N, V, 2), Ps (V, 3, 4) or (N, V, 3, 4),
    mask (N, V) -> X (N, 3)."""
    N, V = pts2d.shape[0], pts2d.shape[1]
    if Ps.ndim == 3:
        Ps = jnp.broadcast_to(Ps[None], (N, V, 3, 4))
    if mask is None:
        mask = jnp.ones((N, V), bool)
    return jax.vmap(triangulate_dlt)(pts2d, Ps, mask)


def refine_points(pts2d: jnp.ndarray, Ps: jnp.ndarray, X0: jnp.ndarray, mask: jnp.ndarray | None = None, iters: int = 5) -> jnp.ndarray:
    """Per-point Gauss-Newton refinement of triangulated points, minimizing
    reprojection error over all valid views.

    Parity: libmv EuclideanIntersect's DLT + per-point Ceres refine
    (sfm/src/libmv/simple_pipeline/intersect.cc:69-149). Also recovers the
    precision DLT loses in f32 for badly-conditioned projective frames.

    pts2d (N, V, 2), Ps (V, 3, 4) or (N, V, 3, 4), X0 (N, 3) -> (N, 3).
    """
    N, V = pts2d.shape[0], pts2d.shape[1]
    if Ps.ndim == 3:
        Ps = jnp.broadcast_to(Ps[None], (N, V, 3, 4))
    if mask is None:
        mask = jnp.ones((N, V), bool)

    def residual(X, P_v, x_v, m_v):
        Xh = jnp.concatenate([X, jnp.ones(1, X.dtype)])
        y = P_v @ Xh
        w = jnp.where(jnp.abs(y[2]) < 1e-12, 1e-12, y[2])
        return (y[:2] / w - x_v) * m_v

    def refine_one(x_views, P_views, m_views, X):
        def res_flat(Xp):
            r = jax.vmap(residual, in_axes=(None, 0, 0, 0))(Xp, P_views, x_views, m_views.astype(Xp.dtype))
            return r.reshape(-1)

        def body(_, Xc):
            r = res_flat(Xc)
            J = jax.jacfwd(res_flat)(Xc)  # (2V, 3)
            H = J.T @ J + 1e-8 * jnp.eye(3, dtype=Xc.dtype)
            return Xc - jnp.linalg.solve(H, J.T @ r)

        return jax.lax.fori_loop(0, iters, body, X)

    return jax.vmap(refine_one)(pts2d, Ps, mask, X0)


def triangulate_points_refined(pts2d, Ps, mask=None, iters: int = 5):
    """DLT + Gauss-Newton polish — the default high-accuracy entry point."""
    X0 = triangulate_points(pts2d, Ps, mask)
    return refine_points(pts2d, Ps, X0, mask, iters)


def triangulate_midpoint_two_view(x1n: jnp.ndarray, x2n: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Fast closed-form two-view midpoint triangulation in calibrated coords.

    Camera 1 at identity; camera 2 at (R, t) world->cam. x1n/x2n (N, 2).
    """
    # rays in world frame
    d1 = jnp.concatenate([x1n, jnp.ones_like(x1n[..., :1])], axis=-1)
    d2 = jnp.einsum("ji,nj->ni", R, jnp.concatenate([x2n, jnp.ones_like(x2n[..., :1])], axis=-1))
    o2 = -jnp.einsum("ji,j->i", R, t)

    # minimize |s d1 - (o2 + u d2)|^2 over (s, u):
    #   [[d1.d1, -d1.d2], [-d1.d2, d2.d2]] [s; u] = [d1.o2; -d2.o2]
    a = jnp.sum(d1 * d1, axis=-1)
    b = -jnp.sum(d1 * d2, axis=-1)
    c = jnp.sum(d2 * d2, axis=-1)
    e1 = jnp.sum(d1 * o2[None], axis=-1)
    e2 = -jnp.sum(d2 * o2[None], axis=-1)
    det = a * c - b * b
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    s = (c * e1 - b * e2) / det
    u = (a * e2 - b * e1) / det
    p1 = d1 * s[..., None]
    p2 = o2[None] + d2 * u[..., None]
    return 0.5 * (p1 + p2)
