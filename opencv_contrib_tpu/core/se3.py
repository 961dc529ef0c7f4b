"""SO(3)/SE(3) Lie-group operations, fully vectorizable.

Capability parity with the reference's rotation/pose plumbing:
`cv::Rodrigues`, libmv's angle-axis camera parameterization
(reference: sfm/src/libmv/simple_pipeline/bundle.cc:90-160 packs cameras as
angle-axis R | t 6-vectors) and rgbd's quaternion Pose3d
(reference: rgbd/src/pose_graph.cpp:108-201).

TPU-first design: every function is a pure jnp function on stacked arrays so
it vmaps/jits cleanly; no data-dependent branching (singularities handled by
`jnp.where` with safe denominators).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: (..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: angle-axis (..., 3) -> rotation matrix (..., 3, 3).

    Singularity-free via Taylor fallback at theta -> 0.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # sin(t)/t and (1-cos(t))/t^2 with small-angle Taylor expansions.
    # theta2_safe keeps the UNTAKEN branch finite so reverse-mode autodiff
    # through the where() stays NaN-free at theta = 0.
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * (W @ W)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Matrix log: rotation (..., 3, 3) -> angle-axis (..., 3).

    Uses the quaternion route, which is stable near both 0 and pi.
    """
    return quat_to_axis_angle(mat_to_quat(R))


def exp_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) exp: twist (..., 6) [rot | trans] -> (..., 4, 4) rigid transform."""
    w, v = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)  # NaN-free autodiff at 0
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / theta2_safe)
    W = hat(w)
    WW = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = I + A[..., None, None] * W + B[..., None, None] * WW
    V = I + B[..., None, None] * W + C[..., None, None] * WW
    t = jnp.einsum("...ij,...j->...i", V, v)
    return rt_to_mat(R, t)


def log_se3(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) log: (..., 4, 4) -> twist (..., 6) [rot | trans]."""
    R, t = mat_to_rt(T)
    w = log_so3(R)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)  # NaN-free autodiff at 0
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    W = hat(w)
    WW = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    # V^{-1} = I - W/2 + (1/theta^2)(1 - A/(2B)) W^2
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - A / (2.0 * jnp.where(small, 0.5, B))) / theta2_safe,
    )
    Vinv = I - 0.5 * W + coef[..., None, None] * WW
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([w, v], axis=-1)


def rt_to_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(R (...,3,3), t (...,3)) -> homogeneous (..., 4, 4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def mat_to_rt(T: jnp.ndarray):
    return T[..., :3, :3], T[..., :3, 3]


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Rigid-transform inverse (..., 4, 4)."""
    R, t = mat_to_rt(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_mat(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to points (..., N, 3) or (..., 3)."""
    R, t = mat_to_rt(T)
    if pts.ndim == R.ndim - 1:  # (..., 3) single point per transform
        return jnp.einsum("...ij,...j->...i", R, pts) + t
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def rotate_points(R: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    if pts.ndim == R.ndim - 1:
        return jnp.einsum("...ij,...j->...i", R, pts)
    return jnp.einsum("...ij,...nj->...ni", R, pts)


# ----------------------------------------------------------------------------
# Quaternions (w, x, y, z) — used by the pose graph, mirroring the
# reference's Pose3d quaternion storage (rgbd/src/pose_graph.cpp:110-145).
# ----------------------------------------------------------------------------


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack(
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                axis=-1,
            ),
        ],
        axis=-2,
    )


def mat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (w, x, y, z), branch-free (Shepperd).

    Computes all four candidate quaternions and selects the best-conditioned
    one with `where`, so it vmaps with no data-dependent control flow.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidates, each scaled by 4*q_i^2 (>= 0).
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)

    # candidate built around w
    cw = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cx = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1)
    cy = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1)
    cz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1)

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cand = jnp.stack([cw, cx, cy, cz], axis=-2)  # (..., 4cand, 4comp)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)[
        ..., 0, :
    ]
    q = quat_normalize(q)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)


def quat_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    q = quat_normalize(q)
    q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    s = jnp.linalg.norm(xyz, axis=-1)
    theta = 2.0 * jnp.arctan2(s, w)
    scale = jnp.where(s < _EPS, 2.0, theta / jnp.maximum(s, _EPS))
    return xyz * scale[..., None]


def axis_angle_to_quat(w: jnp.ndarray) -> jnp.ndarray:
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    half = 0.5 * theta
    k = jnp.where(theta < _EPS, 0.5, jnp.sin(half) / jnp.maximum(theta, _EPS))
    return jnp.concatenate([jnp.cos(half), w * k], axis=-1)


def project_to_so3(M: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation matrix via SVD (handles reflections)."""
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]],
        axis=-1,
    )
    return (U * D[..., None, :]) @ Vt


def rotation_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Geodesic rotation angle of (..., 3, 3) in radians."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    return jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0))


def rotation_distance(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    return rotation_angle(jnp.swapaxes(R1, -1, -2) @ R2)
