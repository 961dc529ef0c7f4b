"""Two-view geometry: fundamental/essential matrices and motion recovery.

Capability parity with cv::sfm's fundamental API
(sfm/include/opencv2/sfm/fundamental.hpp:57-212 — normalizedEightPointSolver,
fundamentalFromEssential, essentialFromFundamental, motionFromEssential,
relativeCameraMotion, projectionsFromFundamental) and the 7-point solver
(libmv/multiview/fundamental_kernel.cc).

TPU-first: solvers accept padded masked point sets and batch under vmap —
RANSAC evaluates hundreds of minimal-sample hypotheses as one batched
eigen/SVD solve instead of a sequential loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import se3
from opencv_contrib_tpu.mvg import conditioning


def _epipolar_constraint_rows(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Rows of the linear system x2' F x1 = 0. x1, x2 (N, 2) -> A (N, 9)."""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    one = jnp.ones_like(u1)
    return jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one], axis=-1
    )


def _smallest_singular_vector(A: jnp.ndarray) -> jnp.ndarray:
    """Null-space direction of A (N, D): smallest right singular vector.

    Direct SVD (not eigh of A^T A) — squaring would double the condition
    number, which matters in f32 for pixel-scale DLT systems.
    """
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    return Vt[-1]


def eight_point(x1: jnp.ndarray, x2: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Normalized 8-point fundamental solver on (N, 2) correspondences.

    Parity: cv::sfm::normalizedEightPointSolver (fundamental.hpp:57;
    libmv EightPointSolver). Accepts a validity mask for padded inputs.
    """
    if mask is None:
        mask = jnp.ones(x1.shape[:-1], bool)
    T1 = conditioning.preconditioner_from_points(x1, mask)
    T2 = conditioning.preconditioner_from_points(x2, mask)
    x1n = conditioning.apply_transform(T1, x1)
    x2n = conditioning.apply_transform(T2, x2)
    A = _epipolar_constraint_rows(x1n, x2n) * mask[..., None]
    f = _smallest_singular_vector(A)
    F = f.reshape(3, 3)
    # enforce rank 2
    U, S, Vt = jnp.linalg.svd(F)
    F = (U * S.at[2].set(0.0)[None, :]) @ Vt
    # denormalize
    F = T2.T @ F @ T1
    return F / jnp.where(jnp.abs(F[2, 2]) < 1e-12, 1.0, F[2, 2])


def seven_point(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """7-point solver: returns up to 3 fundamental candidates (3, 3, 3) with
    a validity flag per root (imag roots produce repeated real solutions).

    Parity: libmv SevenPointSolver (fundamental_kernel.cc). The cubic is
    solved in closed form (Cardano) so the whole solver vmaps.
    """
    T1 = conditioning.preconditioner_from_points(x1)
    T2 = conditioning.preconditioner_from_points(x2)
    x1n = conditioning.apply_transform(T1, x1)
    x2n = conditioning.apply_transform(T2, x2)
    A = _epipolar_constraint_rows(x1n, x2n)  # (7, 9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    F1 = Vt[-1].reshape(3, 3)
    F2 = Vt[-2].reshape(3, 3)

    # det(a F1 + (1-a) F2) = 0 — cubic in a.
    def d(a):
        return jnp.linalg.det(a * F1 + (1 - a) * F2)

    # polynomial coefficients by evaluation at 4 points (degree 3)
    d0, d1, dm1, d2 = d(0.0), d(1.0), d(-1.0), d(2.0)
    c0 = d0
    c2 = (d1 + dm1) / 2.0 - c0
    c3 = (d2 - 2.0 * d1 + d0 - 2.0 * c2) / 6.0
    c1 = d1 - c0 - c2 - c3
    roots, valid = _cubic_roots(c3, c2, c1, c0)

    def build(a):
        F = a * F1 + (1 - a) * F2
        F = T2.T @ F @ T1
        return F / jnp.where(jnp.abs(F[2, 2]) < 1e-12, 1.0, F[2, 2])

    Fs = jax.vmap(build)(roots)
    return Fs, valid


def _cubic_roots(a, b, c, d):
    """Real roots of a x^3 + b x^2 + c x + d. Returns (roots (3,), valid (3,)).

    Falls back to the quadratic/linear cases when leading coeffs vanish.
    Branch-free: computes all cases and selects.
    """
    eps = 1e-12
    is_cubic = jnp.abs(a) > eps

    # --- cubic case (trig method) ---
    an = jnp.where(is_cubic, a, 1.0)
    p = (3.0 * an * c - b * b) / (3.0 * an * an)
    q = (2.0 * b**3 - 9.0 * an * b * c + 27.0 * an * an * d) / (27.0 * an**3)
    shift = -b / (3.0 * an)
    disc = (q * q) / 4.0 + (p**3) / 27.0
    # three real roots when disc <= 0
    safe_p = jnp.minimum(p, -eps)
    m = 2.0 * jnp.sqrt(-safe_p / 3.0)
    acos_arg = jnp.clip(3.0 * q / (safe_p * m), -1.0, 1.0)
    theta = jnp.arccos(acos_arg) / 3.0
    k = jnp.arange(3.0)
    roots3 = m * jnp.cos(theta - 2.0 * jnp.pi * k / 3.0) + shift
    # one real root when disc > 0 (Cardano)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    u = jnp.cbrt(-q / 2.0 + sq)
    v = jnp.cbrt(-q / 2.0 - sq)
    root1 = u + v + shift
    cubic_roots = jnp.where(disc <= 0, roots3, jnp.array([1.0, 0.0, 0.0]) * root1 + jnp.array([0.0, 1.0, 1.0]) * root1)
    cubic_valid = jnp.where(disc <= 0, jnp.array([True, True, True]), jnp.array([True, False, False]))

    # --- quadratic fallback ---
    is_quad = (~is_cubic) & (jnp.abs(b) > eps)
    bq = jnp.where(jnp.abs(b) > eps, b, 1.0)
    qdisc = c * c - 4.0 * bq * d
    sqq = jnp.sqrt(jnp.maximum(qdisc, 0.0))
    q1 = (-c + sqq) / (2.0 * bq)
    q2 = (-c - sqq) / (2.0 * bq)
    quad_roots = jnp.stack([q1, q2, jnp.zeros_like(q1)])
    quad_valid = jnp.array([True, True, False]) & (qdisc >= 0)

    # --- linear fallback ---
    lin_root = -d / jnp.where(jnp.abs(c) > eps, c, 1.0)
    lin_roots = jnp.stack([lin_root, jnp.zeros_like(lin_root), jnp.zeros_like(lin_root)])
    lin_valid = jnp.array([True, False, False]) & (jnp.abs(c) > eps)

    roots = jnp.where(is_cubic, cubic_roots, jnp.where(is_quad, quad_roots, lin_roots))
    valid = jnp.where(is_cubic, cubic_valid, jnp.where(is_quad, quad_valid, lin_valid))
    return roots, valid


def sampson_distance(F: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) distance of correspondences to F.

    The error the reference's robust estimator scores with
    (libmv/multiview/fundamental.cc SampsonDistance).
    """
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)
    x2h = jnp.concatenate([x2, jnp.ones_like(x2[..., :1])], axis=-1)
    Fx1 = jnp.einsum("ij,...j->...i", F, x1h)
    Ftx2 = jnp.einsum("ji,...j->...i", F, x2h)
    num = jnp.einsum("...i,...i->...", x2h, Fx1) ** 2
    den = Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2 + Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def epipolar_distance(F: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Symmetric point-to-epipolar-line distance (squared px)."""
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)
    x2h = jnp.concatenate([x2, jnp.ones_like(x2[..., :1])], axis=-1)
    Fx1 = jnp.einsum("ij,...j->...i", F, x1h)
    Ftx2 = jnp.einsum("ji,...j->...i", F, x2h)
    s = jnp.einsum("...i,...i->...", x2h, Fx1) ** 2
    d1 = s / jnp.maximum(Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2, 1e-12)
    d2 = s / jnp.maximum(Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2, 1e-12)
    return 0.5 * (d1 + d2)


def essential_from_fundamental(F: jnp.ndarray, K1: jnp.ndarray, K2: jnp.ndarray) -> jnp.ndarray:
    """E = K2' F K1 (parity: cv::sfm::essentialFromFundamental)."""
    return K2.T @ F @ K1


def fundamental_from_essential(E: jnp.ndarray, K1: jnp.ndarray, K2: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.inv(K2).T @ E @ jnp.linalg.inv(K1)


def essential_from_Rt(R1, t1, R2, t2) -> jnp.ndarray:
    """E from two absolute poses (parity: cv::sfm::essentialFromRt)."""
    R, t = relative_camera_motion(R1, t1, R2, t2)
    return se3.hat(t) @ R


def relative_camera_motion(R1, t1, R2, t2):
    """(R, t) of camera 2 relative to camera 1
    (parity: cv::sfm::relativeCameraMotion, fundamental.hpp)."""
    R = R2 @ R1.T
    t = t2 - R @ t1
    return R, t


def project_to_essential(E: jnp.ndarray) -> jnp.ndarray:
    """Nearest valid essential matrix: singular values (s, s, 0)."""
    U, S, Vt = jnp.linalg.svd(E)
    s = (S[0] + S[1]) * 0.5
    return (U * jnp.array([1.0, 1.0, 0.0])[None, :] * s) @ Vt


def motions_from_essential(E: jnp.ndarray):
    """All four (R, t) decompositions of E
    (parity: cv::sfm::motionFromEssential; libmv MotionFromEssential).
    Returns Rs (4, 3, 3), ts (4, 3)."""
    U, _, Vt = jnp.linalg.svd(E)
    # force proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    Ra = U @ W @ Vt
    Rb = U @ W.T @ Vt
    t = U[:, 2]
    Rs = jnp.stack([Ra, Ra, Rb, Rb])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def choose_motion_cheirality(Rs, ts, x1n, x2n, mask=None):
    """Select the (R, t) with the most points in front of both cameras.

    x1n/x2n are normalized (calibrated) image points (N, 2). Vectorized
    two-view midpoint triangulation over all 4 candidates at once
    (parity with libmv MotionFromEssentialChooseSolution).
    Returns (R, t, best_index).
    """
    if mask is None:
        mask = jnp.ones(x1n.shape[:-1], bool)

    def count_front(R, t):
        z1, z2 = _two_view_depths(R, t, x1n, x2n)
        ok = (z1 > 0) & (z2 > 0) & mask
        return jnp.sum(ok)

    counts = jax.vmap(count_front)(Rs, ts)
    best = jnp.argmax(counts)
    return Rs[best], ts[best], best


def _two_view_depths(R, t, x1n, x2n):
    """Depths of linear-triangulated points in both views. Camera 1 at
    identity, camera 2 at (R, t). DLT per point, vmapped."""
    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P2 = jnp.concatenate([R, t[:, None]], axis=1)

    def tri(a, b):
        A = jnp.stack(
            [
                a[0] * P1[2] - P1[0],
                a[1] * P1[2] - P1[1],
                b[0] * P2[2] - P2[0],
                b[1] * P2[2] - P2[1],
            ]
        )
        _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
        X = Vt[-1]
        X = X / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])
        return X[:3]

    X = jax.vmap(tri)(x1n, x2n)
    z1 = X[..., 2]
    z2 = (jnp.einsum("ij,nj->ni", R, X) + t)[..., 2]
    return z1, z2


def projections_from_fundamental(F: jnp.ndarray):
    """Canonical projective cameras (P1, P2) from F
    (parity: cv::sfm::projectionsFromFundamental)."""
    P1 = jnp.concatenate([jnp.eye(3, dtype=F.dtype), jnp.zeros((3, 1), F.dtype)], axis=1)
    # epipole e2: left null vector of F (smallest left singular vector)
    U, _, _ = jnp.linalg.svd(F)
    e2 = U[:, 2]
    P2 = jnp.concatenate([se3.hat(e2) @ F, e2[:, None]], axis=1)
    return P1, P2
