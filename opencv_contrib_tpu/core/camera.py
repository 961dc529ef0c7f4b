"""Camera models: pinhole + polynomial/division distortion, projections.

Capability parity with the reference's camera plumbing:
- libmv `PolynomialCameraIntrinsics` / `DivisionCameraIntrinsics`
  (reference: sfm/src/libmv/simple_pipeline/camera_intrinsics.{h,cc},
  distortion_models.cc) — here a single flat parameter vector so the whole
  camera is a differentiable leaf in BA.
- `projectionFromKRt` / `KRtFromProjection` (reference:
  sfm/include/opencv2/sfm/projection.hpp).
- BA packs intrinsics exactly like the reference's 8-float block
  (bundle.cc:461-678): [fx, fy, cx, cy, k1, k2, k3, p1, p2] (we carry 9;
  the reference folds fy into an aspect flag).

TPU-first: cameras are plain (..., 9) float arrays ("intr"), poses are
(..., 3, 3)+( ..., 3) or (..., 4, 4); everything vmaps over batches of
cameras and points with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import se3

# intrinsic vector layout
FX, FY, CX, CY, K1, K2, K3, P1, P2 = range(9)
N_INTR = 9


def make_intrinsics(fx, fy=None, cx=0.0, cy=0.0, k1=0.0, k2=0.0, k3=0.0, p1=0.0, p2=0.0, dtype=jnp.float32):
    if fy is None:
        fy = fx
    return jnp.array([fx, fy, cx, cy, k1, k2, k3, p1, p2], dtype=dtype)


def intrinsics_to_K(intr: jnp.ndarray) -> jnp.ndarray:
    """(..., 9) -> (..., 3, 3) calibration matrix."""
    fx, fy, cx, cy = intr[..., FX], intr[..., FY], intr[..., CX], intr[..., CY]
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    return jnp.stack(
        [
            jnp.stack([fx, zeros, cx], axis=-1),
            jnp.stack([zeros, fy, cy], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )


def K_to_intrinsics(K: jnp.ndarray) -> jnp.ndarray:
    zeros = jnp.zeros(K.shape[:-2] + (5,), dtype=K.dtype)
    return jnp.concatenate(
        [
            K[..., 0, 0, None],
            K[..., 1, 1, None],
            K[..., 0, 2, None],
            K[..., 1, 2, None],
            zeros,
        ],
        axis=-1,
    )


def distort(intr: jnp.ndarray, xn: jnp.ndarray) -> jnp.ndarray:
    """Apply polynomial distortion to normalized coords (..., 2).

    Same model as the reference's ApplyPolynomialDistortionModel
    (sfm/src/libmv/simple_pipeline/distortion_models.cc): radial k1..k3 +
    tangential p1, p2.
    """
    x, y = xn[..., 0], xn[..., 1]
    k1, k2, k3 = intr[..., K1], intr[..., K2], intr[..., K3]
    p1, p2 = intr[..., P1], intr[..., P2]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort(intr: jnp.ndarray, xd: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """Invert distortion by fixed-point iteration (static trip count)."""

    def body(_, xn):
        x, y = xn[..., 0], xn[..., 1]
        k1, k2, k3 = intr[..., K1], intr[..., K2], intr[..., K3]
        p1, p2 = intr[..., P1], intr[..., P2]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        xs = (xd[..., 0] - dx) / radial
        ys = (xd[..., 1] - dy) / radial
        return jnp.stack([xs, ys], axis=-1)

    return jax.lax.fori_loop(0, iters, body, xd)


def normalize_points(intr: jnp.ndarray, px: jnp.ndarray) -> jnp.ndarray:
    """Pixel coords (..., 2) -> undistorted normalized camera coords."""
    xn = (px - jnp.stack([intr[..., CX], intr[..., CY]], axis=-1)) / jnp.stack(
        [intr[..., FX], intr[..., FY]], axis=-1
    )
    return undistort(intr, xn)


def denormalize_points(intr: jnp.ndarray, xn: jnp.ndarray) -> jnp.ndarray:
    """Normalized camera coords -> distorted pixel coords."""
    xd = distort(intr, xn)
    return xd * jnp.stack([intr[..., FX], intr[..., FY]], axis=-1) + jnp.stack(
        [intr[..., CX], intr[..., CY]], axis=-1
    )


def project(intr: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray, X: jnp.ndarray):
    """Full projection: world point (..., 3) -> (pixel (..., 2), depth).

    Mirrors the reference BA residual's forward model
    (sfm/src/libmv/simple_pipeline/bundle.cc:90-160: x = RX + t, normalize,
    distort, to pixels).
    """
    Xc = se3.rotate_points(R, X) + t
    z = Xc[..., 2]
    zsafe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    xn = Xc[..., :2] / zsafe[..., None]
    return denormalize_points(intr, xn), z


def project_P(P: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Project with a raw 3x4 projection matrix (homogeneous, no distortion)."""
    Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)
    x = jnp.einsum("...ij,...j->...i", P, Xh)
    return x[..., :2] / jnp.where(jnp.abs(x[..., 2:]) < 1e-12, 1e-12, x[..., 2:])


def projection_from_KRt(K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """P = K [R | t]; parity with cv::sfm::projectionFromKRt."""
    Rt = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return K @ Rt


def KRt_from_projection(P: jnp.ndarray):
    """Decompose P = K [R|t] via RQ decomposition (parity with
    cv::sfm::KRtFromProjection). Single-matrix (3, 4) only; vmap for batches."""
    M = P[:3, :3]
    # RQ decomposition via QR of the flipped transpose.
    Pm = jnp.flip(jnp.eye(3, dtype=P.dtype), axis=0)
    Q_, R_ = jnp.linalg.qr((Pm @ M).T)
    K = Pm @ R_.T @ Pm
    R = Pm @ Q_.T
    # Fix signs so that K has positive diagonal.
    signs = jnp.sign(jnp.diagonal(K))
    signs = jnp.where(signs == 0, 1.0, signs)
    K = K * signs[None, :]
    R = R * signs[:, None]
    # det(R) must be +1
    detfix = jnp.sign(jnp.linalg.det(R))
    R = R * detfix
    t = jnp.linalg.solve(K, P[:3, 3] * detfix)
    K = K / K[2, 2]
    return K, R, t


def look_at(eye: jnp.ndarray, target: jnp.ndarray, up=None):
    """Camera pose looking from `eye` to `target`. Returns world->cam (R, t)
    with +z forward. Used by synthetic-scene test fixtures (parity with the
    reference's sfm/test/scene.cpp generator)."""
    if up is None:
        up = jnp.array([0.0, 1.0, 0.0], dtype=eye.dtype)
    fwd = target - eye
    fwd = fwd / (jnp.linalg.norm(fwd) + 1e-12)
    right = jnp.cross(fwd, up)
    right = right / (jnp.linalg.norm(right) + 1e-12)
    down = jnp.cross(fwd, right)
    R = jnp.stack([right, down, fwd], axis=0)  # world->cam rows
    t = -R @ eye
    return R, t
