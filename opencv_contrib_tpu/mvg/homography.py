"""Homography estimation (4-point DLT) + error metrics.

Parity: libmv/multiview/homography.cc (HomographyFromCorrespondences,
used by GRIC keyframe selection in sfm/src/libmv/simple_pipeline/
keyframe_selection.cc:255) and homography error models.
"""

from __future__ import annotations

import jax.numpy as jnp

from opencv_contrib_tpu.mvg import conditioning


def dlt(x1: jnp.ndarray, x2: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Normalized DLT homography from (N >= 4, 2) correspondences x2 ~ H x1."""
    if mask is None:
        mask = jnp.ones(x1.shape[:-1], bool)
    T1 = conditioning.preconditioner_from_points(x1, mask)
    T2 = conditioning.preconditioner_from_points(x2, mask)
    a = conditioning.apply_transform(T1, x1)
    b = conditioning.apply_transform(T2, x2)
    u1, v1 = a[..., 0], a[..., 1]
    u2, v2 = b[..., 0], b[..., 1]
    zero = jnp.zeros_like(u1)
    one = jnp.ones_like(u1)
    r1 = jnp.stack([u1, v1, one, zero, zero, zero, -u2 * u1, -u2 * v1, -u2], axis=-1)
    r2 = jnp.stack([zero, zero, zero, u1, v1, one, -v2 * u1, -v2 * v1, -v2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0) * jnp.concatenate([mask, mask])[:, None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    H = Vt[-1].reshape(3, 3)
    H = jnp.linalg.inv(T2) @ H @ T1
    return H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1.0, H[2, 2])


def transfer_error(H: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Squared symmetric-free forward transfer error |H x1 - x2|^2."""
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)
    y = jnp.einsum("ij,...j->...i", H, x1h)
    y = y[..., :2] / jnp.where(jnp.abs(y[..., 2:]) < 1e-12, 1e-12, y[..., 2:])
    return jnp.sum((y - x2) ** 2, axis=-1)
