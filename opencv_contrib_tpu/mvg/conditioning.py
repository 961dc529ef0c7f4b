"""Point conditioning (isotropic normalization) for DLT-type solvers.

Parity: cv::sfm::preconditionerFromPoints / applyTransformationToPoints
(sfm/include/opencv2/sfm/conditioning.hpp; libmv/multiview/conditioning.cc).
Supports masked point sets (padded static shapes).
"""

from __future__ import annotations

import jax.numpy as jnp


def preconditioner_from_points(pts: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Isotropic scaling transform T (3, 3) so that T*x has zero mean and
    mean distance sqrt(2) from origin. pts (N, 2), optional mask (N,)."""
    if mask is None:
        mask = jnp.ones(pts.shape[:-1], bool)
    w = mask.astype(pts.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(pts * w[..., None], axis=0) / n
    d = jnp.sqrt(jnp.sum((pts - mean) ** 2, axis=-1)) * w
    meandist = jnp.sum(d) / n
    scale = jnp.sqrt(2.0) / jnp.maximum(meandist, 1e-12)
    T = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], dtype=pts.dtype
    )
    T = T.at[0, 0].set(scale).at[1, 1].set(scale)
    T = T.at[0, 2].set(-scale * mean[0]).at[1, 2].set(-scale * mean[1])
    return T


def apply_transform(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply homogeneous 3x3 transform to (N, 2) inhomogeneous points."""
    x = pts[..., 0] * T[0, 0] + pts[..., 1] * T[0, 1] + T[0, 2]
    y = pts[..., 0] * T[1, 0] + pts[..., 1] * T[1, 1] + T[1, 2]
    w = pts[..., 0] * T[2, 0] + pts[..., 1] * T[2, 1] + T[2, 2]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return jnp.stack([x / w, y / w], axis=-1)
