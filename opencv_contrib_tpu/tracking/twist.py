"""Visual-servoing twist estimation (tracking/include/opencv2/tracking/
twist.hpp): recover the 6-DoF camera velocity (twist) from tracked image
point velocities and depths via the point-feature interaction matrix.

For a normalized image point (x, y) at depth Z the interaction matrix rows
are the classic IBVS Jacobian; stacking all points gives duv = L @ xi with
xi = (vx, vy, vz, wx, wy, wz). The reference solves the stacked system with
a pseudo-inverse; here it is one batched build + lstsq on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["interaction_matrix", "compute_twist"]


def interaction_matrix(uv: jnp.ndarray, depths: jnp.ndarray, K: jnp.ndarray):
    """uv (N, 2) pixel coords, depths (N,), K (3, 3) intrinsics ->
    L (2N, 6) interaction matrix in NORMALIZED image coordinates."""
    uv = jnp.asarray(uv, jnp.float32)
    Z = jnp.asarray(depths, jnp.float32)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    x = (uv[:, 0] - cx) / fx
    y = (uv[:, 1] - cy) / fy
    iZ = 1.0 / jnp.maximum(Z, 1e-9)
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    Lx = jnp.stack([-iZ, zeros, x * iZ, x * y, -(ones + x * x), y], axis=1)
    Ly = jnp.stack([zeros, -iZ, y * iZ, ones + y * y, -x * y, -x], axis=1)
    return jnp.stack([Lx, Ly], axis=1).reshape(-1, 6)  # (2N, 6)


@jax.jit
def compute_twist(uv: jnp.ndarray, duv: jnp.ndarray, depths: jnp.ndarray,
                  K: jnp.ndarray):
    """computeTwist contract: pixel velocities duv (N, 2) -> camera twist
    (6,) = (v, omega). Velocities are normalized by focal length to match
    the interaction matrix's normalized coordinates."""
    L = interaction_matrix(uv, depths, K)
    fx, fy = K[0, 0], K[1, 1]
    dn = jnp.stack([duv[:, 0] / fx, duv[:, 1] / fy], axis=1).reshape(-1)
    # normal equations (6x6) — well-posed for N >= 3 non-degenerate points.
    # HIGHEST precision: the system is tiny and the TPU bf16 matmul default
    # costs ~1e-2 relative error on the normal equations
    hp = jax.lax.Precision.HIGHEST
    A = jnp.matmul(L.T, L, precision=hp) + 1e-9 * jnp.eye(6)
    return jnp.linalg.solve(A, jnp.matmul(L.T, dn, precision=hp))
