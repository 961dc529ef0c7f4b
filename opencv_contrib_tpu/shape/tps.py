"""Thin-plate-spline transformer (tps_trans.cpp parity): fit a TPS warp
from control-point correspondences, apply to points/images."""

from __future__ import annotations

import jax.numpy as jnp

from opencv_contrib_tpu.ops.image import sample_bilinear, grid_coords


def _U(r2):
    return jnp.where(r2 > 1e-12, r2 * 0.5 * jnp.log(jnp.maximum(r2, 1e-12)), 0.0)


def tps_fit(src: jnp.ndarray, dst: jnp.ndarray, reg: float = 1e-6):
    """Fit TPS mapping src -> dst, both (N, 2). Returns params (w (N, 2),
    a (3, 2)) for f(x) = a0 + a1 x + a2 y + sum_i w_i U(|x - src_i|)."""
    N = src.shape[0]
    d2 = jnp.sum((src[:, None] - src[None]) ** 2, axis=-1)
    K = _U(d2) + reg * jnp.eye(N)
    P = jnp.concatenate([jnp.ones((N, 1)), src], axis=1)  # (N, 3)
    A = jnp.zeros((N + 3, N + 3))
    A = A.at[:N, :N].set(K).at[:N, N:].set(P).at[N:, :N].set(P.T)
    rhs = jnp.concatenate([dst, jnp.zeros((3, 2))], axis=0)
    sol = jnp.linalg.solve(A + 1e-9 * jnp.eye(N + 3), rhs)
    return sol[:N], sol[N:]


def tps_apply(params, src_ctrl: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply fitted TPS to points (M, 2)."""
    w, a = params
    d2 = jnp.sum((pts[:, None] - src_ctrl[None]) ** 2, axis=-1)  # (M, N)
    return a[0][None] + pts @ a[1:] + _U(d2) @ w
