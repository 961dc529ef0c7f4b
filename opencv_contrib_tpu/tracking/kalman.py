"""Kalman filters: linear KF + unscented KF (UKF).

Parity: tracking's kalman_filters.hpp / unscented_kalman.cpp /
augmented_unscented_kalman.cpp — here the standard Merwe-scaled UKF with
vmapped sigma-point propagation.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class KalmanState(NamedTuple):
    x: jnp.ndarray  # (n,)
    P: jnp.ndarray  # (n, n)


def kf_predict(state: KalmanState, F: jnp.ndarray, Q: jnp.ndarray, B=None, u=None) -> KalmanState:
    x = F @ state.x
    if B is not None and u is not None:
        x = x + B @ u
    P = F @ state.P @ F.T + Q
    return KalmanState(x, P)


def kf_correct(state: KalmanState, z: jnp.ndarray, Hm: jnp.ndarray, R: jnp.ndarray) -> KalmanState:
    S = Hm @ state.P @ Hm.T + R
    K = state.P @ Hm.T @ jnp.linalg.inv(S)
    x = state.x + K @ (z - Hm @ state.x)
    P = (jnp.eye(state.x.shape[0]) - K @ Hm) @ state.P
    return KalmanState(x, P)


def _sigma_points(x, P, alpha=1e-3, beta=2.0, kappa=0.0):
    n = x.shape[0]
    lam = alpha * alpha * (n + kappa) - n
    S = jnp.linalg.cholesky((n + lam) * (P + 1e-9 * jnp.eye(n)))
    pts = jnp.concatenate([x[None], x[None] + S.T, x[None] - S.T], axis=0)  # (2n+1, n)
    wm = jnp.full(2 * n + 1, 1.0 / (2 * (n + lam)))
    wm = wm.at[0].set(lam / (n + lam))
    wc = wm.at[0].add(1.0 - alpha * alpha + beta)
    return pts, wm, wc


def ukf_predict(state: KalmanState, f: Callable, Q: jnp.ndarray) -> KalmanState:
    pts, wm, wc = _sigma_points(state.x, state.P)
    prop = jax.vmap(f)(pts)
    x = jnp.einsum("i,ij->j", wm, prop)
    d = prop - x[None]
    P = jnp.einsum("i,ij,ik->jk", wc, d, d) + Q
    return KalmanState(x, P)


def ukf_correct(state: KalmanState, z: jnp.ndarray, h: Callable, R: jnp.ndarray) -> KalmanState:
    pts, wm, wc = _sigma_points(state.x, state.P)
    Z = jax.vmap(h)(pts)
    z_pred = jnp.einsum("i,ij->j", wm, Z)
    dz = Z - z_pred[None]
    dx = pts - state.x[None]
    S = jnp.einsum("i,ij,ik->jk", wc, dz, dz) + R
    C = jnp.einsum("i,ij,ik->jk", wc, dx, dz)
    K = C @ jnp.linalg.inv(S)
    x = state.x + K @ (z - z_pred)
    P = state.P - K @ S @ K.T
    return KalmanState(x, P)


# --- Augmented UKF (augmented_unscented_kalman.cpp): non-additive noise ---
# The state is augmented with process/measurement noise components so sigma
# points carry noise realizations through f(x, q) / h(x, r) directly.


def aukf_predict(state: KalmanState, f: Callable, Q: jnp.ndarray) -> KalmanState:
    """f(x, q) -> x'. Sigma points drawn over the (x, q) augmented state."""
    n = state.x.shape[0]
    q = Q.shape[0]
    xa = jnp.concatenate([state.x, jnp.zeros(q)])
    Pa = jax.scipy.linalg.block_diag(state.P, Q)
    # alpha=1 (Julier set): the Merwe alpha=1e-3 default puts ~1/alpha^2
    # magnitude on the center weights, which cancels catastrophically in
    # float32 on the enlarged augmented state
    pts, wm, wc = _sigma_points(xa, Pa, alpha=1.0)
    prop = jax.vmap(lambda p: f(p[:n], p[n:]))(pts)
    x = jnp.einsum("i,ij->j", wm, prop)
    d = prop - x[None]
    P = jnp.einsum("i,ij,ik->jk", wc, d, d)
    return KalmanState(x, P)


def aukf_correct(state: KalmanState, z: jnp.ndarray, h: Callable, R: jnp.ndarray) -> KalmanState:
    """h(x, r) -> z_pred. Sigma points over the (x, r) augmented state."""
    n = state.x.shape[0]
    r = R.shape[0]
    xa = jnp.concatenate([state.x, jnp.zeros(r)])
    Pa = jax.scipy.linalg.block_diag(state.P, R)
    pts, wm, wc = _sigma_points(xa, Pa, alpha=1.0)
    Z = jax.vmap(lambda p: h(p[:n], p[n:]))(pts)
    z_pred = jnp.einsum("i,ij->j", wm, Z)
    dz = Z - z_pred[None]
    dx = pts[:, :n] - state.x[None]
    S = jnp.einsum("i,ij,ik->jk", wc, dz, dz)
    C = jnp.einsum("i,ij,ik->jk", wc, dx, dz)
    K = C @ jnp.linalg.inv(S)
    x = state.x + K @ (z - z_pred)
    P = state.P - K @ S @ K.T
    return KalmanState(x, P)
