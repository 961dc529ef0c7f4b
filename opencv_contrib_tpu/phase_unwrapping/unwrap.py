"""Least-squares phase unwrapping via DCT (Ghiglia & Romero 1994)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def wrap(phi: jnp.ndarray) -> jnp.ndarray:
    """Wrap to (-pi, pi]."""
    return jnp.mod(phi + jnp.pi, 2 * jnp.pi) - jnp.pi


def _dct2(x):
    """2D DCT-II via FFT of the even extension (orthonormalized)."""
    N, M = x.shape
    Mx = _dct_matrix(N)
    My = _dct_matrix(M)
    return Mx @ x @ My.T


def _idct2(X):
    N, M = X.shape
    Mx = _dct_matrix(N)
    My = _dct_matrix(M)
    return Mx.T @ X @ My


def _dct_matrix(n: int) -> jnp.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    M = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    M[0] /= np.sqrt(2.0)
    return jnp.asarray(M, jnp.float32)


@jax.jit
def unwrap_phase_dct(psi: jnp.ndarray) -> jnp.ndarray:
    """Unwrap a wrapped phase map psi (H, W) in radians.

    Solves the discrete Poisson equation with Neumann boundary conditions:
    lap(phi) = rho, where rho is built from wrapped phase differences.
    """
    H, W = psi.shape
    # wrapped forward differences (zero at the far boundary via append)
    dy = wrap(jnp.diff(psi, axis=0, append=psi[-1:]))
    dx = wrap(jnp.diff(psi, axis=1, append=psi[:, -1:]))
    # backward-difference divergence of the wrapped gradient field
    dy2 = jnp.concatenate([dy[:1], dy[1:] - dy[:-1]], axis=0)
    dx2 = jnp.concatenate([dx[:, :1], dx[:, 1:] - dx[:, :-1]], axis=1)
    rho = dy2 + dx2

    D = _dct2(rho)
    i = jnp.arange(H)[:, None]
    j = jnp.arange(W)[None, :]
    denom = 2.0 * (jnp.cos(jnp.pi * i / H) + jnp.cos(jnp.pi * j / W) - 2.0)
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1.0, denom)
    Phi = D / denom
    Phi = Phi.at[0, 0].set(0.0)  # gauge: zero mean
    return _idct2(Phi)
