"""PCAFlow: dense flow as a learned/analytic low-dimensional basis fit to
sparse matches.

Reference anchor: optflow/src/pcaflow.cpp (OpticalFlowPCAFlow: sparse
feature matches -> flow field expressed in a PCA basis -> regularized
least-squares coefficients -> dense reconstruction; the shipped prior uses
learned PCA vectors, with a DCT basis fallback — pcaflow.hpp notes the
basis is "whole-image" smooth functions).

TPU-first: basis evaluation at match sites and the normal-equation solve
are small matmuls; the dense reconstruction is one (HW, K) x (K,) product.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.flow import lk as lk_mod


def dct_basis(H: int, W: int, k: int = 6):
    """Separable DCT-II basis on the image grid: k*k smooth 2D modes.
    Returns (H, W, k*k)."""
    y = (jnp.arange(H) + 0.5) / H
    x = (jnp.arange(W) + 0.5) / W
    by = jnp.cos(jnp.pi * y[:, None] * jnp.arange(k)[None])  # (H, k)
    bx = jnp.cos(jnp.pi * x[:, None] * jnp.arange(k)[None])  # (W, k)
    B = by[:, None, :, None] * bx[None, :, None, :]
    return B.reshape(H, W, k * k)


@partial(jax.jit, static_argnames=("H", "W", "k"))
def fit_flow(pts_yx, flows, valid, H: int, W: int, k: int = 6, ridge: float = 1e-2):
    """Fit basis coefficients to sparse (point, flow) matches with ridge
    regularization (the reference's learned prior acts as the regularizer).
    Returns dense flow (H, W, 2)."""
    K = k * k
    y = (pts_yx[:, 0] + 0.5) / H
    x = (pts_yx[:, 1] + 0.5) / W
    by = jnp.cos(jnp.pi * y[:, None] * jnp.arange(k)[None])
    bx = jnp.cos(jnp.pi * x[:, None] * jnp.arange(k)[None])
    Phi = (by[:, :, None] * bx[:, None, :]).reshape(-1, K)  # (N, K)
    wm = valid.astype(jnp.float32)[:, None]
    A = (Phi * wm).T @ Phi + ridge * jnp.eye(K)
    coef = jnp.linalg.solve(A, (Phi * wm).T @ (flows * wm))  # (K, 2)
    B = dct_basis(H, W, k).reshape(-1, K)
    return (B @ coef).reshape(H, W, 2)


def compute(I0, I1, grid_stride: int = 8, k: int = 6, levels: int = 3):
    """PCAFlow dense flow I0 -> I1: LK-track a sparse grid, fit the DCT
    basis, reconstruct densely. Returns (H, W, 2) (dy, dx)."""
    I0 = jnp.asarray(I0, jnp.float32)
    I1 = jnp.asarray(I1, jnp.float32)
    H, W = I0.shape
    ys = jnp.arange(grid_stride // 2, H, grid_stride, dtype=jnp.float32)
    xs = jnp.arange(grid_stride // 2, W, grid_stride, dtype=jnp.float32)
    pts = jnp.stack(jnp.meshgrid(ys, xs, indexing="ij"), -1).reshape(-1, 2)
    _, flow, valid = lk_mod.track(I0, I1, pts, levels=levels)
    return fit_flow(pts, flow, valid, H, W, k=k)
