"""F0-transform with triangular basis functions.

The F0 transform computes weighted local means over an overlapping
triangular partition (stride = radius); the inverse reconstructs by basis-
weighted interpolation — together they act as the reference's ft02D_process
smoothing, and masking enables inpainting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _basis_1d(n: int, radius: int):
    """Triangular partition centers + weights: centers every `radius` px."""
    centers = jnp.arange(0, n + radius - 1, radius)
    x = jnp.arange(n)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(x[None, :] - centers[:, None]) / radius)  # (C, n)
    return w


def f0_components(img: jnp.ndarray, radius: int = 8, mask: jnp.ndarray | None = None):
    """F0 components (Cy, Cx) over the partition; mask=True marks valid
    pixels (invalid ones excluded, enabling inpainting)."""
    H, W = img.shape
    wy = _basis_1d(H, radius)  # (Cy, H)
    wx = _basis_1d(W, radius)  # (Cx, W)
    m = jnp.ones_like(img) if mask is None else mask.astype(img.dtype)
    num = jnp.einsum("ch,hw,dw->cd", wy, img * m, wx)
    den = jnp.einsum("ch,hw,dw->cd", wy, m, wx)
    return num / jnp.maximum(den, 1e-9), den


def f0_inverse(components: jnp.ndarray, shape, radius: int = 8) -> jnp.ndarray:
    H, W = shape
    wy = _basis_1d(H, radius)
    wx = _basis_1d(W, radius)
    num = jnp.einsum("cd,ch,dw->hw", components, wy, wx)
    den = jnp.einsum("h,w->hw", wy.sum(axis=0), wx.sum(axis=0))
    return num / jnp.maximum(den, 1e-9)


def f0_filter(img: jnp.ndarray, radius: int = 8) -> jnp.ndarray:
    """FT-based smoothing filter (ft::filter contract)."""
    comp, _ = f0_components(img, radius)
    return f0_inverse(comp, img.shape, radius)


def f0_inpaint(img: jnp.ndarray, mask: jnp.ndarray, radius: int = 8) -> jnp.ndarray:
    """FT-based inpainting: components from valid pixels only; masked
    pixels reconstructed from the inverse transform (ft::inpaint ONE_STEP)."""
    comp, den = f0_components(img, radius, mask=~mask)
    recon = f0_inverse(comp, img.shape, radius)
    return jnp.where(mask, recon, img)


def f1_components(img: jnp.ndarray, radius: int = 8, mask: jnp.ndarray | None = None):
    """F1-transform components: per-cell linear model c00 + cy*(y-yc) +
    cx*(x-xc) fitted under the triangular weights (fuzzy/src/fuzzy_F1_math.cpp
    F1transform semantics). Returns (c00, c10_y, c01_x) each (Cy, Cx)."""
    H, W = img.shape
    wy = _basis_1d(H, radius)  # (Cy, H)
    wx = _basis_1d(W, radius)  # (Cx, W)
    m = jnp.ones_like(img) if mask is None else mask.astype(img.dtype)
    ys = jnp.arange(H, dtype=img.dtype)
    xs = jnp.arange(W, dtype=img.dtype)
    # expand about each cell's basis CENTROID (for border cells the clipped
    # triangle's centroid is off the nominal center; using it keeps linear
    # functions exactly representable)
    cy = (wy @ ys) / jnp.maximum(wy.sum(1), 1e-9)
    cx = (wx @ xs) / jnp.maximum(wx.sum(1), 1e-9)
    dy = ys[None, :] - cy[:, None]  # (Cy, H)
    dx = xs[None, :] - cx[:, None]  # (Cx, W)

    def cell_sum(fy, fx, v):
        return jnp.einsum("ch,hw,dw->cd", fy, v, fx)

    den0 = cell_sum(wy, wx, m)
    c00 = cell_sum(wy, wx, img * m) / jnp.maximum(den0, 1e-9)
    deny = cell_sum(wy * dy * dy, wx, m)
    c10 = cell_sum(wy * dy, wx, img * m) / jnp.maximum(deny, 1e-9)
    denx = cell_sum(wy, wx * dx * dx, m)
    c01 = cell_sum(wy, wx * dx, img * m) / jnp.maximum(denx, 1e-9)
    # orthogonality correction: remove the mean captured by c00
    c10 = c10 - cell_sum(wy * dy, wx, m) * c00 / jnp.maximum(deny, 1e-9)
    c01 = c01 - cell_sum(wy, wx * dx, m) * c00 / jnp.maximum(denx, 1e-9)
    return c00, c10, c01


def f1_inverse(c00, c10, c01, shape, radius: int = 8) -> jnp.ndarray:
    """Inverse F1-transform: basis-weighted linear reconstruction."""
    H, W = shape
    wy = _basis_1d(H, radius)
    wx = _basis_1d(W, radius)
    ys = jnp.arange(H, dtype=c00.dtype)
    xs = jnp.arange(W, dtype=c00.dtype)
    cy = (wy @ ys) / jnp.maximum(wy.sum(1), 1e-9)  # basis centroids (see forward)
    cx = (wx @ xs) / jnp.maximum(wx.sum(1), 1e-9)
    dy = ys[None, :] - cy[:, None]
    dx = xs[None, :] - cx[:, None]
    num = (
        jnp.einsum("cd,ch,dw->hw", c00, wy, wx)
        + jnp.einsum("cd,ch,dw->hw", c10, wy * dy, wx)
        + jnp.einsum("cd,ch,dw->hw", c01, wy, wx * dx)
    )
    den = jnp.einsum("ch,dw->hw", wy, wx)
    return num / jnp.maximum(den, 1e-9)


def f1_filter(img: jnp.ndarray, radius: int = 8) -> jnp.ndarray:
    """F1 smoothing: forward + inverse (keeps local gradients, unlike F0)."""
    c00, c10, c01 = f1_components(img, radius)
    return f1_inverse(c00, c10, c01, img.shape, radius)
