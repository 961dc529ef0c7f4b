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
