"""Inpainting (parity: xphoto inpaint FSR/shift-map — here a
diffusion-based fill with the same API contract: reconstruct masked pixels
from surrounding content). Fixed-iteration Jacobi diffusion with the known
pixels pinned — jittable, fuses to one elementwise loop."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("iters",))
def inpaint_diffusion(img: jnp.ndarray, mask: jnp.ndarray, iters: int = 200) -> jnp.ndarray:
    """img (H, W[, C]); mask True where pixels are MISSING."""
    m = mask[..., None] if img.ndim == 3 else mask
    init = jnp.where(m, 0.5, img)

    def body(x, _):
        nb = (
            jnp.roll(x, 1, 0) + jnp.roll(x, -1, 0) + jnp.roll(x, 1, 1) + jnp.roll(x, -1, 1)
        ) / 4.0
        return jnp.where(m, nb, img), None

    out, _ = jax.lax.scan(body, init, None, length=iters)
    return out
