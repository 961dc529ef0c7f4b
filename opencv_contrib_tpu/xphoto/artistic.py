"""Artistic filters (parity: xphoto oilPainting, xphoto/src/oilpainting.cpp):
each output pixel takes the most frequent intensity bin in its neighborhood.
TPU-first: per-bin box-filtered votes (no per-pixel histogram loop)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ops import filters


@partial(jax.jit, static_argnames=("radius", "bins"))
def oil_painting(img: jnp.ndarray, radius: int = 3, bins: int = 16) -> jnp.ndarray:
    """Grayscale (H, W) in [0,1]."""
    q = jnp.clip((img * bins).astype(jnp.int32), 0, bins - 1)
    onehot = jax.nn.one_hot(q, bins, dtype=jnp.float32)  # (H, W, B)
    votes = jnp.stack([filters.box_filter(onehot[..., b], radius) for b in range(bins)], axis=-1)
    sums = jnp.stack([filters.box_filter(jnp.where(q == b, img, 0.0), radius) for b in range(bins)], axis=-1)
    best = jnp.argmax(votes, axis=-1)
    cnt = jnp.take_along_axis(votes, best[..., None], axis=-1)[..., 0]
    val = jnp.take_along_axis(sums, best[..., None], axis=-1)[..., 0]
    return val / jnp.maximum(cnt, 1e-9)
