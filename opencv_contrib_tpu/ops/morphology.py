"""Morphology + NMS primitives (erode/dilate/open/close, maxpool-NMS).

Reference capability: the morphology every detector/segmenter leans on, and
the 3x3(x3) non-max suppression at the heart of SURF's findMaximaInLayer
(xfeatures2d/src/surf.cpp:351) — expressed as reduce_window max compares.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _window_reduce(img: jnp.ndarray, size: int, op, init) -> jnp.ndarray:
    return jax.lax.reduce_window(
        img, init, op, window_dimensions=(size, size), window_strides=(1, 1), padding="SAME"
    )


def dilate(img: jnp.ndarray, size: int = 3, iterations: int = 1) -> jnp.ndarray:
    for _ in range(iterations):
        img = _window_reduce(img, size, jax.lax.max, -jnp.inf)
    return img


def erode(img: jnp.ndarray, size: int = 3, iterations: int = 1) -> jnp.ndarray:
    for _ in range(iterations):
        img = _window_reduce(img, size, jax.lax.min, jnp.inf)
    return img


def opening(img: jnp.ndarray, size: int = 3) -> jnp.ndarray:
    return dilate(erode(img, size), size)


def closing(img: jnp.ndarray, size: int = 3) -> jnp.ndarray:
    return erode(dilate(img, size), size)


def nms2d(response: jnp.ndarray, size: int = 3) -> jnp.ndarray:
    """True where response is the strict max of its size x size neighborhood."""
    mx = dilate(response, size)
    return response >= mx


def maxpool(img: jnp.ndarray, stride: int) -> jnp.ndarray:
    return jax.lax.reduce_window(
        img, -jnp.inf, jax.lax.max,
        window_dimensions=(stride, stride), window_strides=(stride, stride), padding="VALID",
    )
