"""Fixed-capacity keypoint arrays (the TPU replacement for
vector<cv::KeyPoint>): every field padded to a static capacity K with a
validity mask, so detection output feeds jitted downstream stages without
host sync."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Keypoints(NamedTuple):
    """Structure-of-arrays keypoint set, capacity K (static)."""

    y: jnp.ndarray  # (K,) float row coordinate
    x: jnp.ndarray  # (K,) float col coordinate
    scale: jnp.ndarray  # (K,) float characteristic scale (sigma-like)
    angle: jnp.ndarray  # (K,) float orientation, radians
    response: jnp.ndarray  # (K,) float detector response
    valid: jnp.ndarray  # (K,) bool

    @property
    def capacity(self) -> int:
        return self.y.shape[-1]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid, axis=-1)

    def yx(self) -> jnp.ndarray:
        return jnp.stack([self.y, self.x], axis=-1)

    def xy(self) -> jnp.ndarray:
        return jnp.stack([self.x, self.y], axis=-1)


def empty(capacity: int) -> Keypoints:
    z = jnp.zeros(capacity, jnp.float32)
    return Keypoints(z, z, jnp.ones(capacity, jnp.float32), z, z, jnp.zeros(capacity, bool))


def from_arrays(y, x, scale=None, angle=None, response=None, valid=None) -> Keypoints:
    y = jnp.asarray(y, jnp.float32)
    k = y.shape[-1]
    x = jnp.asarray(x, jnp.float32)
    if scale is None:
        scale = jnp.ones(k, jnp.float32)
    if angle is None:
        angle = jnp.zeros(k, jnp.float32)
    if response is None:
        response = jnp.ones(k, jnp.float32)
    if valid is None:
        valid = jnp.ones(k, bool)
    return Keypoints(y, x, jnp.asarray(scale, jnp.float32), jnp.asarray(angle, jnp.float32), jnp.asarray(response, jnp.float32), jnp.asarray(valid, bool))
