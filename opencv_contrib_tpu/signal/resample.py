"""Signal resampling (cv::signal::resampleSignal contract): cubic-kernel
resampling of a 1-D signal to a new length."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resample_signal(x: jnp.ndarray, out_length: int) -> jnp.ndarray:
    x = jnp.asarray(x, jnp.float32)
    return jax.image.resize(x, (out_length,), method="cubic")
