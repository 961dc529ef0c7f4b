"""Fourier descriptors for contours (parity: cv::ximgproc::fourierDescriptor,
fourier_descriptors.hpp)."""

from __future__ import annotations

import jax.numpy as jnp


def fourier_descriptors(contour_yx: jnp.ndarray, n_keep: int = 16, normalize: bool = True) -> jnp.ndarray:
    """contour (N, 2) closed polygon -> complex descriptor magnitudes
    (n_keep,), optionally made translation/scale/rotation invariant."""
    z = contour_yx[:, 1] + 1j * contour_yx[:, 0]
    F = jnp.fft.fft(z)
    if normalize:
        F = F.at[0].set(0.0)  # translation invariance
        mag1 = jnp.abs(F[1])
        F = F / jnp.maximum(mag1, 1e-9)  # scale invariance
        desc = jnp.abs(F)  # rotation/start-point invariance
    else:
        desc = jnp.abs(F)
    half = n_keep // 2
    return jnp.concatenate([desc[1 : 1 + half], desc[-half:]])
