"""Static saliency maps."""

from __future__ import annotations

import jax.numpy as jnp

from opencv_contrib_tpu.ops import filters, integral
from opencv_contrib_tpu.ops.image import resize


def spectral_residual(img: jnp.ndarray, out_size=(64, 64)) -> jnp.ndarray:
    """StaticSaliencySpectralResidual (Hou-Zhang): saliency = |ifft(exp(
    (log|F| - avg log|F|) + i phase))|^2, smoothed; computed at 64x64 then
    upscaled (same recipe as the reference)."""
    H, W = img.shape
    small = resize(img, out_size)
    F = jnp.fft.fft2(small)
    logmag = jnp.log(jnp.abs(F) + 1e-9)
    phase = jnp.angle(F)
    avg = filters.box_filter(logmag, 1)
    residual = logmag - avg
    sal = jnp.abs(jnp.fft.ifft2(jnp.exp(residual + 1j * phase))) ** 2
    sal = filters.gaussian_blur(sal, 2.5)
    sal = resize(sal, (H, W))
    mn, mx = sal.min(), sal.max()
    return (sal - mn) / jnp.maximum(mx - mn, 1e-9)


def fine_grained(img: jnp.ndarray, scales=(2, 4, 8)) -> jnp.ndarray:
    """StaticSaliencyFineGrained: center-surround differences of box means
    at multiple scales on the integral image."""
    ii = integral.integral(img)
    H, W = img.shape
    import jax

    y = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    sal = jnp.zeros((H, W))
    for r in scales:
        center = integral.box_mean(ii, y - r // 2, x - r // 2, r, r)
        surround = integral.box_mean(ii, y - 2 * r, x - 2 * r, 4 * r, 4 * r)
        sal = sal + jnp.abs(center - surround)
    mn, mx = sal.min(), sal.max()
    return (sal - mn) / jnp.maximum(mx - mn, 1e-9)
