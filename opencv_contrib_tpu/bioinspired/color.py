"""Retina color multiplexing/demultiplexing and fast tone mapping.

Reference anchors (bioinspired):
- src/retinacolor.{hpp,cpp} — RetinaColor: color sampling (Bayer/diagonal),
  multiplexing to a single plane, adaptive demultiplexing with chrominance
  low-pass + luminance normalization
- src/retinafasttonemapping.cpp — RetinaFastToneMapping::applyFastToneMapping:
  two cascaded Naka-Rushton-style local adaptation stages (photoreceptor then
  ganglion), no temporal state

TPU-first: the mosaic masks are static (H, W) planes; demultiplexing is three
masked normalized blurs fused by XLA; tone mapping is two blur+divide stages.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ops import filters


def bayer_masks(shape):
    """RGGB Bayer sampling masks (3, H, W) float32 (retinacolor.cpp color
    sampling mode RETINA_COLOR_BAYER)."""
    H, W = shape
    ys, xs = jnp.mgrid[0:H, 0:W]
    r = ((ys % 2 == 0) & (xs % 2 == 0)).astype(jnp.float32)
    g = ((ys + xs) % 2 == 1).astype(jnp.float32)
    b = ((ys % 2 == 1) & (xs % 2 == 1)).astype(jnp.float32)
    return jnp.stack([r, g, b])


@jax.jit
def color_multiplex(rgb: jnp.ndarray) -> jnp.ndarray:
    """Multiplex an (H, W, 3) image into the single-plane retinal mosaic
    (RetinaColor::runColorMultiplexing)."""
    masks = bayer_masks(rgb.shape[:2])
    return (rgb.transpose(2, 0, 1) * masks).sum(0)


@partial(jax.jit, static_argnames=("sigma",))
def color_demultiplex(mosaic: jnp.ndarray, sigma: float = 2.0) -> jnp.ndarray:
    """Demultiplex a mosaic plane back to (H, W, 3)
    (RetinaColor::runColorDemultiplexing): per-channel normalized low-pass
    of the sampled sites (adaptive interpolation), then a luminance
    re-normalization so demux(mux(x)) ~ x for smooth x."""
    masks = bayer_masks(mosaic.shape)

    def chan(m):
        num = filters.gaussian_blur(mosaic * m, sigma)
        den = filters.gaussian_blur(m, sigma)
        return num / jnp.maximum(den, 1e-6)

    rgb = jax.vmap(chan)(masks)  # (3, H, W)
    return rgb.transpose(1, 2, 0)


@partial(jax.jit, static_argnames=("photoreceptor_sigma", "ganglion_sigma"))
def fast_tone_mapping(img: jnp.ndarray,
                      photoreceptor_sigma: float = 3.0,
                      ganglion_sigma: float = 1.5,
                      mean_weight: float = 1.0) -> jnp.ndarray:
    """Fast tone mapping (parity: cv::bioinspired::RetinaFastToneMapping,
    retinafasttonemapping.cpp): two cascaded local Naka-Rushton adaptations —
    V1 = L / (L + k*localmean_ph), V2 = V1 / (V1 + k*localmean_gang) — then
    rescaled to the input range. Works on gray (H, W) or color (H, W, 3)
    (color goes through the luminance, chrominance preserved)."""
    f = img.astype(jnp.float32)
    if f.ndim == 3:
        lum = f.mean(-1)
        chroma = f / jnp.maximum(lum[..., None], 1e-6)
    else:
        lum = f
        chroma = None

    def adapt(x, sigma):
        local = filters.gaussian_blur(x, sigma)
        comp = mean_weight * (local + x.mean())
        return (x * (1.0 + comp)) / (x + comp + 1e-9)

    v = adapt(lum, photoreceptor_sigma)
    v = adapt(v, ganglion_sigma)
    v = (v - v.min()) / jnp.maximum(v.max() - v.min(), 1e-9)
    v = v * (lum.max() - lum.min()) + lum.min()
    if chroma is not None:
        return jnp.clip(chroma * v[..., None], 0.0, jnp.inf)
    return v


def retina_run_color(retina, rgb):
    """Color parvo pathway: multiplex -> retina.run on the mosaic ->
    demultiplex the parvo output back to color (the reference's color
    pipeline shape: RetinaImpl::run with _useColorMode)."""
    mosaic = color_multiplex(jnp.asarray(rgb, jnp.float32))
    parvo, magno = retina.run(mosaic)
    return color_demultiplex(parvo), magno
