"""LINEMOD multimodal template matching.

Reference anchors: rgbd/src/linemod.cpp (~1.8k LoC): quantized color
gradient (ColorGradient) + surface normal (DepthNormal) modalities,
orientation spreading, response maps (similarity via cosine lookup),
template matching over a detection pyramid.

TPU-first: the reference's bit-packed SSE linearized memories become dense
(H, W, 8) one-hot orientation maps; spreading is a max-pool; the per-template
similarity is one gather of (n_features,) response values per window — all
windows scored in a single batched take. Quantization to 8 bins keeps
everything int-free one-hot float math on the VPU.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.rgbd.frame import compute_normals, depth_to_points

N_ORI = 8


def quantize_gradients(img, mag_thresh: float = 0.05):
    """Quantized color-gradient modality (ColorGradient::processImpl):
    gradient orientation (mod pi) -> 8 bins where magnitude is strong.
    Returns (H, W, 8) one-hot float."""
    gy, gx = filters.gradients(img)
    mag = jnp.sqrt(gy * gy + gx * gx)
    ang = (jnp.arctan2(gy, gx) + jnp.pi) % jnp.pi
    b = jnp.clip((ang / jnp.pi * N_ORI).astype(jnp.int32), 0, N_ORI - 1)
    oh = jax.nn.one_hot(b, N_ORI, dtype=img.dtype)
    return oh * (mag > mag_thresh)[..., None], mag


def quantize_normals(depth, intr):
    """Quantized surface-normal modality (DepthNormal::processImpl):
    normals binned by their (nx, ny) direction into 8 sectors."""
    pts = depth_to_points(depth, intr)
    normals, _ = compute_normals(pts, depth > 0)
    ang = (jnp.arctan2(normals[..., 1], normals[..., 0]) + 2 * jnp.pi) % (2 * jnp.pi)
    b = jnp.clip((ang / (2 * jnp.pi) * N_ORI).astype(jnp.int32), 0, N_ORI - 1)
    oh = jax.nn.one_hot(b, N_ORI, dtype=depth.dtype)
    strong = jnp.abs(normals[..., 2]) < 0.98  # ignore flat-on surfaces
    return oh * ((depth > 0) & strong)[..., None]


def spread(quantized, T: int = 4):
    """Orientation spreading (linemod.cpp spread()): a bin is active at p
    if active anywhere in the TxT neighborhood — a max pool."""
    H, W, C = quantized.shape
    p = jnp.pad(quantized, ((0, T - 1), (0, T - 1), (0, 0)))
    out = jnp.zeros_like(quantized)
    for dy in range(T):
        for dx in range(T):
            out = jnp.maximum(out, p[dy : dy + H, dx : dx + W])
    return out


# cosine response lookup (linemod.cpp similarity): response of spread bin j
# to template bin i = |cos(pi (i-j)/8)|
_COS = np.abs(np.cos(np.pi * (np.arange(N_ORI)[:, None] - np.arange(N_ORI)[None]) / N_ORI)).astype(np.float32)


def response_maps(spread_oh):
    """Precompute per-orientation response maps (computeResponseMaps):
    for each template orientation i, the best cosine response of the
    spread pixel. Returns (H, W, 8)."""
    # max over active bins j of cos[i, j]
    act = spread_oh[..., None, :]  # (H, W, 1, 8)
    cos = jnp.asarray(_COS)[None, None]  # (1, 1, 8, 8)
    return jnp.max(jnp.where(act > 0, cos, 0.0), axis=-1)  # (H, W, 8)


class Template(NamedTuple):
    offsets: jnp.ndarray  # (F, 2) feature offsets (dy, dx) from window TL
    orientations: jnp.ndarray  # (F,) int bins
    size: tuple  # (h, w)


def extract_template(quantized, mag, top_left, size, n_features: int = 32):
    """Pick the strongest-gradient quantized pixels inside the box as the
    template features (Modality::extractTemplate)."""
    y0, x0 = top_left
    h, w = size
    q = quantized[y0 : y0 + h, x0 : x0 + w]
    m = mag[y0 : y0 + h, x0 : x0 + w] * (q.sum(-1) > 0)
    flat = np.asarray(m).reshape(-1)
    top = np.argsort(-flat)[:n_features]
    oy, ox = np.unravel_index(top, (h, w))
    ori = np.asarray(q.argmax(-1))[oy, ox]
    return Template(jnp.asarray(np.stack([oy, ox], 1), jnp.int32), jnp.asarray(ori, jnp.int32), (h, w))


def match_template(resp, tmpl: Template, stride: int = 2):
    """Similarity of the template at every window position: mean cosine
    response over the template features (linemod.cpp similarity()).
    resp (H, W, 8) from response_maps. Returns (ny, nx) scores in [0, 1]."""
    return _match_template(resp, tmpl.offsets, tmpl.orientations, tmpl.size, stride)


@partial(jax.jit, static_argnames=("size", "stride"))
def _match_template(resp, offsets, orientations, size, stride):
    H, W, _ = resp.shape
    h, w = size
    ys = jnp.arange(0, H - h + 1, stride)
    xs = jnp.arange(0, W - w + 1, stride)

    def at(y0, x0):
        ry = y0 + offsets[:, 0]
        rx = x0 + offsets[:, 1]
        return resp[ry, rx, orientations].mean()

    return jax.vmap(lambda y: jax.vmap(lambda x: at(y, x))(xs))(ys)


def detect(img, tmpl: Template, spread_T: int = 4, stride: int = 2, thresh: float = 0.8):
    """Full LINEMOD color-gradient detection pass. Returns (boxes, scores)."""
    q, mag = quantize_gradients(jnp.asarray(img, jnp.float32))
    resp = response_maps(spread(q, spread_T))
    s = np.asarray(match_template(resp, tmpl, stride))
    ys, xs = np.where(s >= thresh)
    h, w = tmpl.size
    boxes = np.stack([ys * stride, xs * stride, ys * stride + h, xs * stride + w], 1)
    return boxes, s[ys, xs]
