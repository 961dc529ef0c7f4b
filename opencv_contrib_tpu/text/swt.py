"""Stroke Width Transform text detection.

Reference anchor: text/src/swt_text_detection.cpp (SWTTextDetection):
edge map -> per-edge-pixel ray cast along the gradient until an opposing
edge -> stroke width map -> letter candidates by stroke-width-consistent
connected components -> word grouping by geometric chaining.

TPU-first: the reference marches each ray sequentially per pixel. Here ALL
rays sample ALL steps at once (one batched gather of shape (H*W, K) — the
same sample-everything-then-argmax pattern as the KinFu raycast rewrite),
the first-opposing-edge test is a vectorized argmax, and the stroke-width
median per component uses the scatter-based component_stats.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.ops.ccl import component_stats, connected_components
from opencv_contrib_tpu.ops.image import sample_nearest


def _edges(img, low: float = 0.08, high: float = 0.2):
    """Gradient-NMS edge map (Canny-class, single threshold pair)."""
    g = filters.gaussian_blur(img, 1.0)
    gy, gx = filters.gradients(g)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)
    # quantize direction to 4 bins, compare against the two neighbors
    d = jnp.round(ang / (jnp.pi / 4)).astype(jnp.int32) % 4
    H, W = img.shape
    p = jnp.pad(mag, 1)

    def nb(dy, dx):
        return p[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]

    n0 = jnp.select([d == 0, d == 1, d == 2, d == 3], [nb(0, 1), nb(1, 1), nb(1, 0), nb(1, -1)])
    n1 = jnp.select([d == 0, d == 1, d == 2, d == 3], [nb(0, -1), nb(-1, -1), nb(-1, 0), nb(-1, 1)])
    nms = (mag >= n0) & (mag >= n1) & (mag > low)
    strong = mag > high
    # one hysteresis dilation pass: weak pixels next to strong survive
    sp = jnp.pad(strong, 1)
    grow = jnp.zeros_like(strong)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            grow = grow | sp[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
    return nms & (strong | grow), gy, gx, mag


@partial(jax.jit, static_argnames=("max_width", "dark_on_light"))
def stroke_width_map(img, max_width: int = 24, dark_on_light: bool = True):
    """SWT: per-pixel stroke width (0 where none). Rays cast from every
    edge pixel along +/-gradient; a hit is an edge pixel whose gradient
    opposes the ray within ~pi/6 (the reference's acceptance test)."""
    edge, gy, gx, mag = _edges(img)
    H, W = img.shape
    inv = jnp.where(mag > 1e-6, 1.0 / jnp.maximum(mag, 1e-6), 0.0)
    dy, dx = gy * inv, gx * inv
    # dark-on-light: the gradient at a stroke edge points toward the bright
    # side, so the ray into the stroke marches along the NEGATIVE gradient
    sign = -1.0 if dark_on_light else 1.0
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")

    steps = jnp.arange(1, max_width + 1, dtype=jnp.float32)
    ry = yy[..., None] + sign * dy[..., None] * steps  # (H, W, K)
    rx = xx[..., None] + sign * dx[..., None] * steps
    e_at = sample_nearest(edge.astype(jnp.float32), ry, rx) > 0.5
    gy_at = sample_nearest(gy, ry, rx)
    gx_at = sample_nearest(gx, ry, rx)
    # opposing gradient: cos(angle between) < -cos(pi/6)
    dot = gy_at * dy[..., None] + gx_at * dx[..., None]
    norm = jnp.sqrt(gy_at**2 + gx_at**2) + 1e-6
    opposing = e_at & (dot / norm < -0.866)
    inb = (ry >= 0) & (ry < H) & (rx >= 0) & (rx < W)
    hit = opposing & inb
    any_hit = hit.any(-1)
    first = jnp.argmax(hit, axis=-1)  # index of first hit step
    width = jnp.where(edge & any_hit, steps[first], 0.0)

    # paint the stroke: scatter min(width) onto every pixel along the ray up
    # to the hit (reference fills rays with the found width)
    K = max_width
    kidx = jnp.arange(K)
    on_ray = (kidx[None, None] <= first[..., None]) & (edge & any_hit)[..., None] & inb
    py = jnp.clip(jnp.round(ry), 0, H - 1).astype(jnp.int32)
    px = jnp.clip(jnp.round(rx), 0, W - 1).astype(jnp.int32)
    flat = (py * W + px).reshape(-1)
    w_b = jnp.broadcast_to(width[..., None], on_ray.shape).reshape(-1)
    vals = jnp.where(on_ray.reshape(-1), w_b, jnp.inf)
    swt = jnp.full(H * W, jnp.inf).at[flat].min(vals)
    swt = jnp.where(jnp.isfinite(swt), swt, 0.0).reshape(H, W)
    return jnp.maximum(swt, jnp.where(edge & any_hit, width, 0.0))


@partial(jax.jit, static_argnames=("max_components",))
def _letter_stats(swt, max_components: int = 256):
    mask = swt > 0
    labels, _ = connected_components(mask, connectivity=8)
    return component_stats(labels, values=swt, max_components=max_components)


def detect_text(img, max_width: int = 24, dark_on_light: bool = True,
                min_area: int = 10, max_aspect: float = 10.0, cv_thresh: float = 0.9):
    """SWT letter candidates -> word boxes. Returns (boxes (N, 4) numpy
    [y0, x0, y1, x1], letter_boxes). Chaining (host-side, like the
    reference's letter pairing) merges candidates with similar stroke
    width and height along a line."""
    swt = stroke_width_map(jnp.asarray(img, jnp.float32), max_width, dark_on_light)
    st = _letter_stats(swt)
    area = np.asarray(st["area"])
    y0, x0 = np.asarray(st["y0"]), np.asarray(st["x0"])
    y1, x1 = np.asarray(st["y1"]), np.asarray(st["x1"])
    mean = np.asarray(st["sum"]) / np.maximum(area, 1)
    var = np.asarray(st["sumsq"]) / np.maximum(area, 1) - mean**2
    h = y1 - y0 + 1
    w = x1 - x0 + 1
    keep = (
        np.asarray(st["valid"])
        & (area >= min_area)
        & (np.maximum(h / np.maximum(w, 1), w / np.maximum(h, 1)) < max_aspect)
        & (np.sqrt(np.maximum(var, 0)) / np.maximum(mean, 1e-6) < cv_thresh)
    )
    letters = np.stack([y0, x0, y1, x1, mean, h], axis=1)[keep]
    if letters.shape[0] == 0:
        return np.zeros((0, 4)), letters[:, :4]

    # chain letters into words: similar stroke width + height, horizontally near
    n = letters.shape[0]
    parent = np.arange(n)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        for j in range(i + 1, n):
            a, b = letters[i], letters[j]
            sw_ratio = max(a[4], b[4]) / max(min(a[4], b[4]), 1e-6)
            h_ratio = max(a[5], b[5]) / max(min(a[5], b[5]), 1e-6)
            cy_a, cy_b = (a[0] + a[2]) / 2, (b[0] + b[2]) / 2
            gap = max(b[1] - a[3], a[1] - b[3])
            if sw_ratio < 2.0 and h_ratio < 2.0 and abs(cy_a - cy_b) < 0.7 * max(a[5], b[5]) and gap < 2.0 * max(a[5], b[5]):
                parent[find(i)] = find(j)
    groups = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)
    boxes = []
    for members in groups.values():
        ls = letters[members]
        boxes.append([ls[:, 0].min(), ls[:, 1].min(), ls[:, 2].max(), ls[:, 3].max()])
    return np.asarray(boxes), letters[:, :4]
