"""MedianFlow tracker: forward-backward LK point tracking with median
displacement/scale voting.

Reference anchor: tracking/src/trackerMedianFlow.cpp (medianFlowImpl:
trackPoints grid, forward-backward error, NCC filtering, median dx/dy and
median pairwise-distance-ratio scale update).

TPU-first: the point grid is static (G x G), forward and backward LK run as
one batched pyramidal solve each (flow.lk), the FB/NCC gates are masked
medians — the whole step is jittable with static shapes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.flow import lk
from opencv_contrib_tpu.ops.image import extract_patches


class Box(NamedTuple):
    center: jnp.ndarray  # (2,) y, x
    size: jnp.ndarray  # (2,) h, w


def _masked_median(x, mask):
    """Median of x where mask, computed by sorting with +inf fill and
    indexing the (count//2)-th element (static-shape friendly)."""
    big = jnp.where(mask, x, jnp.inf)
    s = jnp.sort(big)
    n = mask.sum()
    i = jnp.maximum(n - 1, 0) // 2
    lo = s[i]
    hi = s[jnp.where(n > 0, jnp.minimum(i + (1 - n % 2), x.shape[0] - 1), 0)]
    return jnp.where(n > 0, 0.5 * (lo + hi), 0.0)


def _ncc(a, b):
    a = a - a.mean(axis=-1, keepdims=True)
    b = b - b.mean(axis=-1, keepdims=True)
    num = (a * b).sum(-1)
    den = jnp.sqrt((a * a).sum(-1) * (b * b).sum(-1)) + 1e-9
    return num / den


@partial(jax.jit, static_argnames=("grid", "levels"))
def medianflow_update(box: Box, I0, I1, grid: int = 10, levels: int = 3):
    """Track box from I0 to I1. Returns (new_box, ok) where ok=False means
    tracking failure (the reference's forward-backward error > threshold
    gate, trackerMedianFlow.cpp MEDIAN_FLOW_FB_ERROR)."""
    gy = (jnp.arange(grid) + 0.5) / grid - 0.5
    py = box.center[0] + gy * box.size[0]
    px = box.center[1] + gy * box.size[1]
    pts = jnp.stack(jnp.meshgrid(py, px, indexing="ij"), axis=-1).reshape(-1, 2)

    fwd, _, v1 = lk.track(I0, I1, pts, levels=levels)
    back, _, v2 = lk.track(I1, I0, fwd, levels=levels)
    fb_err = jnp.linalg.norm(back - pts, axis=1)

    p0 = extract_patches(I0, pts, 5).reshape(pts.shape[0], -1)
    p1 = extract_patches(I1, fwd, 5).reshape(pts.shape[0], -1)
    ncc = _ncc(p0, p1)

    valid = v1 & v2
    med_fb = _masked_median(fb_err, valid)
    med_ncc = _masked_median(-ncc, valid)  # median of negated => keep ncc >= median
    keep = valid & (fb_err <= med_fb) & (-ncc <= med_ncc)

    d = fwd - pts
    dy = _masked_median(d[:, 0], keep)
    dx = _masked_median(d[:, 1], keep)

    # scale: median of pairwise distance ratios over kept points
    n = pts.shape[0]
    ii, jj = jnp.triu_indices(n, k=1)
    d0 = jnp.linalg.norm(pts[ii] - pts[jj], axis=1)
    d1 = jnp.linalg.norm(fwd[ii] - fwd[jj], axis=1)
    pair_ok = keep[ii] & keep[jj] & (d0 > 1e-3)
    ratio = jnp.where(pair_ok, d1 / jnp.maximum(d0, 1e-3), 1.0)
    scale = _masked_median(ratio, pair_ok)
    scale = jnp.where(pair_ok.sum() > 0, scale, 1.0)

    ok = (keep.sum() >= max(4, grid * grid // 10)) & (med_fb < 2.0 * jnp.sqrt(jnp.sum(jnp.square(d.mean(0)))) + 10.0)
    new = Box(box.center + jnp.stack([dy, dx]), box.size * scale)
    return new, ok
