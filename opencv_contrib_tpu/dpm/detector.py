"""DPM scoring: root + parts with quadratic deformation via max-plus GDT.

Reference anchors: dpm/src/dpm_feature.cpp (Feature::computeFeaturePyramid),
dpm/src/dpm_convolution.cpp (ConvolutionEngine::convolve), dpm/src/dpm_model.cpp
(Model: rootFilters/partFilters/anchors/deformation), dpm/src/dpm_cascade.cpp
(detection loop + NMS).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from opencv_contrib_tpu.ops.image import resize
from opencv_contrib_tpu.xobjdetect.hog import CELL, block_descriptors, cell_histograms


class DPMModel(NamedTuple):
    """One-component DPM: a root filter on the cell-feature grid plus P
    part filters with anchors (in root cells at 2x resolution) and
    quadratic deformation weights (dy2, dy, dx2, dx)."""

    root: jnp.ndarray  # (rh, rw, D) filter over block descriptors
    parts: jnp.ndarray  # (P, ph, pw, D)
    anchors: jnp.ndarray  # (P, 2) part anchor (y, x) in part-grid cells
    deform: jnp.ndarray  # (P, 4) quadratic costs (wy2, wy, wx2, wx), >= 0
    bias: float


def _features(img):
    """Block-normalized HOG grid (hb, wb, 36) — the DPM feature map."""
    return block_descriptors(cell_histograms(img))


def _correlate(feat, filt):
    """Valid cross-correlation of (H, W, D) with (fh, fw, D) -> (H-fh+1, W-fw+1)."""
    x = feat.transpose(2, 0, 1)[None]  # NCHW
    k = filt.transpose(2, 0, 1)[None]  # OIHW
    out = jax.lax.conv_general_dilated(x, k, (1, 1), "VALID")
    return out[0, 0]


@partial(jax.jit, static_argnames=("max_dy", "max_dx"))
def gdt2d(score, deform, max_dy: int = 4, max_dx: int = 4):
    """Generalized distance transform (max-plus): out[y, x] =
    max_{dy, dx} score[y+dy, x+dx] - wy2*dy^2 - wy*|dy| - wx2*dx^2 - wx*|dx|.
    Separable: rows then columns; each axis is a max over static shifts
    (dpm's dt1d lower-envelope, reformulated branch-free)."""
    wy2, wy, wx2, wx = deform[0], deform[1], deform[2], deform[3]
    H, W = score.shape

    def axis_pass(s, k, w2, w1, axis):
        shifts = jnp.arange(-k, k + 1)
        pad = [(0, 0), (0, 0)]
        pad[axis] = (k, k)
        p = jnp.pad(s, pad, constant_values=-jnp.inf)

        def shifted(d):
            start = [0, 0]
            start[axis] = d + k
            return jax.lax.dynamic_slice(p, start, s.shape) - w2 * d * d - w1 * jnp.abs(d)

        stack = jax.vmap(shifted)(shifts)
        return stack.max(0)

    out = axis_pass(score, max_dy, wy2, wy, 0)
    return axis_pass(out, max_dx, wx2, wx, 1)


@partial(jax.jit, static_argnames=("max_disp",))
def score_scale(feat, model: DPMModel, max_disp: int = 4):
    """Total DPM score map at one pyramid scale (same grid for root and
    parts here; the reference places parts at 2x — absorbed into anchor
    units). Returns (H', W') root-anchored scores."""
    root_s = _correlate(feat, model.root)  # (hr, wr)
    H, W = root_s.shape
    total = root_s + model.bias

    def add_part(total, inputs):
        pf, anchor, def_w = inputs
        ps = _correlate(feat, pf)  # (hp, wp)
        pd = gdt2d(ps, def_w, max_disp, max_disp)
        # align part map to root coords at its anchor offset
        pd_pad = jnp.pad(pd, ((0, feat.shape[0]), (0, feat.shape[1])), constant_values=-jnp.inf)
        shifted = jax.lax.dynamic_slice(pd_pad, (anchor[0], anchor[1]), (H, W))
        return total + shifted, None

    total, _ = jax.lax.scan(add_part, total, (model.parts, model.anchors, model.deform))
    return total


def detect(img, model: DPMModel, scales=(1.0, 0.8, 0.64), score_thresh: float = 0.0,
           max_disp: int = 4, nms_radius_cells: int = 3):
    """Multi-scale DPM detection. Returns list of (y, x, scale, score) with
    (y, x) the root top-left in pixels."""
    img = jnp.asarray(img, jnp.float32)
    H, W = img.shape
    dets = []
    rh, rw = model.root.shape[:2]
    for s in scales:
        h, w = int(H * s), int(W * s)
        if h // CELL - 1 < rh + 2 or w // CELL - 1 < rw + 2:
            continue
        im = resize(img, (h, w)) if s != 1.0 else img
        feat = _features(im)
        sc = np.asarray(score_scale(feat, model, max_disp))
        ys, xs = np.where(sc > score_thresh)
        for y, x in zip(ys, xs):
            dets.append((y * CELL / s, x * CELL / s, s, float(sc[y, x])))
    # greedy NMS by score
    dets.sort(key=lambda d: -d[3])
    out = []
    r = nms_radius_cells * CELL
    for d in dets:
        if all(abs(d[0] - o[0]) > r or abs(d[1] - o[1]) > r for o in out):
            out.append(d)
    return out
