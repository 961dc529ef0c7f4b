"""BING objectness proposals.

Reference anchor: saliency/src/BING/ (ObjectnessBING: 8x8 binarized normed
gradients scored by a learned linear template over windows of quantized
sizes; saliencySpecializedClasses.hpp:86-143).

TPU-first: the normed-gradient map is computed once; every window size is
resized to the canonical 8x8 via average pooling over an integral image
(static slices), and ALL windows of all sizes are scored by one dot with
the 8x8 template — the reference's SSE bitwise trick is replaced by the
VPU on dense floats (no need for the binary approximation on TPU).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ops import filters

TPL = 8  # canonical template size


def normed_gradients(img):
    gy, gx = filters.gradients(img)
    mag = jnp.sqrt(gx * gx + gy * gy)
    return mag / (mag.max() + 1e-9)


def default_template():
    """Center-surround objectness prior: objects have strong gradients
    along the window border (the learned BING template has this shape)."""
    t = np.zeros((TPL, TPL), np.float32)
    t[0, :] = t[-1, :] = t[:, 0] = t[:, -1] = 1.0
    t[1:-1, 1:-1] = -0.25
    return jnp.asarray(t / np.abs(t).sum())


def train_template(pos_windows, neg_windows, ridge: float = 1e-2):
    """Linear template from 8x8 normed-gradient windows (the reference's
    stage-1 SVM, trained here by ridge regression)."""
    X = np.concatenate([np.asarray(pos_windows), np.asarray(neg_windows)]).reshape(-1, TPL * TPL)
    y = np.concatenate([np.ones(len(pos_windows)), -np.ones(len(neg_windows))])
    w = np.linalg.solve(X.T @ X + ridge * np.eye(TPL * TPL), X.T @ y)
    return jnp.asarray(w.reshape(TPL, TPL).astype(np.float32))


@partial(jax.jit, static_argnames=("sizes", "stride"))
def score_windows(img, template, sizes=(16, 32, 64), stride: int = 8):
    """Score all windows of each size: returns list-of (ny, nx) score maps
    (stacked dict by size is static). Window -> 8x8 by box-average pooling
    on the integral image, then one template dot."""
    ng = normed_gradients(img)
    H, W = ng.shape
    ii = jnp.pad(jnp.cumsum(jnp.cumsum(ng, 0), 1), ((1, 0), (1, 0)))
    out = {}
    for size in sizes:
        cell = size // TPL
        ys = jnp.arange(0, H - size + 1, stride)
        xs = jnp.arange(0, W - size + 1, stride)

        def pooled(y0, x0):
            cy = y0 + jnp.arange(TPL + 1) * cell
            cx = x0 + jnp.arange(TPL + 1) * cell
            sub = ii[cy][:, cx]  # (9, 9)
            cells = sub[1:, 1:] - sub[:-1, 1:] - sub[1:, :-1] + sub[:-1, :-1]
            return (cells / (cell * cell) * template).sum()

        out[size] = jax.vmap(lambda y: jax.vmap(lambda x: pooled(y, x))(xs))(ys)
    return out


def objectness_boxes(img, template=None, sizes=(16, 32, 64), stride: int = 8, top_k: int = 16):
    """BING-style proposals: top-scoring windows across sizes.
    Returns (boxes (N, 4) [y0, x0, y1, x1], scores)."""
    if template is None:
        template = default_template()
    maps = score_windows(jnp.asarray(img, jnp.float32), template, sizes, stride)
    boxes, scores = [], []
    for size, m in maps.items():
        mn = np.asarray(m)
        ys, xs = np.unravel_index(np.argsort(-mn, axis=None)[: top_k // len(sizes) + 1], mn.shape)
        for y, x in zip(ys, xs):
            boxes.append([y * stride, x * stride, y * stride + size, x * stride + size])
            scores.append(float(mn[y, x]))
    order = np.argsort(-np.asarray(scores))[:top_k]
    return np.asarray(boxes)[order], np.asarray(scores)[order]
