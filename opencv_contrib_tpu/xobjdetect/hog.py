"""HOG descriptor + linear-SVM sliding-window detector.

Reference anchors: cudaobjdetect/src/hog.cpp + cuda/hog.cu (cuda::HOG:
compute_hists/normalize_hists/classify_hists kernels) and the classic
Dalal-Triggs layout: 8x8 cells, 9 unsigned orientation bins, 2x2-cell
blocks with L2-Hys normalization, 64x128 person window.

TPU-first: cell histograms for the WHOLE image come from one soft-binned
scatter (segment-sum over cell ids); block normalization is elementwise;
window descriptors are static slices of the cell grid; the SVM scoring of
all windows is a single matmul on the MXU (classify_hists' role).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from opencv_contrib_tpu.ops import filters

N_BINS = 9
CELL = 8


@partial(jax.jit, static_argnames=())
def cell_histograms(img):
    """(H/8, W/8, 9) soft-binned gradient-orientation cell histograms."""
    gy, gx = filters.gradients(img)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = (jnp.arctan2(gy, gx) + jnp.pi) % jnp.pi  # unsigned [0, pi)
    bin_f = ang / jnp.pi * N_BINS
    lo = jnp.floor(bin_f).astype(jnp.int32) % N_BINS
    hi = (lo + 1) % N_BINS
    w_hi = bin_f - jnp.floor(bin_f)
    H, W = img.shape
    hc, wc = H // CELL, W // CELL
    img_h, img_w = hc * CELL, wc * CELL

    def binmap(b, wgt):
        oh = jax.nn.one_hot(b[:img_h, :img_w], N_BINS, dtype=img.dtype) * (mag * wgt)[:img_h, :img_w, None]
        return oh.reshape(hc, CELL, wc, CELL, N_BINS).sum((1, 3))

    return binmap(lo, 1.0 - w_hi) + binmap(hi, w_hi)


@jax.jit
def block_descriptors(cells):
    """2x2-cell blocks, L2-Hys normalized: (hc-1, wc-1, 36)."""
    b = jnp.concatenate(
        [cells[:-1, :-1], cells[:-1, 1:], cells[1:, :-1], cells[1:, 1:]], axis=-1
    )  # (hc-1, wc-1, 36)
    n = jnp.sqrt((b * b).sum(-1, keepdims=True) + 1e-6)
    b = jnp.minimum(b / n, 0.2)
    n2 = jnp.sqrt((b * b).sum(-1, keepdims=True) + 1e-6)
    return b / n2


def window_descriptors(blocks, win_cells=(16, 8), stride_cells: int = 1):
    """All window descriptors from the block grid as static slices:
    returns (ny, nx, win_h-1, win_w-1, 36) -> flattened (ny*nx, D)."""
    hb, wb, D = blocks.shape
    wh, ww = win_cells[0] - 1, win_cells[1] - 1
    ny = (hb - wh) // stride_cells + 1
    nx = (wb - ww) // stride_cells + 1
    rows = []
    for iy in range(ny):
        cols = []
        for ix in range(nx):
            y0, x0 = iy * stride_cells, ix * stride_cells
            cols.append(blocks[y0 : y0 + wh, x0 : x0 + ww].reshape(-1))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows).reshape(ny * nx, -1), (ny, nx)


def hog_descriptor(img, win_cells=(16, 8)):
    """Single-window HOG descriptor of an image sized to the window
    (cuda::HOG::compute for one window)."""
    cells = cell_histograms(jnp.asarray(img, jnp.float32))
    blocks = block_descriptors(cells)
    return blocks.reshape(-1)


def detect_multiscale(img, svm_w, svm_b: float = 0.0, win_cells=(16, 8),
                      scales=(1.0, 0.84, 0.7), score_thresh: float = 0.0):
    """Multi-scale sliding-window SVM detection: one matmul per scale.
    Returns (boxes (N, 4) [y0, x0, y1, x1] in original coords, scores)."""
    from opencv_contrib_tpu.ops.image import resize

    img = jnp.asarray(img, jnp.float32)
    H, W = img.shape
    out_boxes, out_scores = [], []
    for s in scales:
        h, w = int(H * s), int(W * s)
        if h < win_cells[0] * CELL or w < win_cells[1] * CELL:
            continue
        im = resize(img, (h, w)) if s != 1.0 else img
        cells = cell_histograms(im)
        blocks = block_descriptors(cells)
        desc, (ny, nx) = window_descriptors(blocks, win_cells)
        scores = np.asarray(desc @ jnp.asarray(svm_w) + svm_b)
        keep = np.where(scores > score_thresh)[0]
        for k in keep:
            iy, ix = divmod(int(k), nx)
            y0, x0 = iy * CELL / s, ix * CELL / s
            out_boxes.append([y0, x0, y0 + win_cells[0] * CELL / s, x0 + win_cells[1] * CELL / s])
            out_scores.append(float(scores[k]))
    return np.asarray(out_boxes).reshape(-1, 4), np.asarray(out_scores)
