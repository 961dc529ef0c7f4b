"""Macbeth ColorChecker chart detection.

Reference anchor: mcc/src/checker_detector.cpp (CCheckerDetector::process:
adaptive threshold -> contour candidates -> grid assembly by cell geometry
-> color validation against the reference chart). mcc.hpp:129.

TPU-first: the thresholding/labeling runs on device (ops.ccl); candidate
cells are scored in one batched pass; the 4x6 grid assembly is small host
geometry like the reference's.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from opencv_contrib_tpu.mcc.ccm import MACBETH_SRGB
from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.ops.ccl import component_stats, connected_components


def find_chart_cells(img_gray, min_area: int = 30, max_components: int = 256):
    """Candidate chart cells: near-rectangular connected components of the
    dark-edge-separated regions. Returns (centers (N, 2), boxes (N, 4))."""
    g = jnp.asarray(img_gray, jnp.float32)
    # cells are separated by dark gutters: threshold above the local mean
    local = filters.box_filter(g, 9)
    mask = g > local + 0.01
    labels, _ = connected_components(mask, connectivity=4)
    st = component_stats(labels, max_components=max_components)
    area = np.asarray(st["area"])
    y0, x0 = np.asarray(st["y0"]), np.asarray(st["x0"])
    y1, x1 = np.asarray(st["y1"]), np.asarray(st["x1"])
    h, w = y1 - y0 + 1, x1 - x0 + 1
    fill = area / np.maximum(h * w, 1)
    keep = np.asarray(st["valid"]) & (area >= min_area) & (fill > 0.7) & (
        np.maximum(h / np.maximum(w, 1), w / np.maximum(h, 1)) < 2.0)
    y0, x0, y1, x1 = y0[keep], x0[keep], y1[keep], x1[keep]  # drop inf rows first
    centers = np.stack([(y0 + y1) / 2, (x0 + x1) / 2], 1)
    boxes = np.stack([y0, x0, y1, x1], 1)
    return centers, boxes


def detect_chart(img_rgb, min_cells: int = 18):
    """Detect a 4x6 ColorChecker. Returns (patch_colors (24, 3) row-major or
    None, cell_centers). Grid assembly: cluster cell centers into 4 rows x
    6 cols by sorted coordinates (checker_detector.cpp's graph-based
    assembly reduced to the axis-aligned case)."""
    img = np.asarray(img_rgb, np.float32)
    gray = img.mean(-1)
    centers, boxes = find_chart_cells(gray)
    if centers.shape[0] < min_cells:
        return None, centers
    # median cell pitch
    ys = np.sort(np.unique(np.round(centers[:, 0]).astype(int)))
    # cluster rows: split where the gap is > half the median gap
    order = np.argsort(centers[:, 0])
    cy = centers[order, 0]
    gaps = np.diff(cy)
    big = gaps > max(np.median(gaps) * 3, 4)
    row_id = np.concatenate([[0], np.cumsum(big)])
    rows = {}
    for idx, r in zip(order, row_id):
        rows.setdefault(r, []).append(idx)
    if len(rows) != 4:
        return None, centers
    grid = []
    for r in sorted(rows, key=lambda r: centers[rows[r], 0].mean()):
        members = rows[r]
        if len(members) != 6:
            return None, centers
        members = sorted(members, key=lambda i: centers[i, 1])
        grid.append(members)
    # sample mean color inside each cell
    colors = []
    for row in grid:
        for i in row:
            b = boxes[i].astype(int)
            cell = img[b[0] + 2 : b[2] - 1, b[1] + 2 : b[3] - 1]
            colors.append(cell.reshape(-1, 3).mean(0))
    return np.asarray(colors, np.float32), centers


def detect_and_fit_ccm(img_rgb):
    """One-call pipeline: detect the chart and fit the color-correction
    matrix against the Macbeth reference (the reference's detector+CCM
    composition). Returns (M, measured) or (None, None)."""
    from opencv_contrib_tpu.mcc.ccm import fit_ccm

    measured, _ = detect_chart(img_rgb)
    if measured is None:
        return None, None
    M = fit_ccm(jnp.asarray(measured), jnp.asarray(MACBETH_SRGB))
    return M, measured
