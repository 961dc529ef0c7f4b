"""Fiducial dictionary generation, rendering, and detection."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from opencv_contrib_tpu.mvg import homography as hmod
from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.ops.image import sample_bilinear


def _rotations(code: np.ndarray):
    return [np.rot90(code, k) for k in range(4)]


def generate_dictionary(n_markers: int = 16, bits: int = 4, min_dist: int = 4, seed: int = 7):
    """Random dictionary with pairwise (rotation-minimal) Hamming distance
    >= min_dist — the generation recipe of cv::aruco::Dictionary."""
    rng = np.random.default_rng(seed)
    codes = []
    tries = 0
    while len(codes) < n_markers and tries < 20000:
        tries += 1
        cand = rng.integers(0, 2, size=(bits, bits)).astype(np.uint8)
        ok = True
        # self-rotation distinctness (so orientation is decodable)
        for k in range(1, 4):
            if np.sum(cand != np.rot90(cand, k)) < 1:
                ok = False
                break
        for c in codes:
            d = min(np.sum(r != cand) for r in _rotations(c))
            if d < min_dist:
                ok = False
                break
        if ok:
            codes.append(cand)
    if len(codes) < n_markers:
        raise RuntimeError("dictionary generation failed; lower min_dist")
    return np.stack(codes)


def draw_marker(dictionary: np.ndarray, marker_id: int, size_px: int = 64) -> np.ndarray:
    """Render marker `marker_id` with 1-module black border (white = 1.0)."""
    code = dictionary[marker_id]
    bits = code.shape[0]
    n = bits + 2
    grid = np.zeros((n, n), np.float32)
    grid[1:-1, 1:-1] = code
    cell = size_px // n
    img = np.kron(grid, np.ones((cell, cell), np.float32))
    return img


def _find_quads(binary: np.ndarray, min_area: int = 100, max_area_frac: float = 0.9):
    """Candidate quads from connected components of the dark regions:
    corners = extremes of x+y / x-y within each component (host-side)."""
    from scipy import ndimage

    lab, n = ndimage.label(binary)
    quads = []
    H, W = binary.shape
    for i in range(1, n + 1):
        ys, xs = np.nonzero(lab == i)
        if len(ys) < min_area or len(ys) > max_area_frac * H * W:
            continue
        s = ys + xs
        d = ys - xs
        # corner order: TL, TR, BR, BL (in image coords)
        tl = np.array([ys[s.argmin()], xs[s.argmin()]])
        br = np.array([ys[s.argmax()], xs[s.argmax()]])
        tr = np.array([ys[d.argmin()], xs[d.argmin()]])
        bl = np.array([ys[d.argmax()], xs[d.argmax()]])
        quad = np.stack([tl, tr, br, bl]).astype(np.float32)
        # basic quad sanity: corners distinct and area consistent
        e = np.linalg.norm(np.roll(quad, -1, 0) - quad, axis=1)
        if e.min() < 4:
            continue
        quads.append(quad)
    return quads


def detect_markers(img, dictionary: np.ndarray, bits_per_side: int | None = None, thresh_C: float = 0.05):
    """Detect markers -> (ids list, corners list of (4, 2) [y, x] arrays).

    detectMarkers contract: adaptive threshold -> candidate quads ->
    perspective unwarp -> bit sampling -> dictionary lookup over rotations.
    """
    img = jnp.asarray(img, jnp.float32)
    if bits_per_side is None:
        bits_per_side = dictionary.shape[1]
    n = bits_per_side + 2

    # adaptive threshold (device): dark = below local mean - C
    local = filters.box_filter(img, 15)
    binary = np.asarray(img < (local - thresh_C))

    quads = _find_quads(binary)
    ids, corners = [], []
    # canonical sampling grid (cell centers) in marker coords
    size = 8 * n
    for quad in quads:
        # homography canonical -> image: src corners of canonical square
        src = jnp.asarray(
            np.array([[0, 0], [0, size], [size, size], [size, 0]], np.float32)[:, ::-1]
        )  # as (x, y)
        dst = jnp.asarray(quad[:, ::-1])  # (x, y)
        Hm = hmod.dlt(src, dst)
        # sample cell centers
        cs = (np.arange(n) + 0.5) * 8
        gx, gy = np.meshgrid(cs, cs)
        pts = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], axis=1).astype(np.float32))
        ph = jnp.concatenate([pts, jnp.ones((pts.shape[0], 1))], axis=1)
        q = ph @ Hm.T
        q = q[:, :2] / q[:, 2:]
        vals = np.asarray(sample_bilinear(img, q[:, 1], q[:, 0])).reshape(n, n)
        # threshold bits at the mid-level of this patch
        t = (vals.min() + vals.max()) / 2.0
        grid = (vals > t).astype(np.uint8)
        # border must be black
        border = np.concatenate([grid[0], grid[-1], grid[1:-1, 0], grid[1:-1, -1]])
        if border.sum() > 1:
            continue
        code = grid[1:-1, 1:-1]
        found = None
        for mid in range(dictionary.shape[0]):
            for k in range(4):
                if np.array_equal(np.rot90(dictionary[mid], k), code):
                    found = (mid, k)
                    break
            if found:
                break
        if found:
            ids.append(found[0])
            corners.append(quad)
    return ids, corners
