"""EDLines / EDCircles: line and circle primitives from edge segments.

Reference anchors: ximgproc/src/edge_drawing.cpp (EdgeDrawing: anchor
points + gradient-guided edge walking -> segments; EDLines least-squares
line fits with NFA validation; EDCircles arc joining + algebraic circle
fits).

TPU-first: the reference's sequential pixel walks become connected
components of the NMS edge mask (ops.ccl min-label flooding); per-component
line/circle fits are closed-form least squares over segment-summed moments
— every component is fitted simultaneously from one pass of scatter-adds.
Validation (straightness / circle residual) replaces the NFA test with the
same role: reject components that do not fit their primitive.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from opencv_contrib_tpu.ops.ccl import connected_components
from opencv_contrib_tpu.text.swt import _edges


@partial(jax.jit, static_argnames=("max_components",))
def _component_moments(img, max_components: int = 256):
    """Edge mask -> per-component first/second moments + endpoints."""
    edge, gy, gx, mag = _edges(img)
    labels, _ = connected_components(edge, connectivity=8)
    H, W = img.shape
    flat = labels.reshape(-1)
    fg = flat >= 0
    idx = jnp.arange(H * W, dtype=jnp.int32)
    is_root = fg & (flat == idx)
    rank = jnp.cumsum(is_root.astype(jnp.int32)) - 1
    comp_of_root = jnp.where(is_root, rank, 0)
    cid = jnp.where(fg, comp_of_root[jnp.where(fg, flat, 0)], max_components)
    cid = jnp.minimum(cid, max_components)

    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
    y, x = yy.reshape(-1), xx.reshape(-1)
    one = fg.astype(jnp.float32)

    def acc(v):
        return jnp.zeros(max_components + 1).at[cid].add(jnp.where(fg, v, 0.0))[:max_components]

    n = acc(one)
    sy, sx = acc(y), acc(x)
    syy, sxx, sxy = acc(y * y), acc(x * x), acc(x * y)
    syyy = acc(y * (y * y + x * x))
    sxxx = acc(x * (y * y + x * x))
    srr = acc(y * y + x * x)
    return dict(n=n, sy=sy, sx=sx, syy=syy, sxx=sxx, sxy=sxy,
                syr=syyy, sxr=sxxx, srr=srr)


def ed_lines(img, min_length: int = 12, max_fit_err: float = 1.0, max_components: int = 256):
    """Line segments from edge components: PCA line fit per component,
    accepted when the RMS point-line distance is small (EDLines' role).
    Returns (N, 5) [y0, x0, y1, x1, rms_err] numpy."""
    img = jnp.asarray(img, jnp.float32)
    m = {k: np.asarray(v) for k, v in _component_moments(img, max_components).items()}
    n = m["n"]
    ok = n >= min_length
    out = []
    for i in np.where(ok)[0]:
        ni = n[i]
        cy, cx = m["sy"][i] / ni, m["sx"][i] / ni
        cyy = m["syy"][i] / ni - cy * cy
        cxx = m["sxx"][i] / ni - cx * cx
        cxy = m["sxy"][i] / ni - cx * cy
        C = np.array([[cyy, cxy], [cxy, cxx]])
        evals, evecs = np.linalg.eigh(C)
        rms = float(np.sqrt(max(evals[0], 0.0)))  # perpendicular spread
        if rms > max_fit_err:
            continue
        d = evecs[:, 1]  # principal direction (y, x)
        half = 2.0 * np.sqrt(max(evals[1], 0.0))
        p0 = np.array([cy, cx]) - d * half
        p1 = np.array([cy, cx]) + d * half
        out.append([p0[0], p0[1], p1[0], p1[1], rms])
    return np.asarray(out).reshape(-1, 5)


def ed_circles(img, min_points: int = 16, max_centroid_offset: float = 0.3,
               max_components: int = 256):
    """Circles from edge components via the Kasa algebraic fit on the
    component moments (EDCircles' role). Validation: a full circle's pixel
    centroid coincides with the fitted center (offset ~0), while lines and
    short arcs put the centroid ~r away — the closed-form analog of the
    reference's arc-coverage check. Returns (N, 3) [cy, cx, r] numpy."""
    img = jnp.asarray(img, jnp.float32)
    m = {k: np.asarray(v) for k, v in _component_moments(img, max_components).items()}
    n = m["n"]
    Hd = float(np.hypot(*img.shape))
    out = []
    for i in np.where(n >= min_points)[0]:
        ni = n[i]
        # Kasa fit: y^2 + x^2 = 2 cy y + 2 cx x + (r^2 - cy^2 - cx^2)
        A = np.array([
            [m["syy"][i], m["sxy"][i], m["sy"][i]],
            [m["sxy"][i], m["sxx"][i], m["sx"][i]],
            [m["sy"][i], m["sx"][i], ni],
        ])
        A[:, :2] *= 2.0  # the (cy, cx) columns carry the factor 2
        rhs = np.array([m["syr"][i], m["sxr"][i], m["srr"][i]])
        try:
            cy, cx, c0 = np.linalg.solve(A, rhs)
        except np.linalg.LinAlgError:
            continue
        r2 = c0 + cy * cy + cx * cx
        if r2 <= 0:
            continue
        r = np.sqrt(r2)
        centroid = np.array([m["sy"][i] / ni, m["sx"][i] / ni])
        offset = np.linalg.norm(centroid - [cy, cx])
        if r > Hd or offset > max_centroid_offset * r:
            continue
        out.append([cy, cx, r])
    return np.asarray(out).reshape(-1, 3)
