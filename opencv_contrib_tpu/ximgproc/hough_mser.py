"""Hough circles, full-hysteresis Canny, and MSER regions.

Reference anchors (cudaimgproc):
- HoughCirclesDetector (cudaimgproc/src/cuda/hough_circles.cu): gradient-
  directed center voting + radius histogram per center.
- Canny (cudaimgproc/src/cuda/canny.cu): Sobel -> NMS -> double threshold
  -> hysteresis BFS.
- MSER (cudaimgproc MSER_CUDA / core mser.cpp): extremal regions stable
  across thresholds.

TPU-first: circle voting scatters along each edge pixel's gradient ray in
one batched pass; Canny's hysteresis BFS becomes iterative max-flooding of
the strong mask through the weak mask (ops.ccl-style fixed-point); MSER
reuses the vmapped per-level component labeling from text.er and keeps
components whose area is stable across neighboring levels.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.ops.ccl import component_stats, connected_components
from opencv_contrib_tpu.text.swt import _edges


@jax.jit
def canny(img, low: float = 0.08, high: float = 0.2):
    """Full Canny: gradient NMS + double threshold + hysteresis. The BFS of
    canny.cu becomes connected-component labeling of the weak mask (min-
    label flooding with pointer jumping, O(log diameter) passes) — a weak
    pixel survives iff its component contains a strong pixel."""
    nms, gy, gx, mag = _edges(jnp.asarray(img, jnp.float32), low=low, high=low)
    weak = nms & (mag > low)
    strong = nms & (mag > high)
    H, W = mag.shape
    labels, _ = connected_components(weak, connectivity=8)
    flat = labels.reshape(-1)
    safe = jnp.where(flat >= 0, flat, 0)
    has_strong = jnp.zeros(H * W, bool).at[jnp.where(strong.reshape(-1), safe, 0)].set(
        strong.reshape(-1), mode="drop")
    return weak & has_strong[safe].reshape(H, W)


@partial(jax.jit, static_argnames=("n_radii",))
def hough_circles_accumulator(img, r_min: float = 8.0, r_max: float = 24.0,
                              n_radii: int = 16, mag_thresh: float = 0.1):
    """Gradient-directed circle voting: each edge pixel votes for centers
    at +-r along its gradient for every quantized radius. Returns the
    (n_radii, H, W) accumulator."""
    g = filters.gaussian_blur(jnp.asarray(img, jnp.float32), 1.0)
    gy, gx = filters.gradients(g)
    mag = jnp.sqrt(gy * gy + gx * gx)
    inv = 1.0 / jnp.maximum(mag, 1e-9)
    dy, dx = gy * inv, gx * inv
    H, W = g.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    radii = jnp.linspace(r_min, r_max, n_radii)
    w = (mag > mag_thresh).astype(jnp.float32).reshape(-1)

    def one_radius(r):
        acc = jnp.zeros(H * W)
        for sgn in (1.0, -1.0):
            cy = jnp.clip(jnp.round(yy + sgn * r * dy), 0, H - 1).astype(jnp.int32)
            cx = jnp.clip(jnp.round(xx + sgn * r * dx), 0, W - 1).astype(jnp.int32)
            acc = acc.at[(cy * W + cx).reshape(-1)].add(w)
        return acc.reshape(H, W)

    return jax.vmap(one_radius)(radii), radii


def hough_circles(img, r_min: float = 8.0, r_max: float = 24.0, n_radii: int = 16,
                  vote_frac: float = 0.5, top_k: int = 8):
    """Detected circles (N, 3) [cy, cx, r] (HoughCirclesDetector::detect)."""
    acc, radii = hough_circles_accumulator(img, r_min, r_max, n_radii)
    a = np.asarray(acc)
    rads = np.asarray(radii)
    out = []
    thr = vote_frac * 2 * np.pi * rads  # votes ~ circumference when full circle present
    flat_order = np.argsort(-a, axis=None)
    taken = []
    for f in flat_order[: top_k * 20]:
        ri, y, x = np.unravel_index(f, a.shape)
        if a[ri, y, x] < thr[ri] * 0.25:
            break
        if any((y - t[0]) ** 2 + (x - t[1]) ** 2 < (0.5 * rads[ri]) ** 2 for t in taken):
            continue
        taken.append((y, x))
        out.append([float(y), float(x), float(rads[ri])])
        if len(out) >= top_k:
            break
    return np.asarray(out).reshape(-1, 3)


@partial(jax.jit, static_argnames=("n_levels", "max_components"))
def _level_areas(img, n_levels: int = 24, max_components: int = 128):
    lo, hi = img.min(), img.max()
    fr = (jnp.arange(1, n_levels + 1) / (n_levels + 1)).astype(img.dtype)
    ths = lo + fr * (hi - lo)

    def one(t):
        mask = img <= t
        labels, _ = connected_components(mask, connectivity=4)
        st = component_stats(labels, max_components=max_components)
        # centroid per component for cross-level association
        cy = (st["y0"] + st["y1"]) / 2.0
        cx = (st["x0"] + st["x1"]) / 2.0
        return st["area"], cy, cx, st["valid"]

    return jax.vmap(one)(ths)


def mser(img, n_levels: int = 24, max_components: int = 128, max_variation: float = 0.25,
         min_area: int = 20, max_area_frac: float = 0.25):
    """MSER regions: components whose area is stable (relative growth <
    max_variation) across adjacent threshold levels. Returns (N, 5) numpy
    [cy, cx, area, level, variation]."""
    img = jnp.asarray(img, jnp.float32)
    H, W = img.shape
    areas, cys, cxs, valids = (np.asarray(v) for v in _level_areas(img, n_levels, max_components))
    out = []
    for l in range(1, n_levels - 1):
        for i in np.where(valids[l])[0]:
            a, cy, cx = areas[l, i], cys[l, i], cxs[l, i]
            if a < min_area or a > max_area_frac * H * W:
                continue
            # associate with nearest component (by centroid) in l-1 / l+1
            def nearest(lvl):
                ok = valids[lvl]
                if not ok.any():
                    return None
                # invalid slots carry +-inf centroids -> sanitize before
                # arithmetic (inf - inf = nan would poison argmin)
                cyl = np.nan_to_num(cys[lvl], posinf=1e6, neginf=-1e6)
                cxl = np.nan_to_num(cxs[lvl], posinf=1e6, neginf=-1e6)
                d = np.where(ok, (cyl - cy) ** 2 + (cxl - cx) ** 2, np.inf)
                j = int(np.argmin(d))
                return areas[lvl, j] if d[j] < (0.1 * (H + W)) ** 2 else None

            am = nearest(l - 1)
            ap = nearest(l + 1)
            if am is None or ap is None:
                continue
            var = abs(ap - am) / max(a, 1.0)
            if var < max_variation:
                out.append([cy, cx, a, l, var])
    # dedupe near-identical regions across levels (keep min variation)
    out.sort(key=lambda r: r[4])
    kept = []
    for r in out:
        if all((r[0] - k[0]) ** 2 + (r[1] - k[1]) ** 2 > 25 or abs(r[2] - k[2]) > 0.3 * k[2]
               for k in kept):
            kept.append(r)
    return np.asarray(kept).reshape(-1, 5)
