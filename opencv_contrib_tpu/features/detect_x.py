"""Additional xfeatures2d detectors: StarDetector (CenSurE-class), MSD,
Harris-Laplace, TBMR-class affine regions, and second-moment affine
adaptation.

Parity targets:
- StarDetector (xfeatures2d/src/stardetector.cpp): bi-level
  center-surround filters across a size ladder on integral images, scale
  NMS + line suppression. The reference's star shape = box + 45°-rotated
  box; we use the box component (same detector family) — responses come
  from STATIC slices of one padded integral image (the TPU-fast form, see
  detect._box_map).
- MSD (xfeatures2d/src/msd.cpp): Maximal Self-Dissimilarity — saliency =
  minimal patch SSD against a surrounding search ring; keypoints at
  saliency maxima. Each ring shift is a static roll + O(1) box filter.
- Harris-Laplace (xfeatures2d/src/harris_lapace_detector.cpp): Harris
  spatial maxima whose normalized-LoG response peaks across scale.
- TBMR (xfeatures2d/src/tbmr.cpp) + affine_feature2d/ellipticKeyPoint:
  affine-covariant regions from the level-set component tree with
  moment-fitted ellipses (shares the MSER machinery: vmapped
  connected-component labeling; per-component moments via one matmul).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from opencv_contrib_tpu.features.detect import (
    _box_map,
    _padded_integral,
    _topk_2stage,
    assign_orientation,
)
from opencv_contrib_tpu.features.keypoints import Keypoints
from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.ops import integral as integ
from opencv_contrib_tpu.ops.ccl import connected_components
from opencv_contrib_tpu.ops.image import sample_bilinear_multi


# ----------------------------------------------------------------------------
# StarDetector (CenSurE-class)
# ----------------------------------------------------------------------------

_STAR_SIZES = (4, 6, 8, 11, 16, 22, 32)


@partial(jax.jit, static_argnames=("max_keypoints", "sizes"))
def star_detector(
    img: jnp.ndarray,
    max_keypoints: int = 256,
    response_threshold: float = 30.0,
    line_threshold: float = 10.0,
    sizes: tuple = _STAR_SIZES,
) -> Keypoints:
    """CenSurE-class center-surround detector. Returns top-k keypoints with
    scale = matched filter size and line-suppression applied (the
    reference's lineThresholdProjected criterion on the response map)."""
    H, W = img.shape
    P = _padded_integral(img)

    def cs_response(n):
        # inner box (2n+1)^2 vs surround ring ((4n+1)^2 minus inner)
        inner = _box_map(P, H, W, -n, n + 1, -n, n + 1)
        outer = _box_map(P, H, W, -2 * n, 2 * n + 1, -2 * n, 2 * n + 1)
        a_in = (2 * n + 1) ** 2
        a_out = (4 * n + 1) ** 2 - a_in
        r = inner / a_in - (outer - inner) / a_out
        y = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        m = 2 * n + 1
        inside = (y >= m) & (y < H - m) & (x >= m) & (x < W - m)
        return jnp.where(inside, r, 0.0)

    maps = jnp.stack([cs_response(n) for n in sizes])  # (S, H, W)
    amaps = jnp.abs(maps)
    neigh = jax.lax.reduce_window(amaps, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME")
    is_max = (amaps >= neigh) & (amaps > response_threshold)

    # line suppression: Harris ratio criterion on each response map
    def line_ok(m):
        gy, gx = filters.gradients(m)
        sxx = filters.box_filter(gx * gx, 2)
        syy = filters.box_filter(gy * gy, 2)
        sxy = filters.box_filter(gx * gy, 2)
        tr = sxx + syy
        det = sxx * syy - sxy * sxy
        return tr * tr < line_threshold * jnp.maximum(det, 1e-12)

    ok_line = jax.vmap(line_ok)(maps)
    resp = jnp.where(is_max & ok_line, amaps, -jnp.inf)

    S = len(sizes)
    ly = jax.lax.broadcasted_iota(jnp.float32, (S, H, W), 1).reshape(-1)
    lx = jax.lax.broadcasted_iota(jnp.float32, (S, H, W), 2).reshape(-1)
    sz = jnp.repeat(jnp.asarray(sizes, jnp.float32), H * W)
    top_r, top_i = _topk_2stage(resp.reshape(-1), max_keypoints)
    valid = jnp.isfinite(top_r)
    return Keypoints(
        y=jnp.where(valid, ly[top_i], 0.0),
        x=jnp.where(valid, lx[top_i], 0.0),
        scale=jnp.where(valid, sz[top_i] / 2.0, 1.0),
        angle=jnp.zeros(max_keypoints, jnp.float32),
        response=jnp.where(valid, top_r, 0.0),
        valid=valid,
    )


# ----------------------------------------------------------------------------
# MSD — Maximal Self-Dissimilarity
# ----------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("max_keypoints", "patch_radius", "search_radius"))
def msd_detector(
    img: jnp.ndarray,
    max_keypoints: int = 256,
    patch_radius: int = 3,
    search_radius: int = 5,
    saliency_threshold: float = 0.0,
) -> Keypoints:
    """MSD: saliency(p) = min over ring shifts d (|d| in (patch_radius,
    search_radius]) of SSD(patch(p), patch(p+d)); keypoints at 3x3 spatial
    maxima of saliency (msd.cpp contextualSelfDissimilarity). Every shift
    is a static roll; every SSD map an O(1)/px box filter."""
    H, W = img.shape
    sal = jnp.full((H, W), jnp.inf)
    for dy in range(-search_radius, search_radius + 1):
        for dx in range(-search_radius, search_radius + 1):
            rr = dy * dy + dx * dx
            if rr <= patch_radius * patch_radius or rr > search_radius * search_radius:
                continue
            diff = img - jnp.roll(img, (dy, dx), (0, 1))
            ssd = filters.box_filter(diff * diff, patch_radius) * (2 * patch_radius + 1) ** 2
            sal = jnp.minimum(sal, ssd)
    margin = search_radius + patch_radius + 1
    y = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inside = (y >= margin) & (y < H - margin) & (x >= margin) & (x < W - margin)
    sal = jnp.where(inside, sal, 0.0)
    neigh = jax.lax.reduce_window(sal, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    resp = jnp.where((sal >= neigh) & (sal > saliency_threshold), sal, -jnp.inf)
    top_r, top_i = _topk_2stage(resp.reshape(-1), max_keypoints)
    valid = jnp.isfinite(top_r)
    return Keypoints(
        y=jnp.where(valid, (top_i // W).astype(jnp.float32), 0.0),
        x=jnp.where(valid, (top_i % W).astype(jnp.float32), 0.0),
        scale=jnp.full(max_keypoints, float(patch_radius), jnp.float32),
        angle=jnp.zeros(max_keypoints, jnp.float32),
        response=jnp.where(valid, top_r, 0.0),
        valid=valid,
    )


# ----------------------------------------------------------------------------
# Harris-Laplace
# ----------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("max_keypoints", "n_scales"))
def harris_laplace(
    img: jnp.ndarray,
    max_keypoints: int = 256,
    n_scales: int = 6,
    corner_threshold: float = 1e-2,
    k: float = 0.04,
) -> Keypoints:
    """Harris corners with automatic scale selection: spatial Harris maxima
    whose scale-normalized |LoG| peaks across adjacent scales
    (harris_lapace_detector.cpp). Scale ladder sigma_i = 1.5^i."""
    H, W = img.shape
    sigmas = [1.5**i for i in range(n_scales)]

    harris_maps, log_maps = [], []
    for s in sigmas:
        sm = filters.fast_gaussian_blur(img, 0.7 * s)
        gy, gx = filters.gradients(sm)
        w = lambda m: filters.fast_gaussian_blur(m, s)
        sxx, syy, sxy = w(gx * gx), w(gy * gy), w(gx * gy)
        R = (sxx * syy - sxy * sxy) - k * (sxx + syy) ** 2
        harris_maps.append(R * s**2)  # scale-normalized
        sm_i = filters.fast_gaussian_blur(img, s)
        log_maps.append((s**2) * jnp.abs(filters.laplacian(sm_i)))
    Rm = jnp.stack(harris_maps)  # (S, H, W)
    Lm = jnp.stack(log_maps)

    # spatial 3x3 NMS per scale
    neigh = jax.lax.reduce_window(Rm, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME")
    rmax = Rm.max()
    sp_max = (Rm >= neigh) & (Rm > corner_threshold * jnp.maximum(rmax, 1e-12))
    # scale max of LoG (middle scales)
    lup = jnp.roll(Lm, 1, 0)
    ldn = jnp.roll(Lm, -1, 0)
    sc_max = (Lm >= lup) & (Lm >= ldn)
    sc_max = sc_max.at[0].set(False).at[-1].set(False)

    resp = jnp.where(sp_max & sc_max, Rm, -jnp.inf)
    S = len(sigmas)
    ly = jax.lax.broadcasted_iota(jnp.float32, (S, H, W), 1).reshape(-1)
    lx = jax.lax.broadcasted_iota(jnp.float32, (S, H, W), 2).reshape(-1)
    ss = jnp.repeat(jnp.asarray(sigmas, jnp.float32), H * W)
    top_r, top_i = _topk_2stage(resp.reshape(-1), max_keypoints)
    valid = jnp.isfinite(top_r)
    kps = Keypoints(
        y=jnp.where(valid, ly[top_i], 0.0),
        x=jnp.where(valid, lx[top_i], 0.0),
        scale=jnp.where(valid, ss[top_i], 1.0),
        angle=jnp.zeros(max_keypoints, jnp.float32),
        response=jnp.where(valid, top_r, 0.0),
        valid=valid,
    )
    return assign_orientation(integ.integral(img), kps)


# ----------------------------------------------------------------------------
# TBMR-class affine regions + elliptic keypoints
# ----------------------------------------------------------------------------


class EllipticKeypoints(NamedTuple):
    """Affine-covariant regions (ellipticKeyPoint.cpp analog): center +
    ellipse (major/minor axis, orientation) fitted from region moments."""

    y: jnp.ndarray  # (K,)
    x: jnp.ndarray
    a: jnp.ndarray  # major semi-axis
    b: jnp.ndarray  # minor semi-axis
    angle: jnp.ndarray  # major-axis orientation
    response: jnp.ndarray
    valid: jnp.ndarray


@partial(jax.jit, static_argnames=("max_components",))
def _component_moments(labels: jnp.ndarray, max_components: int = 64):
    """Per-component raw moments via one-hot MATMUL (rows = onehot(label)):
    returns (area, cy, cx, cyy, cxx, cxy) each (C,)."""
    H, W = labels.shape
    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0).reshape(-1)
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1).reshape(-1)
    feats = jnp.stack([jnp.ones_like(y), y, x, y * y, x * x, y * x], 1)  # (HW, 6)
    oh = jax.nn.one_hot(labels.reshape(-1), max_components, dtype=jnp.float32)
    sums = jnp.dot(oh.T, feats, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)  # (C, 6)
    area = sums[:, 0]
    az = jnp.maximum(area, 1.0)
    cy, cx = sums[:, 1] / az, sums[:, 2] / az
    cyy = sums[:, 3] / az - cy * cy
    cxx = sums[:, 4] / az - cx * cx
    cxy = sums[:, 5] / az - cy * cx
    return area, cy, cx, cyy, cxx, cxy


def tbmr(
    img: jnp.ndarray,
    max_regions: int = 64,
    n_levels: int = 16,
    min_area: int = 30,
    max_area_frac: float = 0.2,
) -> EllipticKeypoints:
    """TBMR-class affine regions: extremal regions from BOTH polarities of
    the level-set tree, moment-fitted ellipses, largest-stability
    selection. (tbmr.cpp selects tree nodes with one child — we select
    area-stable nodes, the same affine-covariant output contract.)"""
    img = jnp.asarray(img, jnp.float32)
    H, W = img.shape
    maxc = max_regions
    lo, hi = float(img.min()), float(img.max())
    ths = np.linspace(lo + 0.1 * (hi - lo), hi - 0.1 * (hi - lo), n_levels)

    @jax.jit
    def level(mask):
        labels, _ = connected_components(mask, connectivity=4)
        # compress label ids into [0, maxc): rank by first occurrence
        u = jnp.unique(labels, size=maxc, fill_value=-1)
        comp = (labels[None] == u[:, None, None]).argmax(0)
        comp = jnp.where(labels < 0, maxc - 1, comp)  # background slot
        return _component_moments(comp, maxc), (u >= 0)

    recs = []
    for t in ths:
        for mask in (img <= t, img >= t):
            (area, cy, cx, cyy, cxx, cxy), okc = level(mask)
            area = np.asarray(area)
            ok = np.asarray(okc) & (area >= min_area) & (area <= max_area_frac * H * W)
            for i in np.where(ok)[0]:
                recs.append((float(area[i]), float(cy[i]), float(cx[i]),
                             float(cyy[i]), float(cxx[i]), float(cxy[i])))
    # dedupe by center proximity + area similarity, keep up to max_regions
    recs.sort(key=lambda r: -r[0])
    kept = []
    for r in recs:
        if len(kept) >= max_regions:
            break
        if all((r[1] - k[1]) ** 2 + (r[2] - k[2]) ** 2 > 16 or abs(r[0] - k[0]) > 0.3 * k[0]
               for k in kept):
            kept.append(r)
    K = max_regions
    out = np.zeros((K, 7), np.float32)
    for i, (ar, cy, cx, cyy, cxx, cxy) in enumerate(kept):
        cov = np.array([[cxx, cxy], [cxy, cyy]])
        evals, evecs = np.linalg.eigh(cov)
        a = 2.0 * np.sqrt(max(evals[1], 1e-6))
        b = 2.0 * np.sqrt(max(evals[0], 1e-6))
        ang = np.arctan2(evecs[1, 1], evecs[0, 1])
        out[i] = (cy, cx, a, b, ang, ar, 1.0)
    return EllipticKeypoints(
        y=jnp.asarray(out[:, 0]), x=jnp.asarray(out[:, 1]),
        a=jnp.asarray(out[:, 2]), b=jnp.asarray(out[:, 3]),
        angle=jnp.asarray(out[:, 4]), response=jnp.asarray(out[:, 5]),
        valid=jnp.asarray(out[:, 6] > 0),
    )


@partial(jax.jit, static_argnames=("n_samples",))
def affine_adapt(img: jnp.ndarray, kps: Keypoints, n_samples: int = 16) -> EllipticKeypoints:
    """Second-moment affine adaptation (affine_feature2d.cpp): estimate the
    gradient second-moment matrix in a Gaussian window at each keypoint's
    scale; the ellipse is its inverse square root (isotropy transform)."""
    g = filters.gaussian_blur(img, 1.0)
    gy, gx = filters.gradients(g)
    n = n_samples
    u = (jnp.arange(n, dtype=jnp.float32) - n / 2 + 0.5) * (6.0 / n)
    gyy, gxx = jnp.meshgrid(u, u, indexing="ij")
    w = jnp.exp(-(gxx**2 + gyy**2) / 2.0).reshape(-1)

    px = kps.x[:, None] + kps.scale[:, None] * gxx.reshape(-1)[None]
    py = kps.y[:, None] + kps.scale[:, None] * gyy.reshape(-1)[None]
    sgx, sgy = sample_bilinear_multi(jnp.stack([gx, gy]), py, px)  # (K, n*n)
    sxx = (w[None] * sgx * sgx).sum(-1)
    syy = (w[None] * sgy * sgy).sum(-1)
    sxy = (w[None] * sgx * sgy).sum(-1)
    tr = sxx + syy
    det = jnp.maximum(sxx * syy - sxy * sxy, 1e-12)
    # eigenvalues of the 2x2 second-moment matrix
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4 - det, 0.0))
    l1 = tr / 2 + disc
    l2 = jnp.maximum(tr / 2 - disc, 1e-12)
    # ellipse axes ∝ 1/sqrt(lambda), normalized so sqrt(a*b) = scale
    a_r = 1.0 / jnp.sqrt(l2)
    b_r = 1.0 / jnp.sqrt(l1)
    s = kps.scale / jnp.sqrt(a_r * b_r)
    ang = 0.5 * jnp.arctan2(2 * sxy, sxx - syy) + jnp.pi / 2  # minor-curvature dir
    return EllipticKeypoints(
        y=kps.y, x=kps.x, a=a_r * s, b=b_r * s, angle=ang,
        response=kps.response, valid=kps.valid,
    )
