"""ximgproc transforms and detectors, part 2.

Reference anchors (ximgproc):
- radon_transform.cpp — RadonTransform
- peilin.cpp — PeiLinNormalization (moment-based affine normalization)
- color_match.cpp / quaternion.cpp — createQuaternionImage/qdft color matching
- estimated_covariance.cpp — covarianceEstimation (region covariance)
- run_length_morphology.cpp — fast large-SE erode/dilate (here: van Herk-style
  log-doubling min/max, the TPU-native way to make big structuring elements
  cheap instead of run-length encoding)
- scansegment.cpp — ScanSegment superpixels (grid-seeded local clustering)
- find_ellipses.cpp — ellipse detection (edge components + direct LSQ fit)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.ops.image import warp_affine


# ---------------------------------------------------------------------------
# Radon transform
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_angles",))
def radon_transform(img: jnp.ndarray, n_angles: int = 180,
                    start_deg: float = 0.0, end_deg: float = 180.0) -> jnp.ndarray:
    """Radon transform (parity: cv::ximgproc::RadonTransform,
    radon_transform.cpp): projections of the image onto lines at n_angles
    orientations. TPU formulation: one vmapped batch of rotations (bilinear
    warp_affine) followed by a column sum — the rotation batch is a single
    fused gather, the sums are dense reductions.

    Returns (n_angles, diag) sinogram."""
    import math
    H, W = img.shape
    diag = int(math.ceil(math.sqrt(H * H + W * W)))
    # pad to diag x diag centered
    py0 = (diag - H) // 2
    px0 = (diag - W) // 2
    canvas = jnp.zeros((diag, diag), img.dtype).at[py0:py0 + H, px0:px0 + W].set(img)

    thetas = jnp.deg2rad(jnp.linspace(start_deg, end_deg, n_angles, endpoint=False))
    c = (diag - 1) / 2.0

    def project(theta):
        ct, st = jnp.cos(theta), jnp.sin(theta)
        # rotate by -theta about center: A maps output coords -> input coords
        A = jnp.array([[ct, -st, c - ct * c + st * c],
                       [st, ct, c - st * c - ct * c]], jnp.float32)
        rot = warp_affine(canvas, A, (diag, diag))
        return rot.sum(axis=0)

    return jax.vmap(project)(thetas)


# ---------------------------------------------------------------------------
# Pei-Lin normalization
# ---------------------------------------------------------------------------


@jax.jit
def peilin_normalization(img: jnp.ndarray):
    """Pei-Lin image normalization (parity: cv::ximgproc::PeiLinNormalization,
    peilin.cpp): the affine transform W = sR(theta) Lambda^{-1/2} R(-phi)
    built from second/third central moments, making the image invariant to
    affine distortion. Returns the 2x3 matrix (output->input convention
    matching ops.image.warp_affine)."""
    f = img.astype(jnp.float32)
    H, W = f.shape
    ys, xs = jnp.mgrid[0:H, 0:W]
    m00 = f.sum() + 1e-9
    xc = (f * xs).sum() / m00
    yc = (f * ys).sum() / m00
    dx = xs - xc
    dy = ys - yc
    mu20 = (f * dx * dx).sum() / m00
    mu02 = (f * dy * dy).sum() / m00
    mu11 = (f * dx * dy).sum() / m00
    cov = jnp.array([[mu20, mu11], [mu11, mu02]])
    evals, evecs = jnp.linalg.eigh(cov)
    evals = jnp.maximum(evals, 1e-9)
    # whitening: E Lambda^{-1/2} E^T, scaled so area is preserved
    scale = jnp.sqrt(jnp.sqrt(evals[0] * evals[1]))
    Wm = evecs @ jnp.diag(scale / jnp.sqrt(evals)) @ evecs.T
    # third-moment tensor fixes the residual rotation
    wdx = Wm[0, 0] * dx + Wm[0, 1] * dy
    wdy = Wm[1, 0] * dx + Wm[1, 1] * dy
    mu30 = (f * wdx ** 3).sum() / m00
    mu12 = (f * wdx * wdy ** 2).sum() / m00
    mu21 = (f * wdx ** 2 * wdy).sum() / m00
    mu03 = (f * wdy ** 3).sum() / m00
    theta = jnp.arctan2(mu03 + mu21, mu30 + mu12)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    R = jnp.array([[ct, st], [-st, ct]])
    M = R @ Wm
    # output->input: invert and re-center
    Minv = jnp.linalg.inv(M)
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    t = jnp.array([xc, yc]) - Minv @ jnp.array([cx, cy])
    return jnp.concatenate([Minv, t[:, None]], axis=1)


# ---------------------------------------------------------------------------
# Quaternion color matching
# ---------------------------------------------------------------------------


@jax.jit
def color_match_template(img_rgb: jnp.ndarray, templ_rgb: jnp.ndarray) -> jnp.ndarray:
    """Quaternion cross-correlation of a color template (parity:
    cv::ximgproc::colorMatchTemplate, color_match.cpp): RGB pixels as pure
    quaternions (0, r, g, b); the correlation magnitude peaks where the
    template's full color structure matches. Computed as the 4 quaternion
    component correlations via real FFTs."""
    H, W = img_rgb.shape[:2]
    h, w = templ_rgb.shape[:2]
    img = img_rgb.astype(jnp.float32)
    tpl = templ_rgb.astype(jnp.float32)
    tnorm = tpl - tpl.mean(axis=(0, 1), keepdims=True)
    inorm = img - img.mean(axis=(0, 1), keepdims=True)

    pad = jnp.zeros((H, W, 3), jnp.float32).at[:h, :w].set(tnorm)
    Fi = jnp.fft.fft2(inorm, axes=(0, 1))
    Ft = jnp.fft.fft2(pad, axes=(0, 1))

    # quaternion product (0,a)*(0,b)^conj accumulates a.b (scalar) + a x b;
    # correlation response = |sum over pixels| of that product per shift
    scalar = jnp.real(jnp.fft.ifft2((Fi * jnp.conj(Ft)).sum(-1), axes=(0, 1)))
    cross = []
    for (i, j) in ((1, 2), (2, 0), (0, 1)):
        Cij = jnp.real(jnp.fft.ifft2(Fi[..., i] * jnp.conj(Ft[..., j])
                                     - Fi[..., j] * jnp.conj(Ft[..., i]), axes=(0, 1)))
        cross.append(Cij)
    mag = jnp.sqrt(scalar ** 2 + cross[0] ** 2 + cross[1] ** 2 + cross[2] ** 2)
    # normalized by template energy; the scalar part dominates for true match
    return mag / jnp.maximum((tnorm ** 2).sum(), 1e-9)


# ---------------------------------------------------------------------------
# Region covariance estimation
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("window",))
def covariance_estimation(img: jnp.ndarray, window: int = 7) -> jnp.ndarray:
    """Windowed covariance of the (I, |Ix|, |Iy|, x, y)-style feature vector
    (parity: cv::ximgproc::covarianceEstimation, estimated_covariance.cpp).
    Returns (H, W, d, d) covariance fields via box sums of feature products
    — d^2 separable box filters, all fused by XLA."""
    f = img.astype(jnp.float32)
    gy, gx = filters.gradients(f)
    H, W = f.shape
    ys, xs = jnp.mgrid[0:H, 0:W]
    feats = jnp.stack([f, gx, gy, xs.astype(jnp.float32) / W,
                       ys.astype(jnp.float32) / H], axis=-1)  # (H, W, 5)
    r = window // 2
    d = feats.shape[-1]
    means = jnp.stack([filters.box_filter(feats[..., i], r) for i in range(d)], -1)
    cov = jnp.zeros((H, W, d, d), jnp.float32)
    for i in range(d):
        for j in range(i, d):
            eij = filters.box_filter(feats[..., i] * feats[..., j], r)
            cij = eij - means[..., i] * means[..., j]
            cov = cov.at[..., i, j].set(cij)
            if i != j:
                cov = cov.at[..., j, i].set(cij)
    return cov


# ---------------------------------------------------------------------------
# Fast large-SE morphology (run-length module's role)
# ---------------------------------------------------------------------------


def _extreme_1d(x, radius: int, op):
    """Separable running min/max of total width 2*radius+1 by log-doubling
    shifted copies — O(log r) whole-image ops (the TPU replacement for
    run-length-encoded morphology, run_length_morphology.cpp)."""
    left = x
    right = x
    covered = 0
    step = 1
    while covered < radius:
        take = min(step, radius - covered)
        left = op(left, jnp.roll(left, take, 1))
        right = op(right, jnp.roll(right, -take, 1))
        covered += take
        step = take * 2
    return op(left, right)


def _morph2d(img, radius_y: int, radius_x: int, op, pad_val):
    H, W = img.shape
    x = jnp.pad(img, ((radius_y, radius_y), (radius_x, radius_x)), constant_values=pad_val)
    x = _extreme_1d(x, radius_x, op)
    x = _extreme_1d(x.T, radius_y, op).T
    return x[radius_y:radius_y + H, radius_x:radius_x + W]


def erode_fast(img: jnp.ndarray, radius_y: int = 5, radius_x: int = 5) -> jnp.ndarray:
    """Large-SE erosion in O(log r) passes (role of run_length_morphology's
    rl::erode for big rectangular structuring elements)."""
    return _morph2d(img, radius_y, radius_x, jnp.minimum, jnp.inf)


def dilate_fast(img: jnp.ndarray, radius_y: int = 5, radius_x: int = 5) -> jnp.ndarray:
    """Large-SE dilation in O(log r) passes (role of rl::dilate)."""
    return _morph2d(img, radius_y, radius_x, jnp.maximum, -jnp.inf)


# ---------------------------------------------------------------------------
# ScanSegment superpixels
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_superpixels", "n_iters"))
def scan_segment(img: jnp.ndarray, n_superpixels: int = 256,
                 n_iters: int = 4) -> jnp.ndarray:
    """ScanSegment-class superpixels (parity: cv::ximgproc::ScanSegment,
    scansegment.cpp): grid-seeded local color clustering. The reference
    parallelizes scanline runs per thread block; here every iteration is one
    dense assign step against the 9 neighboring seed candidates (static
    shift-stack) + one masked mean update — the same convergence behavior,
    fully vectorized."""
    H, W = img.shape[:2]
    f = img.astype(jnp.float32)
    if f.ndim == 2:
        f = f[..., None]
    gh = int(max(1, round((n_superpixels * H / W) ** 0.5)))
    gw = int(max(1, round(n_superpixels / gh)))
    K = gh * gw
    cy = (jnp.arange(gh) + 0.5) * H / gh
    cx = (jnp.arange(gw) + 0.5) * W / gw
    ys, xs = jnp.mgrid[0:H, 0:W]
    cell_y = jnp.clip((ys * gh) // H, 0, gh - 1)
    cell_x = jnp.clip((xs * gw) // W, 0, gw - 1)
    labels = (cell_y * gw + cell_x).astype(jnp.int32)

    S = max(H / gh, W / gw)
    coord = jnp.stack([ys.astype(jnp.float32) / S, xs.astype(jnp.float32) / S], -1)
    feat = jnp.concatenate([f * 4.0, coord], axis=-1)  # color weight ~ scansegment
    D = feat.shape[-1]

    def step(labels, _):
        onehot_sum = jnp.zeros((K, D), jnp.float32).at[labels.reshape(-1)].add(
            feat.reshape(-1, D))
        counts = jnp.zeros((K,), jnp.float32).at[labels.reshape(-1)].add(1.0)
        cent = onehot_sum / jnp.maximum(counts[:, None], 1.0)
        # candidate labels: own + 8 spatial grid neighbors of the current label
        best_d = jnp.full((H, W), jnp.inf)
        best_l = labels
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                cand = jnp.clip(labels // gw + dy, 0, gh - 1) * gw + jnp.clip(
                    labels % gw + dx, 0, gw - 1)
                cf = cent[cand]  # (H, W, D)
                d = ((feat - cf) ** 2).sum(-1)
                take = d < best_d
                best_d = jnp.where(take, d, best_d)
                best_l = jnp.where(take, cand, best_l)
        return best_l, None

    labels, _ = jax.lax.scan(step, labels, None, length=n_iters)
    return labels


# ---------------------------------------------------------------------------
# Ellipse detection
# ---------------------------------------------------------------------------


def _eig3_cardano(M):
    """The real eigenvalues of a real 3x3 matrix via the characteristic
    cubic — all-real arithmetic (TPU lacks LAPACK eig and complex pow).
    Returns (roots (3,), is_real (3,) bool): with a positive discriminant
    the single real root is replicated."""
    c2 = jnp.trace(M)
    c1 = 0.5 * (c2 * c2 - jnp.trace(M @ M))
    c0 = jnp.linalg.det(M)
    # t^3 + a t^2 + b t + c with t = lambda
    a, b, c = -c2, c1, -c0
    p = b - a * a / 3.0
    q = 2.0 * a ** 3 / 27.0 - a * b / 3.0 + c
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3

    # one real root (disc > 0): Cardano with real cube roots
    cbrt = lambda x: jnp.sign(x) * jnp.abs(x) ** (1.0 / 3.0)
    s = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_single = cbrt(-q / 2.0 + s) + cbrt(-q / 2.0 - s)

    # three real roots (disc <= 0): trigonometric method (needs p < 0)
    p_neg = jnp.minimum(p, -1e-12)
    m = 2.0 * jnp.sqrt(-p_neg / 3.0)
    arg = jnp.clip(3.0 * q / (p_neg * m), -1.0, 1.0)
    theta = jnp.arccos(arg) / 3.0
    ks = jnp.arange(3, dtype=jnp.float32)
    t_triple = m * jnp.cos(theta - 2.0 * jnp.pi * ks / 3.0)

    three_real = disc <= 0
    roots = jnp.where(three_real, t_triple, t_single) - a / 3.0
    is_real = jnp.where(three_real, jnp.ones(3, bool),
                        jnp.array([True, False, False]))
    return roots, is_real


def _fit_ellipse_direct(pts, w):
    """Fitzgibbon/Halir-Flusser direct least-squares ellipse fit on weighted
    points (N, 2) with validity weights (N,). Returns conic coefficients
    (a, b, c, d, e, f) for ax^2+bxy+cy^2+dx+ey+f=0; the ellipse-constrained
    eigenvector of the reduced 3x3 system is found with an analytic cubic
    eigensolve + adjugate null vectors (no LAPACK eig, which TPU lacks)."""
    x = pts[:, 0]
    y = pts[:, 1]
    D1 = jnp.stack([x * x, x * y, y * y], 1) * w[:, None]
    D2 = jnp.stack([x, y, jnp.ones_like(x)], 1) * w[:, None]
    S1 = D1.T @ D1
    S2 = D1.T @ D2
    S3 = D2.T @ D2
    S3i = jnp.linalg.inv(S3 + 1e-9 * jnp.eye(3))
    T = -S3i @ S2.T
    M = S1 + S2 @ T
    C1i = jnp.array([[0.0, 0.0, 0.5], [0.0, -1.0, 0.0], [0.5, 0.0, 0.0]])
    My = C1i @ M

    lams, is_real = _eig3_cardano(My)

    def nullvec(lam):
        A = My - lam * jnp.eye(3)
        cands = jnp.stack([jnp.cross(A[0], A[1]), jnp.cross(A[1], A[2]),
                           jnp.cross(A[0], A[2])])
        norms = jnp.linalg.norm(cands, axis=1)
        v = cands[jnp.argmax(norms)]
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)

    vecs = jax.vmap(nullvec)(lams)  # (3, 3)
    cond = 4.0 * vecs[:, 0] * vecs[:, 2] - vecs[:, 1] ** 2
    ok = is_real & (cond > 1e-9)
    pick = jnp.argmax(ok.astype(jnp.float32) - 1e-6 * jnp.abs(lams))
    a1 = vecs[pick]
    a2 = T @ a1
    return jnp.concatenate([a1, a2])


def conic_to_ellipse(coef):
    """Conic (a,b,c,d,e,f) -> (cx, cy, major, minor, angle)."""
    a, b, c, d, e, f = coef
    den = 4 * a * c - b * b
    cx = (b * e - 2 * c * d) / jnp.maximum(den, 1e-12)
    cy = (b * d - 2 * a * e) / jnp.maximum(den, 1e-12)
    mu = a * cx * cx + b * cx * cy + c * cy * cy + d * cx + e * cy + f
    A = jnp.array([[a, b / 2], [b / 2, c]]) / jnp.maximum(-mu, 1e-12)
    evals, evecs = jnp.linalg.eigh(A)
    evals = jnp.maximum(evals, 1e-12)
    axes = 1.0 / jnp.sqrt(evals)  # evals ascending -> axes descending
    angle = jnp.arctan2(evecs[1, 0], evecs[0, 0])  # direction of major axis
    return jnp.array([cx, cy, axes[0], axes[1], angle])


def find_ellipses(img: jnp.ndarray, max_ellipses: int = 8,
                  canny_lo: float = 0.04, canny_hi: float = 0.12,
                  min_pts: int = 30, score_thresh: float = 0.5):
    """Ellipse detection (parity: cv::ximgproc::findEllipses,
    find_ellipses.cpp): Canny edges -> connected components -> per-component
    direct ellipse fit (vmapped) -> score by on-conic inlier fraction.
    Returns (ellipses (max_ellipses, 5), scores (max_ellipses,)); rows with
    score 0 are padding."""
    from opencv_contrib_tpu.ximgproc.hough_mser import canny
    from opencv_contrib_tpu.ops.ccl import connected_components

    edges = canny(img, canny_lo, canny_hi)
    edge_mask = edges > 0
    # bridge 1-px NMS gaps so contours label as single components; the fit
    # still uses only true edge pixels
    grown = edge_mask
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            grown = grown | jnp.roll(edge_mask, (dy, dx), (0, 1))
    labels = connected_components(grown)
    if isinstance(labels, tuple):
        labels = labels[0]
    H, W = img.shape
    ys, xs = jnp.mgrid[0:H, 0:W]
    flat_e = edge_mask.reshape(-1)
    flat_l = labels.reshape(-1).astype(jnp.int32)
    flat_l = jnp.where((flat_l < 0) | (flat_l >= H * W) | ~flat_e, H * W, flat_l)
    # top components by edge-pixel count (slot H*W collects background)
    counts = jnp.zeros((H * W + 1,), jnp.int32).at[flat_l].add(1)
    counts = counts.at[H * W].set(0)
    top = jax.lax.top_k(counts, max_ellipses)[1]

    pts_all = jnp.stack([xs.reshape(-1).astype(jnp.float32),
                         ys.reshape(-1).astype(jnp.float32)], 1)

    def fit_one(lbl):
        w = (flat_l == lbl).astype(jnp.float32)
        n = w.sum()
        # center/scale for conditioning
        mean = (pts_all * w[:, None]).sum(0) / jnp.maximum(n, 1.0)
        scale = jnp.sqrt(((pts_all - mean) ** 2 * w[:, None]).sum() / jnp.maximum(n, 1.0)) + 1e-6
        pn = (pts_all - mean) / scale
        coef = _fit_ellipse_direct(pn, w)
        ell = conic_to_ellipse(coef)
        ell = ell.at[0:2].set(ell[0:2] * scale + mean)
        ell = ell.at[2:4].set(ell[2:4] * scale)
        # score: fraction of component points within 2px of the conic, using
        # the radial distance |R - R/r| (R = euclidean radius in the
        # ellipse frame, r = normalized conic radius)
        cx, cy, a_maj, a_min, th = ell
        ct, st = jnp.cos(th), jnp.sin(th)
        u = (pts_all[:, 0] - cx) * ct + (pts_all[:, 1] - cy) * st
        v = -(pts_all[:, 0] - cx) * st + (pts_all[:, 1] - cy) * ct
        r = jnp.sqrt((u / jnp.maximum(a_maj, 1e-6)) ** 2 + (v / jnp.maximum(a_min, 1e-6)) ** 2)
        R = jnp.sqrt(u * u + v * v)
        dist = R * jnp.abs(r - 1.0) / jnp.maximum(r, 1e-6)
        inl = ((dist < 2.0) * w).sum()
        # an honest detection also needs the ellipse circumference covered
        perim = jnp.pi * (3.0 * (a_maj + a_min)
                          - jnp.sqrt(jnp.maximum((3 * a_maj + a_min) * (a_maj + 3 * a_min), 0.0)))
        coverage = jnp.clip(inl / jnp.maximum(0.7 * perim, 1.0), 0.0, 1.0)
        score = jnp.where(n >= min_pts, inl / jnp.maximum(n, 1.0) * coverage, 0.0)
        ok = jnp.isfinite(ell).all() & (a_maj < 2 * max(H, W)) & (a_min > 1.0)
        return jnp.where(ok, ell, 0.0), jnp.where(ok, score, 0.0)

    ells, scores = jax.vmap(fit_one)(top)
    scores = jnp.where(scores >= score_thresh, scores, 0.0)
    return ells, scores
