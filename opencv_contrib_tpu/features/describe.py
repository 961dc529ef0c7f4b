"""Feature descriptors.

- surf_describe: SURF-class 64-d oriented gradient-grid descriptor
  (reference: xfeatures2d/src/surf.cpp SURFInvoker :520-… — rotated 20s
  patch, 4x4 cells x (sum dx, sum|dx|, sum dy, sum|dy|), L2-normalized).
- daisy_describe: DAISY log-polar descriptor, default q_radius=3, q_theta=8,
  q_hist=8 -> (3*8+1)*8 = 200 floats (reference: daisy.cpp:86 DAISY_Impl,
  layered gradient cubes with incremental Gaussian smoothing :326-350).
- binary_boxes_describe: BEBLID-class binary descriptor from thresholded
  average-gray box differences (reference: beblid.cpp:29-34 ABWLParams
  {x1,y1,x2,y2,boxRadius,th}; per-keypoint loop :372). The reference ships
  *learned* box tables; we generate a deterministic pseudo-random table with
  the same structure (scale-adaptive box pairs) — same API/shape contract.
- brief_describe: BRIEF-class point-pair binary descriptor.

TPU-first: every descriptor is a batched gather + dense einsum over a fixed
sample pattern; binary descriptors are returned BOTH bit-packed (uint32) and
as ±1 floats (`signs`) so matching runs on the MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from opencv_contrib_tpu.features.keypoints import Keypoints
from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.ops import integral as integ
from opencv_contrib_tpu.ops.image import sample_bilinear, sample_bilinear_multi


# ----------------------------------------------------------------------------
# SURF-class descriptor
# ----------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("patch_cells", "cell_samples"))
def surf_describe(img: jnp.ndarray, kps: Keypoints, patch_cells: int = 4, cell_samples: int = 5) -> jnp.ndarray:
    """64-d SURF-class descriptor: rotated 20s patch -> 4x4 cells, each
    accumulating Gaussian-weighted (sum dx, sum|dx|, sum dy, sum|dy|) of
    rotated gradients. Returns (K, patch_cells^2 * 4) L2-normalized.
    """
    g = filters.gaussian_blur(img, 1.0)
    gy, gx = filters.gradients(g)

    n = patch_cells * cell_samples  # 20 samples across the patch
    # sample grid in units of scale s: patch spans [-10s, 10s)
    u = (jnp.arange(n, dtype=jnp.float32) - n / 2 + 0.5) * (20.0 / n)
    gyy, gxx = jnp.meshgrid(u, u, indexing="ij")  # (n, n)
    w = jnp.exp(-(gxx**2 + gyy**2) / (2 * (3.3 * 2.0) ** 2))

    c = jnp.cos(kps.angle)
    s = jnp.sin(kps.angle)
    sc = kps.scale

    # rotated sample positions (K, n, n)
    px = kps.x[:, None, None] + sc[:, None, None] * (c[:, None, None] * gxx[None] - s[:, None, None] * gyy[None])
    py = kps.y[:, None, None] + sc[:, None, None] * (s[:, None, None] * gxx[None] + c[:, None, None] * gyy[None])

    # corner-stacked single gather for both gradient maps (sample_bilinear_
    # multi: 26 ms -> 2.3 ms for 1024 kps x 400 samples on v5e)
    sgx, sgy = sample_bilinear_multi(jnp.stack([gx, gy]), py, px)
    # rotate gradients into keypoint frame
    rx = c[:, None, None] * sgx + s[:, None, None] * sgy
    ry = -s[:, None, None] * sgx + c[:, None, None] * sgy
    rx = rx * w[None]
    ry = ry * w[None]

    K = kps.capacity
    cells_x = rx.reshape(K, patch_cells, cell_samples, patch_cells, cell_samples)
    cells_y = ry.reshape(K, patch_cells, cell_samples, patch_cells, cell_samples)
    f1 = cells_x.sum(axis=(2, 4))
    f2 = jnp.abs(cells_x).sum(axis=(2, 4))
    f3 = cells_y.sum(axis=(2, 4))
    f4 = jnp.abs(cells_y).sum(axis=(2, 4))
    desc = jnp.stack([f1, f2, f3, f4], axis=-1).reshape(K, -1)
    desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-12)
    return desc * kps.valid[:, None]


# ----------------------------------------------------------------------------
# DAISY
# ----------------------------------------------------------------------------


def _orientation_maps(img: jnp.ndarray, q_hist: int):
    """Rectified gradient orientation layers (q_hist, H, W) — DAISY's
    'layered gradients' (daisy.cpp compute_smoothed_gradient_layers)."""
    gy, gx = filters.gradients(img)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)
    outs = []
    for k in range(q_hist):
        theta = 2.0 * jnp.pi * k / q_hist - jnp.pi
        # soft-assignment: positive cosine lobe (rectified projection)
        proj = mag * jnp.maximum(jnp.cos(ang - theta), 0.0)
        outs.append(proj)
    return jnp.stack(outs)


@partial(jax.jit, static_argnames=("radius", "q_radius", "q_theta", "q_hist"))
def daisy_describe(
    img: jnp.ndarray,
    kps: Keypoints,
    radius: float = 15.0,
    q_radius: int = 3,
    q_theta: int = 8,
    q_hist: int = 8,
) -> jnp.ndarray:
    """DAISY descriptor at keypoint locations: (K, (q_radius*q_theta+1)*q_hist)
    = (K, 200) with defaults — matching the reference's default shape
    (xfeatures2d.hpp:360: radius=15, q_radius=3, q_theta=8, q_hist=8).

    Dense pipeline: orientation maps convolved at q_radius+1 Gaussian levels
    (the smoothing 'cubes'), then one batched bilinear gather at the
    log-polar grid per keypoint; per-ring L2 normalization (NRM_PARTIAL).
    """
    omaps = _orientation_maps(img, q_hist)  # (O, H, W)
    # cube sigmas as in reference: sigma_l = radius*(l+1)/q_radius/2
    sigmas = [radius * (l + 1) / q_radius / 2.0 for l in range(q_radius)]
    sigmas = [sigmas[0] / 2.0] + sigmas  # center uses the finest smoothing
    # heavy cubes (sigma >= 5) are band-limited: smooth at HALF resolution
    # and upsample — 4x less blur work for <1% descriptor change
    from opencv_contrib_tpu.ops.image import resize

    H, W = img.shape
    cubes = []
    prev = omaps
    prev_sig = 0.0
    for sig in sigmas:
        inc = float(np.sqrt(max(sig**2 - prev_sig**2, 1e-6)))
        if sig >= 5.0:
            half = jax.vmap(lambda m: resize(m, (H // 2, W // 2)))(prev)
            sm_h = jax.vmap(lambda m: filters.fast_gaussian_blur(m, inc / 2.0))(half)
            sm = jax.vmap(lambda m: resize(m, (H, W)))(sm_h)
        else:
            sm = jax.vmap(lambda m: filters.fast_gaussian_blur(m, inc))(prev)
        cubes.append(sm)
        prev, prev_sig = sm, sig
    # grid: center (cube 0) + q_radius rings x q_theta spokes (cube r+1)
    ring_r = [radius * (r + 1) / q_radius for r in range(q_radius)]
    thetas = [2.0 * np.pi * t / q_theta for t in range(q_theta)]

    feats = []
    # center + one corner-stacked gather PER RING over all q_hist maps and
    # all q_theta spokes (vs q_hist*q_theta separate gathers)
    c0 = jnp.moveaxis(sample_bilinear_multi(cubes[0], kps.y, kps.x), 0, -1)  # (K, O)
    feats.append(c0[:, None, :])
    c, s = jnp.cos(kps.angle), jnp.sin(kps.angle)
    scale_f = kps.scale / 2.0 + 0.5
    dyv = jnp.asarray([np.sin(t) for t in thetas], jnp.float32)  # (T,)
    dxv = jnp.asarray([np.cos(t) for t in thetas], jnp.float32)
    for r in range(q_radius):
        dy = ring_r[r] * dyv  # (T,)
        dx = ring_r[r] * dxv
        py = kps.y[None] + (s[None] * dx[:, None] + c[None] * dy[:, None]) * scale_f[None]
        px = kps.x[None] + (c[None] * dx[:, None] - s[None] * dy[:, None]) * scale_f[None]
        f = sample_bilinear_multi(cubes[r + 1], py, px)  # (O, T, K)
        feats.append(jnp.transpose(f, (2, 1, 0)))  # (K, T, O)
    desc = jnp.concatenate(feats, axis=1)  # (K, S, q_hist)
    # partial normalization: each histogram L2-normalized (NRM_PARTIAL)
    desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-12)
    K = kps.capacity
    return desc.reshape(K, -1) * kps.valid[:, None]


# ----------------------------------------------------------------------------
# Binary descriptors
# ----------------------------------------------------------------------------


def make_box_pairs(n_bits: int = 256, patch: float = 16.0, seed: int = 42):
    """Deterministic BEBLID-style box-pair table: (x1,y1,x2,y2,radius) per bit
    (structure of ABWLParams, beblid.cpp:29-34; the reference's values are
    learned offline — ours are a fixed pseudo-random draw with matched
    scale-adaptive geometry)."""
    rng = np.random.default_rng(seed)
    p1 = rng.normal(scale=patch / 3.5, size=(n_bits, 2)).clip(-patch, patch)
    p2 = rng.normal(scale=patch / 3.5, size=(n_bits, 2)).clip(-patch, patch)
    radius = rng.integers(1, 4, size=(n_bits,))
    return (
        jnp.asarray(p1, jnp.float32),
        jnp.asarray(p2, jnp.float32),
        jnp.asarray(radius, jnp.float32),
    )


@partial(jax.jit, static_argnames=("n_bits",))
def binary_boxes_describe(img: jnp.ndarray, kps: Keypoints, n_bits: int = 256):
    """BEBLID-class binary descriptor: bit b = [avg box1 - avg box2 > 0],
    boxes scaled/rotated with the keypoint. Returns (packed (K, n_bits//32)
    uint32, signs (K, n_bits) ±1 float32)."""
    p1, p2, rad = make_box_pairs(n_bits)
    ii = integ.integral(img)

    c, s = jnp.cos(kps.angle), jnp.sin(kps.angle)
    sc = kps.scale / 2.0 + 0.5

    def box_avg(pts, radius):
        # rotated box centers (K, B)
        bx = kps.x[:, None] + sc[:, None] * (c[:, None] * pts[None, :, 0] - s[:, None] * pts[None, :, 1])
        by = kps.y[:, None] + sc[:, None] * (s[:, None] * pts[None, :, 0] + c[:, None] * pts[None, :, 1])
        r = jnp.maximum((radius[None, :] * sc[:, None]).astype(jnp.int32), 1)
        y0 = by.astype(jnp.int32) - r
        x0 = bx.astype(jnp.int32) - r
        wh = 2 * r + 1
        return integ.box_sum(ii, y0, x0, wh, wh) / (wh * wh)

    a = box_avg(p1, rad)
    b = box_avg(p2, rad)
    bits = (a - b) > 0  # (K, n_bits)
    signs = jnp.where(bits, 1.0, -1.0).astype(jnp.float32) * kps.valid[:, None]
    packed = pack_bits(bits)
    return packed, signs


@partial(jax.jit, static_argnames=("n_bits", "patch"))
def brief_describe(img: jnp.ndarray, kps: Keypoints, n_bits: int = 256, patch: int = 24):
    """BRIEF-class point-pair binary descriptor on the smoothed image
    (reference: brief.cpp), steered by keypoint angle like ORB."""
    g = filters.gaussian_blur(img, 2.0)
    rng = np.random.default_rng(7)
    pts = rng.normal(scale=patch / 5.0, size=(2, n_bits, 2)).clip(-patch / 2, patch / 2)
    pa = jnp.asarray(pts[0], jnp.float32)
    pb = jnp.asarray(pts[1], jnp.float32)
    c, s = jnp.cos(kps.angle), jnp.sin(kps.angle)
    sc = kps.scale / 2.0 + 0.5

    def sample(p):
        px = kps.x[:, None] + sc[:, None] * (c[:, None] * p[None, :, 0] - s[:, None] * p[None, :, 1])
        py = kps.y[:, None] + sc[:, None] * (s[:, None] * p[None, :, 0] + c[:, None] * p[None, :, 1])
        return sample_bilinear(g, py, px)

    bits = sample(pa) > sample(pb)
    signs = jnp.where(bits, 1.0, -1.0).astype(jnp.float32) * kps.valid[:, None]
    return pack_bits(bits), signs


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(..., n_bits) bool -> (..., n_bits//32) uint32."""
    n = bits.shape[-1]
    assert n % 32 == 0
    b = bits.reshape(bits.shape[:-1] + (n // 32, 32)).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(b * weights, axis=-1, dtype=jnp.uint32)


def unpack_to_signs(packed: jnp.ndarray, n_bits: int) -> jnp.ndarray:
    """(..., n_bits//32) uint32 -> (..., n_bits) ±1 float32 (for MXU matching)."""
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    bits = (packed[..., :, None] & weights) > 0
    return jnp.where(bits, 1.0, -1.0).astype(jnp.float32).reshape(packed.shape[:-1] + (n_bits,))
