"""Additional xfeatures2d descriptors: FREAK, LATCH, LUCID.

Parity targets:
- FREAK (xfeatures2d/src/freak.cpp): retinal sampling — 43 receptive
  fields on concentric rings whose smoothing sigma grows with radius;
  orientation from symmetric long pairs; 512 coarse-to-fine comparison
  pairs. The reference's pair selection is learned offline; ours is the
  same coarse-to-fine geometric ordering, deterministic.
- LATCH (xfeatures2d/src/latch.cpp): per bit, three small patches
  (anchor, p1, p2); bit = [SSD(anchor, p1) < SSD(anchor, p2)].
- LUCID (xfeatures2d/src/lucid.cpp): the descriptor IS the rank
  permutation of blurred patch pixels (order statistics are invariant to
  monotonic illumination changes).

TPU-first: every sampler is a corner-stacked bilinear gather
(ops.image.sample_bilinear_multi) over precomputed smoothed maps; bit
comparisons are dense tensor expressions; binary outputs come bit-packed
AND as ±1 floats so matching runs on the MXU (features.match).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from opencv_contrib_tpu.features.describe import pack_bits
from opencv_contrib_tpu.features.keypoints import Keypoints
from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.ops.image import sample_bilinear, sample_bilinear_multi


# ----------------------------------------------------------------------------
# FREAK
# ----------------------------------------------------------------------------


def _freak_pattern():
    """43 receptive fields: center + 7 rings x 6 points, radius and
    smoothing sigma growing outward (freak.cpp buildPattern geometry).
    Returns (pts (43, 2) in patch units, ring_id (43,) int)."""
    pts = [(0.0, 0.0)]
    ring = [0]
    n_rings = 7
    for r in range(n_rings):
        rad = 1.5 * (r + 1) ** 1.25  # ~[1.5 .. 17]
        phase = (r % 2) * np.pi / 6
        for t in range(6):
            a = 2 * np.pi * t / 6 + phase
            pts.append((rad * np.cos(a), rad * np.sin(a)))
            ring.append(r + 1)
    return np.asarray(pts, np.float32), np.asarray(ring, np.int32)


def _freak_pairs(pts: np.ndarray, n_bits: int) -> np.ndarray:
    """Deterministic coarse-to-fine pair table: all point pairs sorted by
    descending center distance of the pair (coarse pairs first, the
    reference's learned ordering trend), deduplicated by angle bucket for
    spread."""
    P = pts.shape[0]
    pairs = [(i, j) for i in range(P) for j in range(i + 1, P)]
    r = np.linalg.norm(pts, axis=1)
    pairs.sort(key=lambda p: -(r[p[0]] + r[p[1]]))
    return np.asarray(pairs[:n_bits], np.int32)


_FREAK_SIGMAS = [0.5] + [0.6 * (r + 1) for r in range(7)]


@partial(jax.jit, static_argnames=("n_bits",))
def freak_describe(img: jnp.ndarray, kps: Keypoints, n_bits: int = 512):
    """FREAK binary descriptor with in-graph orientation estimation.
    Returns (packed (K, n_bits//32) uint32, signs (K, n_bits) float32,
    angle (K,)) — the estimated orientation is also returned since FREAK
    computes its own (freak.cpp: 45 orientation pairs)."""
    pts_np, ring_np = _freak_pattern()
    pairs_np = _freak_pairs(pts_np, n_bits)
    pts = jnp.asarray(pts_np)
    pairs = jnp.asarray(pairs_np)

    # one smoothed map per ring (8 levels)
    maps = jnp.stack([filters.fast_gaussian_blur(img, s) for s in _FREAK_SIGMAS])

    sc = kps.scale / 2.0 + 0.5

    def sample_all(cos_a, sin_a):
        # (43, K) intensities, each point from its ring's smoothed map
        px = kps.x[None] + sc[None] * (
            cos_a[None] * pts[:, 0:1] - sin_a[None] * pts[:, 1:2]
        )
        py = kps.y[None] + sc[None] * (
            sin_a[None] * pts[:, 0:1] + cos_a[None] * pts[:, 1:2]
        )
        # gather per ring map: stack coords by ring id (static partition)
        vals = jnp.zeros_like(px)
        for ridx in range(len(_FREAK_SIGMAS)):
            sel = ring_np == ridx
            if not sel.any():
                continue
            v = sample_bilinear(maps[ridx], py[sel], px[sel])
            vals = vals.at[jnp.asarray(np.where(sel)[0])].set(v)
        return vals  # (43, K)

    # pass 1: upright sampling for orientation (symmetric long pairs:
    # opposite points on the same ring)
    v0 = sample_all(jnp.ones_like(kps.x), jnp.zeros_like(kps.x))
    opp = []
    for ridx in range(1, 8):
        idxs = np.where(ring_np == ridx)[0]
        for t in range(3):
            opp.append((idxs[t], idxs[t + 3]))
    opp = np.asarray(opp, np.int32)  # (21, 2)
    dvec = pts_np[opp[:, 0]] - pts_np[opp[:, 1]]
    dvec = dvec / np.linalg.norm(dvec, axis=1, keepdims=True)
    dI = v0[opp[:, 0]] - v0[opp[:, 1]]  # (21, K)
    ox = (dI * jnp.asarray(dvec[:, 0:1])).sum(0)
    oy = (dI * jnp.asarray(dvec[:, 1:2])).sum(0)
    angle = jnp.arctan2(oy, ox)

    # pass 2: oriented sampling -> comparison bits
    v = sample_all(jnp.cos(angle), jnp.sin(angle))  # (43, K)
    bits = (v[pairs[:, 0]] - v[pairs[:, 1]] > 0).T  # (K, n_bits)
    signs = jnp.where(bits, 1.0, -1.0).astype(jnp.float32) * kps.valid[:, None]
    return pack_bits(bits), signs, angle


# ----------------------------------------------------------------------------
# LATCH
# ----------------------------------------------------------------------------


def _latch_triplets(n_bits: int, patch: float, seed: int = 11):
    rng = np.random.default_rng(seed)
    t = rng.normal(scale=patch / 3.0, size=(n_bits, 3, 2)).clip(-patch, patch)
    return t.astype(np.float32)


@partial(jax.jit, static_argnames=("n_bits", "half"))
def latch_describe(img: jnp.ndarray, kps: Keypoints, n_bits: int = 256, half: int = 1):
    """LATCH: bit = [SSD(anchor, p1) < SSD(anchor, p2)] over (2*half+1)^2
    mini-patches (latch.cpp; default 3x3 windows). Rotation/scale follow
    the keypoint. Returns (packed, signs)."""
    g = filters.gaussian_blur(img, 1.0)
    trip = jnp.asarray(_latch_triplets(n_bits, 12.0))  # (B, 3, 2)
    w = 2 * half + 1
    off = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-half, half + 1, dtype=jnp.float32),
            jnp.arange(-half, half + 1, dtype=jnp.float32),
            indexing="ij",
        ),
        -1,
    ).reshape(-1, 2)  # (w*w, 2) [dy, dx]

    c, s = jnp.cos(kps.angle), jnp.sin(kps.angle)
    sc = kps.scale / 2.0 + 0.5

    # sample positions: (K, B, 3, w*w)
    px_pat = trip[:, :, 0][None, :, :, None] + off[None, None, None, :, 1]  # (1,B,3,ww)
    py_pat = trip[:, :, 1][None, :, :, None] + off[None, None, None, :, 0]
    px = kps.x[:, None, None, None] + sc[:, None, None, None] * (
        c[:, None, None, None] * px_pat - s[:, None, None, None] * py_pat
    )
    py = kps.y[:, None, None, None] + sc[:, None, None, None] * (
        s[:, None, None, None] * px_pat + c[:, None, None, None] * py_pat
    )
    vals = sample_bilinear(g, py, px)  # (K, B, 3, ww)
    a, p1, p2 = vals[:, :, 0], vals[:, :, 1], vals[:, :, 2]
    ssd1 = ((a - p1) ** 2).sum(-1)
    ssd2 = ((a - p2) ** 2).sum(-1)
    bits = ssd1 < ssd2  # (K, B)
    signs = jnp.where(bits, 1.0, -1.0).astype(jnp.float32) * kps.valid[:, None]
    return pack_bits(bits), signs


# ----------------------------------------------------------------------------
# LUCID
# ----------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("patch",))
def lucid_describe(img: jnp.ndarray, kps: Keypoints, patch: int = 7):
    """LUCID: the descriptor is the rank order of blurred patch pixels
    (lucid.cpp computes the linear-time permutation; ranks are equivalent
    and compare with L1/L2). Returns (K, patch*patch) float32 ranks
    normalized to [0, 1]."""
    g = filters.box_filter(img, 2)
    half = patch // 2
    off = jnp.arange(-half, half + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(off, off, indexing="ij")
    px = kps.x[:, None] + ox.reshape(-1)[None]
    py = kps.y[:, None] + oy.reshape(-1)[None]
    vals = sample_bilinear(g, py, px)  # (K, P)
    order = jnp.argsort(vals, axis=-1)
    ranks = jnp.zeros_like(vals).at[
        jnp.arange(vals.shape[0])[:, None], order
    ].set(jnp.arange(vals.shape[1], dtype=jnp.float32)[None])
    ranks = ranks / (vals.shape[1] - 1)
    return ranks * kps.valid[:, None]
