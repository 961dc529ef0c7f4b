"""Learned descriptors: VGG-class float and BoostDesc-class binary.

Parity: xfeatures2d vgg.cpp / boostdesc.cpp — both evaluate a patch
through *learned* tables (the reference ships binaries trained offline in
generated_{16,32,64}.i). Zero-egress build: we TRAIN the projection
in-repo on synthetic warped patches instead of shipping opaque tables
(ROADMAP round-2 item), with save/load for reuse.

Method: raw feature = Gaussian-pooled oriented-gradient grid (the same
pooling family VGG uses); projection W maximizes the generalized Rayleigh
quotient tr(Wᵀ S_t W) / tr(Wᵀ S_w W) where S_w is the scatter of
(patch, warped-patch) difference pairs and S_t the total scatter —
directions that vary across content but are invariant to the warp/photo
jitter. Solved by Cholesky-whitening S_w then an eigh — all jnp, runs in
seconds on CPU or TPU.

TPU-first: descriptor evaluation is one corner-stacked bilinear gather +
two matmuls (pooling einsum, projection) — pure MXU work.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from opencv_contrib_tpu.features.describe import pack_bits
from opencv_contrib_tpu.features.keypoints import Keypoints
from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.ops.image import sample_bilinear_multi

RAW_DIM = 4 * 4 * 8  # spatial 4x4 cells x 8 orientation bins


@partial(jax.jit, static_argnames=("n_samples",))
def pooled_gradient_raw(img: jnp.ndarray, kps: Keypoints, n_samples: int = 20) -> jnp.ndarray:
    """Raw patch feature (K, 128): rotated n×n gradient grid soft-assigned
    to 8 orientation bins, Gaussian-pooled into 4x4 cells."""
    g = filters.gaussian_blur(img, 1.0)
    gy, gx = filters.gradients(g)

    n = n_samples
    u = (jnp.arange(n, dtype=jnp.float32) - n / 2 + 0.5) * (20.0 / n)
    gyy, gxx = jnp.meshgrid(u, u, indexing="ij")
    w = jnp.exp(-(gxx**2 + gyy**2) / (2 * 6.6**2))

    c, s = jnp.cos(kps.angle), jnp.sin(kps.angle)
    sc = kps.scale
    px = kps.x[:, None, None] + sc[:, None, None] * (
        c[:, None, None] * gxx[None] - s[:, None, None] * gyy[None])
    py = kps.y[:, None, None] + sc[:, None, None] * (
        s[:, None, None] * gxx[None] + c[:, None, None] * gyy[None])
    sgx, sgy = sample_bilinear_multi(jnp.stack([gx, gy]), py, px)  # (K,n,n)
    rx = c[:, None, None] * sgx + s[:, None, None] * sgy
    ry = -s[:, None, None] * sgx + c[:, None, None] * sgy
    mag = jnp.sqrt(rx * rx + ry * ry) * w[None]
    ang = jnp.arctan2(ry, rx)

    # soft orientation assignment (8 bins), then 4x4 spatial pooling
    kbin = jnp.arange(8, dtype=jnp.float32) * (2 * jnp.pi / 8) - jnp.pi
    resp = jnp.maximum(jnp.cos(ang[..., None] - kbin), 0.0) ** 3  # (K,n,n,8)
    resp = resp * mag[..., None]
    K = kps.capacity
    cell = n // 4
    pooled = resp.reshape(K, 4, cell, 4, cell, 8).sum(axis=(2, 4))  # (K,4,4,8)
    raw = pooled.reshape(K, RAW_DIM)
    raw = raw / (jnp.linalg.norm(raw, axis=-1, keepdims=True) + 1e-12)
    return raw * kps.valid[:, None]


# ----------------------------------------------------------------------------
# Training on synthetic warps
# ----------------------------------------------------------------------------


def _synthetic_patches(key, n: int, size: int = 64):
    """Textured patches: band-limited noise + random oriented step edges."""
    k1, k2, k3 = jax.random.split(key, 3)
    noise = jax.random.normal(k1, (n, size, size))
    smooth = jax.vmap(lambda m: filters.fast_gaussian_blur(m, 2.0))(noise)
    # oriented step edge through the center
    th = jax.random.uniform(k2, (n,), minval=0, maxval=np.pi)
    yy, xx = jnp.meshgrid(jnp.arange(size, dtype=jnp.float32) - size / 2,
                          jnp.arange(size, dtype=jnp.float32) - size / 2, indexing="ij")
    d = (jnp.cos(th)[:, None, None] * xx[None] + jnp.sin(th)[:, None, None] * yy[None])
    edge = jnp.tanh(d / 2.0) * jax.random.uniform(k3, (n, 1, 1), minval=0.0, maxval=1.5)
    p = smooth + edge
    p = (p - p.mean(axis=(1, 2), keepdims=True)) / (p.std(axis=(1, 2), keepdims=True) + 1e-6)
    return p


def _center_kp(size: int, angle, scale):
    from opencv_contrib_tpu.features import keypoints as kp_mod

    return kp_mod.from_arrays(
        y=jnp.asarray([size / 2.0]), x=jnp.asarray([size / 2.0]),
        scale=jnp.asarray([scale]), angle=jnp.asarray([angle]))


def train_projection(seed: int = 0, n_patches: int = 512, out_dim: int = 120,
                     eps: float = 1e-3) -> jnp.ndarray:
    """Learn W (RAW_DIM, out_dim): generalized eigvectors of
    (S_w + eps I)⁻¹ S_t — invariant-yet-discriminative directions."""
    key = jax.random.PRNGKey(seed)
    kp_key, patch_key, warp_key = jax.random.split(key, 3)
    patches = _synthetic_patches(patch_key, n_patches)
    size = patches.shape[1]

    ka, ks, kn = jax.random.split(warp_key, 3)
    d_ang = jax.random.uniform(ka, (n_patches,), minval=-0.35, maxval=0.35)
    d_sc = jnp.exp(jax.random.uniform(ks, (n_patches,), minval=-0.2, maxval=0.2))
    noise = 0.05 * jax.random.normal(kn, patches.shape)

    def feats(p, ang, sc):
        kp = _center_kp(size, ang, 2.0 * sc)
        return pooled_gradient_raw(p, kp)[0]

    fa = jax.vmap(lambda p: feats(p, 0.0, 1.0))(patches)
    fb = jax.vmap(feats)(patches + noise, d_ang, d_sc)

    diff = fa - fb
    S_w = diff.T @ diff / n_patches + eps * jnp.eye(RAW_DIM)
    allf = jnp.concatenate([fa, fb])
    allf = allf - allf.mean(0)
    S_t = allf.T @ allf / allf.shape[0]

    L = jnp.linalg.cholesky(S_w)
    Li = jax.scipy.linalg.solve_triangular(L, jnp.eye(RAW_DIM), lower=True)
    M = Li @ S_t @ Li.T
    evals, evecs = jnp.linalg.eigh(M)
    W = Li.T @ evecs[:, ::-1][:, :out_dim]  # top-out_dim generalized eigvecs
    W = W / (jnp.linalg.norm(W, axis=0, keepdims=True) + 1e-12)
    return W


_CACHED_W: dict = {}


def default_projection(out_dim: int = 120) -> jnp.ndarray:
    if out_dim not in _CACHED_W:
        _CACHED_W[out_dim] = train_projection(out_dim=out_dim)
    return _CACHED_W[out_dim]


def save_projection(path: str, W) -> None:
    np.savez(path, W=np.asarray(W))


def load_projection(path: str) -> jnp.ndarray:
    return jnp.asarray(np.load(path)["W"])


# ----------------------------------------------------------------------------
# Descriptors
# ----------------------------------------------------------------------------


def vgg_describe(img: jnp.ndarray, kps: Keypoints, W=None) -> jnp.ndarray:
    """VGG-class float descriptor (K, out_dim): learned projection of
    pooled gradients, L2-normalized."""
    if W is None:
        W = default_projection()
    raw = pooled_gradient_raw(img, kps)
    d = raw @ W
    d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-12)
    return d * kps.valid[:, None]


def boostdesc_describe(img: jnp.ndarray, kps: Keypoints, W=None, n_bits: int = 128):
    """BoostDesc-class binary descriptor: sign of the learned projections
    (BGM semantics — thresholded boosted gradient maps). Returns
    (packed, signs)."""
    if W is None:
        W = default_projection(out_dim=n_bits)
    raw = pooled_gradient_raw(img, kps)
    # center so sign bits split the raw-feature space (raw is nonnegative
    # pooled energy; uncentred projections would be constant-sign)
    proj = (raw - raw.mean(-1, keepdims=True)) @ W[:, :n_bits]
    bits = proj > 0
    signs = jnp.where(bits, 1.0, -1.0).astype(jnp.float32) * kps.valid[:, None]
    return pack_bits(bits), signs
