"""CSRT: discriminative correlation filter with channel and spatial
reliability (Lukezic et al. CVPR'17).

Reference anchors: tracking/src/trackerCSRT.cpp:28 (TrackerCSRTImpl),
update_csr_filter (:131, constrained-filter ADMM), get_features HOG/CN
channels (:173), estimate_new_position (:52, weighted per-channel response).

TPU-first design: the whole per-frame update — multi-channel feature
extraction, spatial-reliability segmentation, a fixed-iteration ADMM solve
for the constrained filter, channel-weighted localization — is one jitted
FFT-domain program over static (64x64) windows. The reference runs ADMM to
convergence with dynamic stopping; here the iteration count is static (4,
matching the reference's default admm_iterations) so XLA unrolls it.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ops.filters import gradients
from opencv_contrib_tpu.tracking.correlation import _crop, _gaussian_response, _window

N_ORIENT = 8  # HOG-lite orientation channels
N_CHANNELS = N_ORIENT + 1  # + normalized grayscale


def _features(patch):
    """HOG-lite channels: soft orientation binning of gradient magnitude
    (the reference's get_features, trackerCSRT.cpp:173 uses 18-channel
    fHOG + CN; orientation-energy channels carry the same signal) plus a
    windowed grayscale channel. Returns (C, H, W)."""
    gy, gx = gradients(patch)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)  # [-pi, pi]
    bin_f = (ang + jnp.pi) / (2 * jnp.pi) * N_ORIENT
    lo = jnp.floor(bin_f)
    w_hi = bin_f - lo
    lo = lo.astype(jnp.int32) % N_ORIENT
    hi = (lo + 1) % N_ORIENT
    ch = jnp.zeros((N_ORIENT,) + patch.shape, patch.dtype)
    ch = ch.at[lo, jnp.arange(patch.shape[0])[:, None], jnp.arange(patch.shape[1])[None, :]].add(
        mag * (1 - w_hi)
    )
    ch = ch.at[hi, jnp.arange(patch.shape[0])[:, None], jnp.arange(patch.shape[1])[None, :]].add(
        mag * w_hi
    )
    gray = (patch - patch.mean()) / (patch.std() + 1e-5)
    feats = jnp.concatenate([ch, gray[None]], axis=0)
    return feats * _window(patch.shape)[None]


def _spatial_reliability(patch, target_hw, size):
    """Foreground/background likelihood mask (the reference segments with
    color histograms + a Epanechnikov prior, trackerCSRT.cpp get_subwindow/
    segment_region). Grayscale histogram likelihood ratio x radial prior,
    normalized to [~0, 1]; never all-zero (reference guards the same way)."""
    H, W = size
    th, tw = target_hw
    yy = (jnp.arange(H) - H / 2 + 0.5) / (th / 2)
    xx = (jnp.arange(W) - W / 2 + 0.5) / (tw / 2)
    r2 = yy[:, None] ** 2 + xx[None, :] ** 2
    prior = jnp.maximum(1.0 - r2 / 4.0, 0.0)  # Epanechnikov over 2x target
    fg_region = (r2 <= 1.0).astype(patch.dtype)

    nbins = 16
    q = jnp.clip((patch - patch.min()) / (patch.max() - patch.min() + 1e-6) * nbins, 0, nbins - 1e-3)
    qi = q.astype(jnp.int32)
    onehot = jax.nn.one_hot(qi, nbins, dtype=patch.dtype)
    hist_fg = (onehot * fg_region[..., None]).sum((0, 1)) + 1.0
    hist_bg = (onehot * (1 - fg_region)[..., None]).sum((0, 1)) + 1.0
    hist_fg = hist_fg / hist_fg.sum()
    hist_bg = hist_bg / hist_bg.sum()
    lik = (onehot * (hist_fg / (hist_fg + hist_bg))[None, None, :]).sum(-1)
    m = lik * prior
    m = m / (m.max() + 1e-6)
    # guard: if segmentation collapses, fall back to the prior alone
    return jnp.where(m.sum() > 0.1 * fg_region.sum(), m, prior / (prior.max() + 1e-6))


def _admm_filter(feat_f, G, mask, lam: float = 0.01, iters: int = 4, mu0: float = 5.0):
    """Constrained ridge filter via ADMM (update_csr_filter,
    trackerCSRT.cpp:131): solve per-channel h = argmin ||f*h - g||^2 +
    lam||h||^2 s.t. h = mask . h, with fixed iteration count."""
    C = feat_f.shape[0]
    N = feat_f.shape[1] * feat_f.shape[2]
    Sxy = jnp.conj(feat_f) * G[None]
    Sxx = (feat_f * jnp.conj(feat_f)).real

    def one_channel(sxy, sxx):
        h_f = sxy / (sxx + lam)
        l_f = jnp.zeros_like(h_f)
        mu = mu0

        hm = h_f
        for _ in range(iters):
            hm_f = (sxy + mu * hm - l_f) / (sxx + lam + mu)
            h_spatial = jnp.fft.ifft2(hm_f + l_f / mu).real * mask
            hm = jnp.fft.fft2(h_spatial)
            l_f = l_f + mu * (hm_f - hm)
            mu = mu * 2.0
        return hm

    return jax.vmap(one_channel)(Sxy.reshape(C, *G.shape), Sxx.reshape(C, *G.shape))


class CsrtState(NamedTuple):
    center: jnp.ndarray  # (2,) y, x
    target_hw: jnp.ndarray  # (2,) tracked box size (float, for output)
    h_f: jnp.ndarray  # (C, H, W) complex filter
    chan_w: jnp.ndarray  # (C,) channel reliability weights
    G: jnp.ndarray


def _learn(img, center, target_hw, size, G, scale=1.0):
    patch = _crop(img, center, size, scale)
    feats = _features(patch)
    mask = _spatial_reliability(patch, target_hw, size)
    h_f = _admm_filter(jnp.fft.fft2(feats), G, mask)
    # learning channel reliability: per-channel max response on the training
    # patch (trackerCSRT.cpp channel weight computation)
    resp = jnp.fft.ifft2(h_f * jnp.fft.fft2(feats)).real
    w = jnp.maximum(resp.max(axis=(1, 2)), 1e-6)
    return h_f, w / w.sum()


def csrt_init(img, center_yx, target_hw=(32, 32), size=(64, 64)) -> CsrtState:
    center = jnp.asarray(center_yx, jnp.float32)
    G = jnp.fft.fft2(_gaussian_response(size, sigma_factor=1.0 / 16.0))
    h_f, w = _learn(img, center, target_hw, size, G)
    return CsrtState(center, jnp.asarray(target_hw, jnp.float32), h_f, w, G)


@partial(jax.jit, static_argnames=("lr",))
def csrt_update(state: CsrtState, img, lr: float = 0.02, scale=1.0):
    """One CSRT step: channel-weighted localization then constrained-filter
    re-learning at the new position; with a scale the window is sampled at
    (size * scale) and tracked in scale-normalized space.
    Returns (new_state, peak_response)."""
    size = state.h_f.shape[1:]
    H, W = size
    patch = _crop(img, state.center, size, scale)
    feats = _features(patch)
    resp_c = jnp.fft.ifft2(state.h_f * jnp.fft.fft2(feats)).real
    # detection reliability scales learned weights (estimate_new_position)
    resp = (resp_c * state.chan_w[:, None, None]).sum(0)
    idx = jnp.argmax(resp)
    py, px = idx // W, idx % W
    # sub-pixel parabolic peak interpolation (the DSST scale filter's
    # pixel-feature rows decorrelate with whole-pixel localization error)
    r0 = resp[py, px]
    ry1 = resp[(py + 1) % H, px]
    rym = resp[(py - 1) % H, px]
    rx1 = resp[py, (px + 1) % W]
    rxm = resp[py, (px - 1) % W]
    sub_y = 0.5 * (rym - ry1) / jnp.where(
        jnp.abs(rym - 2 * r0 + ry1) > 1e-9, rym - 2 * r0 + ry1, 1e-9)
    sub_x = 0.5 * (rxm - rx1) / jnp.where(
        jnp.abs(rxm - 2 * r0 + rx1) > 1e-9, rxm - 2 * r0 + rx1, 1e-9)
    sub_y = jnp.clip(sub_y, -0.5, 0.5)
    sub_x = jnp.clip(sub_x, -0.5, 0.5)
    dy = jnp.where(py > H // 2, py - H, py).astype(jnp.float32) + sub_y
    dx = jnp.where(px > W // 2, px - W, px).astype(jnp.float32) + sub_x
    center = state.center + jnp.stack([dy, dx]) * scale

    h_new, w_new = _learn(img, center, state.target_hw, size, state.G, scale)
    h_f = (1 - lr) * state.h_f + lr * h_new
    chan_w = (1 - lr) * state.chan_w + lr * w_new
    peak = resp.reshape(-1)[idx]
    return CsrtState(center, state.target_hw, h_f, chan_w, state.G), peak
