"""Correlation-filter trackers: MOSSE and KCF.

Reference anchors: trackerMOSSE (legacy) and TrackerKCFImpl
(tracking/src/trackerKCF.cpp:74): FFT-domain ridge regression against a
Gaussian target response; KCF adds a Gaussian *kernel* on raw-pixel channels
(denseGaussKernel, :99,340) and circulant-shift training.

TPU-first: everything is jnp.fft elementwise math with static window sizes;
per-frame update is one jitted program. State is a NamedTuple so trackers
vmap across many targets (the MultiTracker analog for free).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ops.image import sample_bilinear


def _hann(n):
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(n) / n)


def _window(shape):
    return _hann(shape[0])[:, None] * _hann(shape[1])[None, :]


def _gaussian_response(shape, sigma_factor: float = 0.1):
    H, W = shape
    sigma = jnp.sqrt(H * W * 1.0) * sigma_factor
    y = jnp.arange(H) - H // 2
    x = jnp.arange(W) - W // 2
    g = jnp.exp(-0.5 * (y[:, None] ** 2 + x[None, :] ** 2) / (sigma**2))
    return jnp.roll(g, (-(H // 2), -(W // 2)), axis=(0, 1))


def _crop(img, center_yx, shape, scale=1.0):
    """Crop a (shape * scale) window resized to `shape` — crop + resize as
    ONE bilinear gather (scale=1 is the plain crop). With a DSST scale
    state the translation filter tracks in scale-normalized space."""
    H, W = shape
    y = center_yx[0] + (jnp.arange(H, dtype=jnp.float32) - H / 2 + 0.5) * scale
    x = center_yx[1] + (jnp.arange(W, dtype=jnp.float32) - W / 2 + 0.5) * scale
    return sample_bilinear(img, y[:, None] * jnp.ones((1, W)), jnp.ones((H, 1)) * x[None, :])


def _preprocess(patch):
    p = jnp.log1p(patch - patch.min())
    p = (p - p.mean()) / (p.std() + 1e-5)
    return p * _window(p.shape)


class MosseState(NamedTuple):
    center: jnp.ndarray  # (2,) y, x
    A: jnp.ndarray  # filter numerator (complex); shape = window (H, W)
    B: jnp.ndarray  # filter denominator (real)
    G: jnp.ndarray  # target response FFT (complex)

    @property
    def size(self):
        return self.A.shape


def mosse_init(img, center_yx, size=(64, 64), lr: float = 0.125) -> MosseState:
    patch = _preprocess(_crop(img, jnp.asarray(center_yx, jnp.float32), size))
    F = jnp.fft.fft2(patch)
    G = jnp.fft.fft2(_gaussian_response(size))
    A = G * jnp.conj(F)
    B = (F * jnp.conj(F)).real + 1e-2
    return MosseState(jnp.asarray(center_yx, jnp.float32), A, B, G)


@partial(jax.jit, static_argnames=("lr",))
def mosse_update(state: MosseState, img, lr: float = 0.125):
    """One tracking step: locate peak, re-train filter online. Returns
    (new_state, psr) — PSR is the reference's confidence measure."""
    patch = _preprocess(_crop(img, state.center, state.size))
    F = jnp.fft.fft2(patch)
    Hf = state.A / state.B
    resp = jnp.fft.ifft2(Hf * F).real
    H, W = state.size
    idx = jnp.argmax(resp)
    py, px = idx // W, idx % W
    # wrap displacement to [-H/2, H/2)
    dy = jnp.where(py > H // 2, py - H, py).astype(jnp.float32)
    dx = jnp.where(px > W // 2, px - W, px).astype(jnp.float32)
    center = state.center + jnp.stack([dy, dx])

    # PSR confidence
    peak = resp.reshape(-1)[idx]
    mean = (resp.sum() - peak) / (H * W - 1)
    std = jnp.sqrt(jnp.maximum(jnp.mean((resp - mean) ** 2), 1e-9))
    psr = (peak - mean) / std

    # online update at the NEW position
    patch2 = _preprocess(_crop(img, center, state.size))
    F2 = jnp.fft.fft2(patch2)
    A = (1 - lr) * state.A + lr * state.G * jnp.conj(F2)
    B = (1 - lr) * state.B + lr * ((F2 * jnp.conj(F2)).real + 1e-2)
    return MosseState(center, A, B, state.G), psr


class KcfState(NamedTuple):
    center: jnp.ndarray
    alpha_f: jnp.ndarray  # dual coefficients (complex); shape = window (H, W)
    xf: jnp.ndarray  # model appearance FFT (complex)
    G: jnp.ndarray

    @property
    def size(self):
        return self.xf.shape


def _gauss_kernel_corr(xf, zf, sigma: float):
    """Dense Gaussian kernel correlation in the Fourier domain
    (denseGaussKernel, trackerKCF.cpp:340)."""
    N = xf.shape[0] * xf.shape[1]
    xx = jnp.sum(jnp.abs(xf) ** 2) / N
    zz = jnp.sum(jnp.abs(zf) ** 2) / N
    # k^{xz} = exp(-(|x|^2 + |z|^2 - 2 F^-1(x̂* ⊙ ẑ)) / sigma^2 N): the
    # conjugate goes on the MODEL so the correlation peak moves WITH the
    # target (conjugating z instead mirrors the displacement)
    xz = jnp.fft.ifft2(jnp.conj(xf) * zf).real
    d = jnp.maximum(xx + zz - 2.0 * xz, 0.0)
    return jnp.exp(-d / (sigma * sigma * N))


def kcf_init(img, center_yx, size=(64, 64), sigma: float = 0.2, lam: float = 1e-4) -> KcfState:
    patch = _preprocess(_crop(img, jnp.asarray(center_yx, jnp.float32), size))
    xf = jnp.fft.fft2(patch)
    G = jnp.fft.fft2(_gaussian_response(size))
    k = _gauss_kernel_corr(xf, xf, sigma)
    alpha_f = G / (jnp.fft.fft2(k) + lam)
    return KcfState(jnp.asarray(center_yx, jnp.float32), alpha_f, xf, G)


@partial(jax.jit, static_argnames=("sigma", "lam", "lr"))
def kcf_update(state: KcfState, img, sigma: float = 0.2, lam: float = 1e-4, lr: float = 0.075,
               scale=1.0):
    patch = _preprocess(_crop(img, state.center, state.size, scale))
    zf = jnp.fft.fft2(patch)
    k = _gauss_kernel_corr(state.xf, zf, sigma)
    resp = jnp.fft.ifft2(state.alpha_f * jnp.fft.fft2(k)).real
    H, W = state.size
    idx = jnp.argmax(resp)
    py, px = idx // W, idx % W
    dy = jnp.where(py > H // 2, py - H, py).astype(jnp.float32)
    dx = jnp.where(px > W // 2, px - W, px).astype(jnp.float32)
    # displacement measured in scale-normalized pixels -> image pixels
    center = state.center + jnp.stack([dy, dx]) * scale

    patch2 = _preprocess(_crop(img, center, state.size, scale))
    xf_new = jnp.fft.fft2(patch2)
    k2 = _gauss_kernel_corr(xf_new, xf_new, sigma)
    alpha_new = state.G / (jnp.fft.fft2(k2) + lam)
    xf = (1 - lr) * state.xf + lr * xf_new
    alpha_f = (1 - lr) * state.alpha_f + lr * alpha_new
    peak = resp.reshape(-1)[idx]
    return KcfState(center, alpha_f, xf, state.G), peak
