"""DSST scale estimation (Danelljan et al. BMVC'14) — the scale filter the
reference couples to CSRT (trackerCSRT.cpp:131 carries a DSST scale
module) and that fixed-window KCF lacks.

A 1-D discriminative correlation filter over S scale samples: at each
frame, S patches are cropped at scales a^s around the tracked center,
resized to one template shape, flattened to feature vectors, and
correlated along the SCALE axis with a learned MOSSE-style filter. The
argmax scale multiplies the tracked box size.

TPU-first: all S crops are one batched bilinear gather (vmapped _crop with
scaled coordinate grids — static shapes, one compiled program for any
frame), and the scale correlation is a length-S FFT.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ops.image import sample_bilinear

N_SCALES = 17
SCALE_STEP = 1.03
TEMPLATE = (24, 24)


def _scale_factors():
    s = jnp.arange(N_SCALES, dtype=jnp.float32) - (N_SCALES - 1) / 2
    return SCALE_STEP ** s  # (S,)


def _crop_scaled(img, center_yx, base_hw, scale):
    """Crop a (base_hw * scale) window and resize to TEMPLATE via the
    sampling grid itself (scaled coordinates = crop + resize in ONE
    bilinear gather)."""
    th, tw = TEMPLATE
    H = base_hw[0] * scale
    W = base_hw[1] * scale
    y = center_yx[0] + (jnp.arange(th, dtype=jnp.float32) / th - 0.5) * H + 0.5
    x = center_yx[1] + (jnp.arange(tw, dtype=jnp.float32) / tw - 0.5) * W + 0.5
    return sample_bilinear(img, y[:, None] * jnp.ones((1, tw)),
                           jnp.ones((th, 1)) * x[None, :])


def _scale_features(img, center, base_hw):
    """(S, D) feature rows: blurred normalized crops.

    The blur buys tolerance to the translation filter's residual
    sub-pixel/low-pixel error (raw-pixel rows decorrelate at ~2 px offset
    on a 24 px target and the scale response collapses — measured); the
    translation filters themselves are sub-pixel via parabolic peak
    interpolation (csrt/kcf _subpixel_peak)."""
    scales = _scale_factors()
    patches = jax.vmap(lambda s: _crop_scaled(img, center, base_hw, s))(scales)
    # separable 5-tap binomial blur x2 (~sigma 1.5) via rolled adds
    def blur1(p, axis):
        return (jnp.roll(p, -2, axis) + 4 * jnp.roll(p, -1, axis) + 6 * p
                + 4 * jnp.roll(p, 1, axis) + jnp.roll(p, 2, axis)) / 16.0

    for _ in range(2):
        patches = blur1(blur1(patches, 1), 2)
    mu = patches.mean(axis=(1, 2), keepdims=True)
    sd = patches.std(axis=(1, 2), keepdims=True) + 1e-5
    norm = (patches - mu) / sd
    return norm.reshape(N_SCALES, -1)  # (S, D)


def _hann_s():
    return 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(N_SCALES) / (N_SCALES - 1))


def _gaussian_scale_response(sigma: float = 1.2):
    s = jnp.arange(N_SCALES, dtype=jnp.float32) - (N_SCALES - 1) / 2
    g = jnp.exp(-0.5 * (s / sigma) ** 2)
    return jnp.roll(g, -(N_SCALES - 1) // 2)  # peak at index 0


class DsstState(NamedTuple):
    A: jnp.ndarray  # (D,) complex numerator (summed over features)... per-feature
    B: jnp.ndarray  # (D,) real denominator
    scale: jnp.ndarray  # () current scale multiplier vs the initial box


def dsst_init(img, center_yx, base_hw) -> DsstState:
    feats = _scale_features(jnp.asarray(img), jnp.asarray(center_yx),
                            jnp.asarray(base_hw, jnp.float32))
    F = jnp.fft.fft(feats * _hann_s()[:, None], axis=0)  # (S, D)
    G = jnp.fft.fft(_gaussian_scale_response())  # (S,)
    A = jnp.conj(F) * G[:, None]
    B = (F * jnp.conj(F)).real.sum(axis=1)
    return DsstState(A, B, jnp.asarray(1.0, jnp.float32))


@partial(jax.jit, static_argnames=("lr",))
def dsst_update(state: DsstState, img, center_yx, base_hw, lr: float = 0.025,
                lam: float = 1e-2):
    """Estimate the scale at the (already translated) center, update the
    filter. Returns (new_state, scale_multiplier)."""
    center = jnp.asarray(center_yx, jnp.float32)
    hw = jnp.asarray(base_hw, jnp.float32) * state.scale
    feats = _scale_features(jnp.asarray(img), center, hw)
    F = jnp.fft.fft(feats * _hann_s()[:, None], axis=0)
    resp = jnp.fft.ifft(jnp.sum(state.A * F, axis=1) / (state.B + lam)).real  # (S,)
    idx = jnp.argmax(resp)
    step = jnp.where(idx > N_SCALES // 2, idx - N_SCALES, idx).astype(jnp.float32)
    new_scale = state.scale * SCALE_STEP ** step
    # clamp drift
    new_scale = jnp.clip(new_scale, 0.2, 5.0)

    # re-extract at the accepted scale and update the filter
    feats2 = _scale_features(jnp.asarray(img), center,
                             jnp.asarray(base_hw, jnp.float32) * new_scale)
    F2 = jnp.fft.fft(feats2 * _hann_s()[:, None], axis=0)
    G = jnp.fft.fft(_gaussian_scale_response())
    A_new = jnp.conj(F2) * G[:, None]
    B_new = (F2 * jnp.conj(F2)).real.sum(axis=1)
    A = (1 - lr) * state.A + lr * A_new
    B = (1 - lr) * state.B + lr * B_new
    return DsstState(A, B, new_scale), new_scale


# ---------------------------------------------------------------------------
# scale-adaptive composite trackers (translation filter + DSST scale filter,
# the reference CSRT's coupling in trackerCSRT.cpp:131 + DSST scale module)

class ScaledState(NamedTuple):
    base: object  # CsrtState | KcfState (translation filter state)
    dsst: DsstState
    base_hw: jnp.ndarray  # (2,) initial box size; current = base_hw * dsst.scale


def csrt_scale_init(img, center_yx, target_hw=(32, 32), size=(64, 64)) -> ScaledState:
    from opencv_contrib_tpu.tracking import csrt as csrt_mod

    base = csrt_mod.csrt_init(img, center_yx, target_hw=target_hw, size=size)
    d = dsst_init(img, center_yx, target_hw)
    return ScaledState(base, d, jnp.asarray(target_hw, jnp.float32))


def csrt_scale_update(state: ScaledState, img):
    """Returns (new_state, (center, box_hw), peak). The translation filter
    runs in scale-normalized space (window sampled at size * scale), so it
    neither drifts on zoom nor loses the target as it grows."""
    from opencv_contrib_tpu.tracking import csrt as csrt_mod

    base, peak = csrt_mod.csrt_update(state.base, img, scale=state.dsst.scale)
    d, scale = dsst_update(state.dsst, img, base.center, state.base_hw)
    box = state.base_hw * scale
    return ScaledState(base, d, state.base_hw), (base.center, box), peak


def kcf_scale_init(img, center_yx, target_hw=(32, 32), size=(64, 64)) -> ScaledState:
    from opencv_contrib_tpu.tracking import correlation

    base = correlation.kcf_init(img, center_yx, size=size)
    d = dsst_init(img, center_yx, target_hw)
    return ScaledState(base, d, jnp.asarray(target_hw, jnp.float32))


def kcf_scale_update(state: ScaledState, img):
    from opencv_contrib_tpu.tracking import correlation

    base, peak = correlation.kcf_update(state.base, img, scale=state.dsst.scale)
    d, scale = dsst_update(state.dsst, img, base.center, state.base_hw)
    box = state.base_hw * scale
    return ScaledState(base, d, state.base_hw), (base.center, box), peak
