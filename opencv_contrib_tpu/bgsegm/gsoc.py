"""GSOC and LSBP background subtraction.

Reference anchors: bgsegm/src/bgfg_gsoc.cpp
(BackgroundSubtractorGSOC: per-pixel sample bank with hit counters,
replace-weakest update, noise-adaptive thresholds;
BackgroundSubtractorLSBP: same banks over Local SVD Binary Pattern
descriptors compared by Hamming distance; bgsegm.hpp:325,337).

TPU-first: the per-pixel sample banks are a (K, H, W) tensor; matching,
hit counting, and weakest-replacement are argmin/argmax reductions over
the bank axis — one fused program per frame, no per-pixel branching.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ops import filters


class GsocState(NamedTuple):
    samples: jnp.ndarray  # (K, H, W) background sample bank
    hits: jnp.ndarray  # (K, H, W) reliability counters
    key: jnp.ndarray


def gsoc_create(shape, n_samples: int = 20, key=None) -> GsocState:
    if key is None:
        key = jax.random.PRNGKey(0)
    return GsocState(jnp.zeros((n_samples,) + tuple(shape)),
                     jnp.zeros((n_samples,) + tuple(shape)), key)


@partial(jax.jit, static_argnames=())
def gsoc_apply(state: GsocState, frame, dist_thresh: float = 0.08,
               replace_rate: float = 0.1):
    """One GSOC step. Returns (state, fg_mask)."""
    d = jnp.abs(state.samples - frame[None])
    match = d < dist_thresh
    matched = match.any(0)
    fg = ~matched
    # reward the best-matching sample, decay the rest slightly
    best = jnp.argmin(d, axis=0)
    onehot = best[None] == jnp.arange(state.samples.shape[0])[:, None, None]
    hits = state.hits + jnp.where(onehot & match, 1.0, 0.0) - 0.01
    # replace the weakest sample with the current pixel (probabilistic,
    # and always where the pixel is foreground-stable)
    key, k1 = jax.random.split(state.key)
    weakest = jnp.argmin(hits, axis=0)
    do = jax.random.uniform(k1, frame.shape) < replace_rate
    repl = (weakest[None] == jnp.arange(state.samples.shape[0])[:, None, None]) & do[None]
    samples = jnp.where(repl, frame[None], state.samples)
    hits = jnp.where(repl, 1.0, hits)
    return GsocState(samples, hits, key), fg


def lsbp_descriptor(img, radius: int = 2, tau: float = 0.02):
    """Local SVD Binary Pattern (bgfg_gsoc.cpp BackgroundSampleLSBP):
    binary comparisons of the local SVD-smoothed intensity against 8
    neighbors at `radius`. Returns (H, W) int32 8-bit codes."""
    # local structure value: ratio of local singular values is approximated
    # by the guided local mean (the reference precomputes an SVD map once)
    s = filters.box_filter(img, 1)
    H, W = img.shape
    p = jnp.pad(s, radius, mode="edge")
    code = jnp.zeros((H, W), jnp.int32)
    nbrs = [(-radius, -radius), (-radius, 0), (-radius, radius), (0, radius),
            (radius, radius), (radius, 0), (radius, -radius), (0, -radius)]
    for b, (dy, dx) in enumerate(nbrs):
        nb = p[radius + dy : radius + dy + H, radius + dx : radius + dx + W]
        code = code | ((jnp.abs(nb - s) > tau).astype(jnp.int32) << b)
    return code


class LsbpState(NamedTuple):
    gsoc: GsocState  # intensity banks
    desc: jnp.ndarray  # (K, H, W) int32 LSBP code bank


def lsbp_create(shape, n_samples: int = 20, key=None) -> LsbpState:
    return LsbpState(gsoc_create(shape, n_samples, key),
                     jnp.zeros((n_samples,) + tuple(shape), jnp.int32))


def _popcount8(x):
    c = x - ((x >> 1) & 0x55)
    c = (c & 0x33) + ((c >> 2) & 0x33)
    return (c + (c >> 4)) & 0x0F


@jax.jit
def lsbp_apply(state: LsbpState, frame, dist_thresh: float = 0.08,
               hamming_thresh: int = 3, replace_rate: float = 0.1):
    """One LSBP step: a pixel is background if some bank sample matches in
    BOTH intensity and LSBP Hamming distance. Returns (state, fg_mask)."""
    g = state.gsoc
    code = lsbp_descriptor(frame)
    d_int = jnp.abs(g.samples - frame[None])
    d_ham = _popcount8(state.desc ^ code[None])
    match = (d_int < dist_thresh) & (d_ham <= hamming_thresh)
    fg = ~match.any(0)
    score = d_int + 0.05 * d_ham
    best = jnp.argmin(score, axis=0)
    onehot = best[None] == jnp.arange(g.samples.shape[0])[:, None, None]
    hits = g.hits + jnp.where(onehot & match, 1.0, 0.0) - 0.01
    key, k1 = jax.random.split(g.key)
    weakest = jnp.argmin(hits, axis=0)
    do = jax.random.uniform(k1, frame.shape) < replace_rate
    repl = (weakest[None] == jnp.arange(g.samples.shape[0])[:, None, None]) & do[None]
    samples = jnp.where(repl, frame[None], g.samples)
    desc = jnp.where(repl, code[None], state.desc)
    hits = jnp.where(repl, 1.0, hits)
    return LsbpState(GsocState(samples, hits, key), desc), fg
