"""GMG background subtraction.

Reference anchor: bgsegm/src/bgfg_gmg.cpp (BackgroundSubtractorGMG,
bgsegm.hpp:125): per-pixel quantized color histograms accumulated over an
initialization window; posterior P(bg|color) thresholded with decision
smoothing.

TPU-first: the histogram bank is a (B, H, W) tensor updated by one-hot
adds; the whole step is a fused program.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class GmgState(NamedTuple):
    hist: jnp.ndarray  # (B, H, W) quantized color histogram
    frame_count: jnp.ndarray  # ()


def gmg_create(shape, n_bins: int = 16) -> GmgState:
    return GmgState(jnp.zeros((n_bins,) + tuple(shape)), jnp.zeros((), jnp.int32))


@partial(jax.jit, static_argnames=("init_frames",))
def gmg_apply(state: GmgState, frame, init_frames: int = 20,
              decision_thresh: float = 0.8, lr: float = 0.025):
    """One GMG step. During the first init_frames everything is background
    and the histograms accumulate; afterwards a pixel is foreground when
    its color's histogram mass is low. Returns (state, fg_mask)."""
    B = state.hist.shape[0]
    q = jnp.clip((frame * B).astype(jnp.int32), 0, B - 1)
    onehot = (q[None] == jnp.arange(B)[:, None, None]).astype(jnp.float32)
    initializing = state.frame_count < init_frames
    # accumulate during init; slow exponential update after
    hist = jnp.where(initializing, state.hist + onehot,
                     (1 - lr) * state.hist + lr * onehot)
    total = jnp.maximum(hist.sum(0), 1e-6)
    # smooth over adjacent bins: colors near a quantization boundary split
    # their mass between two bins and must not read as foreground
    hist_s = hist + 0.5 * (jnp.roll(hist, 1, 0) + jnp.roll(hist, -1, 0))
    hist_s = hist_s / jnp.maximum(hist_s.sum(0), 1e-6) * total
    p_bg = (hist_s * onehot).sum(0) / total
    fg = (~initializing) & (p_bg < 1.0 - decision_thresh)
    return GmgState(hist, state.frame_count + 1), fg
