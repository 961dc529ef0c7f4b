"""CNT background subtraction: per-pixel stability counters.

Parity: BackgroundSubtractorCNT (bgsegm.hpp:250) — a pixel becomes
background after being stable for minPixelStability frames; foreground when
it deviates from the learned stable value.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class CntState(NamedTuple):
    stable_val: jnp.ndarray  # (H, W)
    stability: jnp.ndarray  # (H, W) int32 counter
    bg_val: jnp.ndarray  # (H, W)
    has_bg: jnp.ndarray  # (H, W) bool


def cnt_create(shape) -> CntState:
    H, W = shape
    return CntState(
        stable_val=jnp.zeros((H, W)),
        stability=jnp.zeros((H, W), jnp.int32),
        bg_val=jnp.zeros((H, W)),
        has_bg=jnp.zeros((H, W), bool),
    )


@partial(jax.jit, static_argnames=("min_stability",))
def cnt_apply(state: CntState, frame: jnp.ndarray, threshold: float = 0.04, min_stability: int = 15):
    """One frame -> (new_state, fg_mask)."""
    close = jnp.abs(frame - state.stable_val) < threshold
    stability = jnp.where(close, state.stability + 1, 0)
    stable_val = jnp.where(close, state.stable_val, frame)
    promote = stability >= min_stability
    bg_val = jnp.where(promote, stable_val, state.bg_val)
    has_bg = state.has_bg | promote
    fg = has_bg & (jnp.abs(frame - bg_val) >= threshold)
    return CntState(stable_val, stability, bg_val, has_bg), fg
