"""Motion saliency: per-pixel temporal background model
(MotionSaliencyBinWangApr2014 contract, simplified: running mean/variance
model; salient = statistically unlikely pixels)."""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class MotionSaliency(NamedTuple):
    mean: jnp.ndarray
    var: jnp.ndarray
    frames: jnp.ndarray  # scalar count


def motion_create(shape) -> MotionSaliency:
    return MotionSaliency(jnp.zeros(shape), jnp.full(shape, 0.01), jnp.zeros(()))


@partial(jax.jit, static_argnames=("lr",))
def motion_apply(state: MotionSaliency, frame: jnp.ndarray, lr: float = 0.05, k: float = 3.0):
    d2 = (frame - state.mean) ** 2
    sal = d2 > k * k * state.var
    # warm-start: running average while few frames seen, EMA afterwards
    lr_eff = jnp.maximum(lr, 1.0 / (state.frames + 1.0))
    mean = (1 - lr_eff) * state.mean + lr_eff * frame
    # first frame: d2 measures distance to the zero-init mean, not noise —
    # keep the prior variance instead of poisoning the model
    var_upd = jnp.maximum((1 - lr_eff) * state.var + lr_eff * d2, 1e-4)
    var = jnp.where(state.frames < 1, state.var, var_upd)
    # warm-up: nothing is salient for the first frames
    ready = state.frames > 5
    return MotionSaliency(mean, var, state.frames + 1), sal & ready
