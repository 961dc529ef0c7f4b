"""MOG background subtraction: per-pixel Gaussian mixtures.

Parity: BackgroundSubtractorMOG (bgsegm.hpp:62; Stauffer-Grimson) — K
gaussians per pixel with weight/mean/variance, matched-component update,
weakest-component replacement, foreground = no match among high-weight
components.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class MogState(NamedTuple):
    weight: jnp.ndarray  # (H, W, K)
    mean: jnp.ndarray  # (H, W, K)
    var: jnp.ndarray  # (H, W, K)


def mog_create(shape, n_mixtures: int = 5, init_var: float = 0.01) -> MogState:
    H, W = shape
    K = n_mixtures
    return MogState(
        weight=jnp.zeros((H, W, K)).at[..., 0].set(1.0),
        mean=jnp.zeros((H, W, K)),
        var=jnp.full((H, W, K), init_var),
    )


@partial(jax.jit, static_argnames=("lr",))
def mog_apply(state: MogState, frame: jnp.ndarray, lr: float = 0.05, var_thresh: float = 6.25, bg_ratio: float = 0.7):
    """One frame -> (new_state, fg_mask (H, W) bool)."""
    d2 = (frame[..., None] - state.mean) ** 2 / jnp.maximum(state.var, 1e-6)
    match = d2 < var_thresh  # (H, W, K)
    # only the best-matching component updates
    best = jnp.argmin(jnp.where(match, d2, jnp.inf), axis=-1)
    onehot = jax.nn.one_hot(best, state.weight.shape[-1], dtype=frame.dtype)
    any_match = match.any(axis=-1)
    upd = onehot * any_match[..., None]

    w = (1 - lr) * state.weight + lr * upd
    rho = lr
    mean = jnp.where(upd > 0, (1 - rho) * state.mean + rho * frame[..., None], state.mean)
    var = jnp.where(
        upd > 0,
        jnp.maximum((1 - rho) * state.var + rho * (frame[..., None] - mean) ** 2, 1e-4),
        state.var,
    )

    # no match: replace weakest component
    weakest = jnp.argmin(w, axis=-1)
    wh = jax.nn.one_hot(weakest, w.shape[-1], dtype=frame.dtype) * (~any_match)[..., None]
    mean = jnp.where(wh > 0, frame[..., None], mean)
    var = jnp.where(wh > 0, 0.04, var)
    w = jnp.where(wh > 0, 0.05, w)
    w = w / jnp.maximum(w.sum(axis=-1, keepdims=True), 1e-9)

    # foreground: pixel not matching any "background" component. Components
    # sorted by weight/sqrt(var); top ones summing to bg_ratio are background.
    rank_key = -w / jnp.sqrt(var)
    order = jnp.argsort(rank_key, axis=-1)
    w_sorted = jnp.take_along_axis(w, order, axis=-1)
    csum = jnp.cumsum(w_sorted, axis=-1)
    is_bg_sorted = (csum - w_sorted) < bg_ratio
    # scatter back component-is-background flags
    is_bg = jnp.zeros_like(w, dtype=bool)
    is_bg = jax.vmap(jax.vmap(lambda b, o, v: b.at[o].set(v)))(is_bg, order, is_bg_sorted)
    fg = ~jnp.any(match & is_bg, axis=-1)
    return MogState(w, mean, var), fg
