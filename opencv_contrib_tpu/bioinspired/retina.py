"""Retina model: photoreceptor adaptation + parvo (detail) and magno
(motion/transient) channels."""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ops import filters


class RetinaState(NamedTuple):
    adapted: jnp.ndarray  # photoreceptor temporal state
    horizontal: jnp.ndarray  # horizontal-cell state (low-pass surround)
    magno_prev: jnp.ndarray  # previous parvo output (for transients)
    magno_lp: jnp.ndarray  # magno temporal low-pass


class Retina:
    """run(frame) -> (parvo, magno); getParvo/getMagno-style channels."""

    def __init__(self, shape, photoreceptor_sigma: float = 1.0, horizontal_sigma: float = 3.0,
                 temporal_tau: float = 0.5, magno_tau: float = 0.3, compression: float = 0.3):
        self.shape = shape
        self.ps = photoreceptor_sigma
        self.hs = horizontal_sigma
        self.tau = temporal_tau
        self.mtau = magno_tau
        self.compression = compression
        self.state = RetinaState(
            adapted=jnp.zeros(shape), horizontal=jnp.zeros(shape),
            magno_prev=jnp.zeros(shape), magno_lp=jnp.zeros(shape),
        )

    def reset(self):
        z = jnp.zeros(self.shape)
        self.state = RetinaState(z, z, z, z)

    def run(self, frame):
        self.state, parvo, magno = _retina_step(
            self.state, jnp.asarray(frame, jnp.float32),
            self.ps, self.hs, self.tau, self.mtau, self.compression,
        )
        return parvo, magno


@partial(jax.jit, static_argnames=("ps", "hs", "tau", "mtau", "compression"))
def _retina_step(state: RetinaState, frame, ps, hs, tau, mtau, compression):
    # photoreceptor: divisive local luminance normalization (the
    # light-adaptation role of the Naka-Rushton stage) + temporal low-pass
    local_mean = filters.gaussian_blur(frame, ps * 4.0)
    adapted_now = frame / (local_mean + compression)
    adapted = tau * state.adapted + (1 - tau) * adapted_now

    # OPL: center (photoreceptor blur) minus surround (horizontal cells)
    center = filters.gaussian_blur(adapted, ps)
    horizontal = tau * state.horizontal + (1 - tau) * filters.gaussian_blur(adapted, hs)
    parvo = center - horizontal  # bipolar cells ON-OFF detail channel

    # magno: transient (temporal derivative) of the parvo signal, amplified
    # and low-passed spatially
    transient = jnp.abs(parvo - state.magno_prev)
    magno_lp = mtau * state.magno_lp + (1 - mtau) * transient
    magno = filters.gaussian_blur(magno_lp, hs)

    new_state = RetinaState(adapted=adapted, horizontal=horizontal, magno_prev=parvo, magno_lp=magno_lp)
    return new_state, parvo, magno
