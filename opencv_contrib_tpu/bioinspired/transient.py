"""Transient areas segmentation (bioinspired's motion-event detector).

Reference anchor: bioinspired/src/transientareassegmentationmodule.cpp
(TransientAreasSegmentationModule::run — three low-passed context maps of
the magno motion energy: local, neighborhood, global; a pixel is
'transient' when its local energy exceeds the context by a threshold).

TPU-first: the three context maps are Gaussian blurs of the shared energy
map; the whole segmentation step is one fused elementwise program over the
state carried between frames.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ops import filters


class TransientState(NamedTuple):
    local_e: jnp.ndarray  # temporally smoothed local motion energy
    nbhd_e: jnp.ndarray  # neighborhood context
    global_e: jnp.ndarray  # wide context


def transient_create(shape) -> TransientState:
    z = jnp.zeros(shape)
    return TransientState(z, z, z)


@jax.jit
def transient_run(state: TransientState, magno_out, local_sigma: float = 1.5,
                  nbhd_sigma: float = 6.0, temporal: float = 0.5,
                  context_gain: float = 1.15):
    """One step: returns (state, segmentation mask). magno_out is the
    retina's magnocellular (motion) channel for the frame."""
    e = jnp.abs(magno_out)
    loc = filters.gaussian_blur(e, local_sigma)
    nbh = filters.fast_gaussian_blur(e, nbhd_sigma)
    glo = jnp.full_like(e, e.mean())
    local_e = (1 - temporal) * state.local_e + temporal * loc
    nbhd_e = (1 - temporal) * state.nbhd_e + temporal * nbh
    global_e = (1 - temporal) * state.global_e + temporal * glo
    # context = blend of neighborhood and global energy: the pure
    # center-surround comparison goes blind deep inside LARGE transient
    # regions (local ~ nbhd there); the global term keeps them segmented
    seg = local_e > context_gain * (0.5 * nbhd_e + 0.5 * global_e)
    return TransientState(local_e, nbhd_e, global_e), seg
