"""Two-pass stabilization: estimate inter-frame motions, smooth the
accumulated trajectory, re-warp frames (TwoPassStabilizer semantics)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from opencv_contrib_tpu import reg
from opencv_contrib_tpu.ops.image import warp_affine


def estimate_motions(frames, model: str = "similarity"):
    """Per-pair motion parameters p_i mapping frame i -> frame i+1 frame
    coordinates (MotionEstimator role). Returns (N-1, P) array."""
    ps = []
    for a, b in zip(frames[:-1], frames[1:]):
        ps.append(np.asarray(reg.register_pyramid(np.asarray(a), np.asarray(b), model=model, levels=3, iters=12)))
    return np.stack(ps)


def smooth_trajectory(motions: np.ndarray, sigma: float = 2.0) -> np.ndarray:
    """Gaussian-smooth the cumulative trajectory; return per-frame
    compensation parameters (GaussianMotionFilter role)."""
    traj = np.concatenate([np.zeros((1, motions.shape[1])), np.cumsum(motions, axis=0)])
    n = len(traj)
    radius = max(1, int(3 * sigma))
    k = np.exp(-0.5 * (np.arange(-radius, radius + 1) / sigma) ** 2)
    k /= k.sum()
    padded = np.concatenate([np.repeat(traj[:1], radius, 0), traj, np.repeat(traj[-1:], radius, 0)])
    smoothed = np.stack([np.convolve(padded[:, d], k, "valid") for d in range(traj.shape[1])], axis=1)
    return smoothed - traj  # compensation per frame


def stabilize(frames, model: str = "similarity", sigma: float = 2.0):
    """Full pipeline -> list of stabilized frames."""
    motions = estimate_motions(frames, model)
    comp = smooth_trajectory(motions, sigma)
    out = []
    for f, p in zip(frames, comp):
        out.append(np.asarray(reg.warp_with_params(model, jnp.asarray(-p, jnp.float32), jnp.asarray(f))))
    return out, motions, comp
