"""Phase-shifting profilometry (SinusoidalPattern PSP parity)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def generate_psp_patterns(proj_w: int, proj_h: int, n_periods: int = 8, n_shifts: int = 3):
    """n_shifts phase-shifted sinusoidal fringe patterns (P, H, W) in [0,1]."""
    x = jnp.arange(proj_w, dtype=jnp.float32)
    pats = []
    for k in range(n_shifts):
        phase = 2 * jnp.pi * n_periods * x / proj_w + 2 * jnp.pi * k / n_shifts
        row = 0.5 + 0.5 * jnp.cos(phase)
        pats.append(jnp.broadcast_to(row[None, :], (proj_h, proj_w)))
    return jnp.stack(pats)


def compute_psp_phase(captured: jnp.ndarray):
    """Wrapped phase + modulation amplitude from N-step phase shifting.

    captured (N, H, W). Returns (wrapped phase (-pi, pi], amplitude)."""
    N = captured.shape[0]
    k = jnp.arange(N, dtype=jnp.float32)
    s = jnp.einsum("n,nhw->hw", jnp.sin(2 * jnp.pi * k / N), captured)
    c = jnp.einsum("n,nhw->hw", jnp.cos(2 * jnp.pi * k / N), captured)
    phase = -jnp.arctan2(s, c)
    amp = 2.0 / N * jnp.sqrt(s * s + c * c)
    return phase, amp
