"""Sinusoidal-pattern profilometry: PSP, FTP and FAPS demodulation.

Parity: structured_light/src/sinusoidalpattern.cpp —
- PSP N-step phase shifting (computePsPhaseMap, :309);
- FTP Fourier-transform profilometry (:287-306): DC-suppressed sideband
  band-pass in the spectrum, inverse DFT of the half-spectrum, phase of
  the analytic signal (computeFtPhaseMap :476);
- FAPS Fourier-assisted phase shifting (:340-390): per-pattern FTP phase,
  unwrap, pairwise phase differences theta1/theta2 feeding the
  computeFapsPhaseMap closed form (:677-717).

TPU-first: spectra via jnp.fft (one fused program); the reference's
spectrum maximum search + rectangular band-pass become argmax + a
coordinate-mask multiply (no dynamic slicing).
"""

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


def compute_shadow_mask(captured: jnp.ndarray, thresh: float = 0.1) -> jnp.ndarray:
    """Valid where at least one pattern lights the pixel
    (computeShadowMask)."""
    rng = captured.max(axis=0) - captured.min(axis=0)
    return (captured.max(axis=0) > thresh) & (rng > 0.02)


def _sideband_analytic(img: jnp.ndarray, dc_half: int = 5, bp_half: int = 21):
    """DC-suppressed carrier-sideband band-pass of one fringe image ->
    complex analytic signal (the FTP spectrum pipeline: computeDft ->
    swapQuadrants -> frequencyFiltering(DC out) -> findMaxInHalvesTransform
    -> frequencyFiltering(keep band) -> inverse DFT)."""
    H, W = img.shape
    F = jnp.fft.fftshift(jnp.fft.fft2(img))
    cy, cx = H // 2, W // 2
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    # suppress the DC block
    dc = (jnp.abs(yy - cy) <= dc_half) & (jnp.abs(xx - cx) <= dc_half)
    F = jnp.where(dc, 0.0 + 0.0j, F)
    # carrier peak in the right half-plane (positive-frequency sideband)
    mag = jnp.abs(F) * (xx > cx)
    idx = jnp.argmax(mag)
    my, mx = idx // W, idx % W
    band = (jnp.abs(yy - my) <= bp_half) & (jnp.abs(xx - mx) <= bp_half)
    Fb = jnp.where(band, F, 0.0 + 0.0j)
    return jnp.fft.ifft2(jnp.fft.ifftshift(Fb))


def compute_ftp_phase(img: jnp.ndarray, mask: jnp.ndarray | None = None):
    """FTP wrapped phase of a single fringe image (computeFtPhaseMap,
    sinusoidalpattern.cpp:476: atan2(re, im) of the analytic signal).
    Returns phase in (-pi, pi], zero outside the mask."""
    z = _sideband_analytic(img)
    phase = jnp.arctan2(z.real, z.imag)
    if mask is not None:
        phase = phase * mask
    return phase


def compute_faps_phase(captured: jnp.ndarray, mask: jnp.ndarray | None = None):
    """FAPS wrapped phase from 3 shifted fringe images
    (sinusoidalpattern.cpp:340-390 + computeFapsPhaseMap :677):
    per-pattern FTP phase -> unwrap -> theta1/theta2 phase-step estimates,
    then atan2((1-cos t2) a + (1-cos t1) b, sin(t1) b - sin(t2) a) with
    a = f0-f1, b = f1-f2 of the band-passed (marker-free) patterns."""
    from opencv_contrib_tpu.phase_unwrapping.unwrap import unwrap_phase_dct

    if mask is None:
        mask = compute_shadow_mask(captured)
    z = [_sideband_analytic(captured[i]) for i in range(3)]
    # band-passed real patterns (computeInverseDft(..., true) magnitude-real
    # path): the filtered fringe without DC/markers
    f = [2.0 * zi.real for zi in z]

    def unwrap_anchored(psi):
        # the DCT least-squares unwrap is gradient-based and loses the
        # global constant — but theta1/theta2 ARE that constant (the
        # phase-shift step). Re-anchor so u == psi (mod 2pi) on average,
        # like the reference's congruent HistogramPhaseUnwrapping.
        u = unwrap_phase_dct(psi)
        off = jnp.angle(jnp.mean(jnp.exp(1j * (psi - u))))
        return u + off

    u = [unwrap_anchored(jnp.arctan2(zi.real, zi.imag)) for zi in z]
    a = f[0] - f[1]
    b = f[1] - f[2]
    t1 = u[1] - u[0]
    t2 = u[2] - u[1]
    num = (1.0 - jnp.cos(t2)) * a + (1.0 - jnp.cos(t1)) * b
    den = jnp.sin(t1) * b - jnp.sin(t2) * a
    return jnp.arctan2(num, den) * mask
