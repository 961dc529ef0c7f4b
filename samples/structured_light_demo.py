"""Structured light demo — structured_light/samples/{capsinpattern,pointcloud}.cpp role.

Generates sinusoidal fringe patterns, simulates a camera viewing a bumpy
surface, and demodulates with all three methods (PSP / FTP / FAPS),
reporting phase RMS against ground truth.

Usage:
    python samples/structured_light_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
# FFT-domain compute: the remote-TPU tunnel's FFT compile path is
# erratically slow; these demos pin to CPU (the kernels are tiny)
jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    import jax.numpy as jnp
    from opencv_contrib_tpu.structured_light import sinusoidal as sl

    H, W = 128, 160
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    obj = 1.2 * np.exp(-(((yy - 64) / 30.0) ** 2 + ((xx - 80) / 40.0) ** 2))
    true = 2 * np.pi * 12 * xx / W + obj
    cap = jnp.asarray(np.stack(
        [0.5 + 0.45 * np.cos(true + 2 * np.pi * k / 3) for k in range(3)]
    ).astype(np.float32))

    mask = sl.compute_shadow_mask(cap)
    psp, amp = sl.compute_psp_phase(cap)
    ftp = sl.compute_ftp_phase(cap[0], mask)
    faps = sl.compute_faps_phase(cap, mask)

    def err(est, sign):
        d = np.angle(np.exp(1j * (np.asarray(est) - sign * true)))[12:-12, 12:-12]
        return np.abs(np.angle(np.exp(1j * (d - np.median(d))))).mean()

    print(f"PSP  phase err: {err(psp, 1):.4f} rad  (3 patterns)")
    print(f"FTP  phase err: {err(ftp, -1):.4f} rad  (1 pattern)")
    print(f"FAPS phase err: {err(faps, -1):.4f} rad  (3 patterns, marker-robust)")


if __name__ == "__main__":
    main()
