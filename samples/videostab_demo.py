"""Video stabilization demo — videostab/samples/videostab.cpp role.

Builds a shaky synthetic sequence, runs the estimate->smooth->compensate
pipeline, and reports inter-frame jitter before/after.

Usage:
    python samples/videostab_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np


def main():
    from opencv_contrib_tpu import videostab

    rng = np.random.default_rng(0)
    tex = rng.uniform(0, 1, (160, 200)).astype(np.float32)
    for _ in range(2):
        tex = (tex + np.roll(tex, 1, 0) + np.roll(tex, 1, 1)) / 3.0
    frames = []
    jitter = np.cumsum(rng.normal(0, 1.5, (16, 2)), axis=0)
    for t in range(16):
        dy, dx = np.round(jitter[t]).astype(int)
        frames.append(np.roll(np.roll(tex, dy, 0), dx, 1)[16:144, 20:180])

    def mean_abs_diff(fs):
        return float(np.mean([np.abs(a - b).mean() for a, b in zip(fs[:-1], fs[1:])]))

    out, motions, comp = videostab.stabilize(frames, model="similarity", sigma=3.0)
    print(f"inter-frame mean |diff|: shaky {mean_abs_diff(frames):.4f} -> "
          f"stabilized {mean_abs_diff(out):.4f}")


if __name__ == "__main__":
    main()
