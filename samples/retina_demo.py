"""Bioinspired retina demo — bioinspired/samples/retinaDemo.cpp role.

Runs the retina model over a short sequence: parvo (detail/tone mapping)
and magno (transient/motion) channel statistics, plus fast tone mapping
of a high-dynamic-range fixture.

Usage:
    python samples/retina_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np


def main():
    import jax.numpy as jnp
    from opencv_contrib_tpu.bioinspired import Retina, fast_tone_mapping

    rng = np.random.default_rng(0)
    H, W = 96, 128
    bg = rng.uniform(0.3, 0.7, (H, W)).astype(np.float32)
    for _ in range(2):
        bg = (bg + np.roll(bg, 1, 0) + np.roll(bg, 1, 1)) / 3.0

    ret = Retina((H, W))
    for t in range(10):
        frame = bg.copy()
        x = 10 + 9 * t
        frame[40:56, x:x + 14] = 1.0  # moving bright patch
        parvo, magno = ret.run(jnp.asarray(frame))
    m = np.asarray(magno)
    print(f"parvo mean {float(np.asarray(parvo).mean()):.3f}; "
          f"magno on mover {m[40:56, x:x+14].mean():.3f} vs static {m[:30].mean():.3f}")

    hdr = np.exp(rng.normal(0, 2.0, (H, W))).astype(np.float32)
    ldr = np.asarray(fast_tone_mapping(jnp.asarray(hdr)))

    def drange(a):  # robust dynamic range (p99 / p1)
        return np.percentile(a, 99) / max(np.percentile(a, 1), 1e-6)

    print(f"tone mapping: p99/p1 dynamic range {drange(hdr):.0f}x -> "
          f"{drange(ldr):.1f}x (output rescaled to input peak, as the "
          f"reference does)")


if __name__ == "__main__":
    main()
