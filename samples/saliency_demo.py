"""Saliency demo — saliency/samples/computeSaliency.cpp role.

Runs spectral-residual and fine-grained static saliency plus motion
saliency over a synthetic scene with an inserted object.

Usage:
    python samples/saliency_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np


def main():
    import jax.numpy as jnp
    from opencv_contrib_tpu import saliency

    rng = np.random.default_rng(0)
    bg = rng.uniform(0.4, 0.6, (96, 128)).astype(np.float32)
    for _ in range(3):
        bg = (bg + np.roll(bg, 1, 0) + np.roll(bg, 1, 1)) / 3.0
    img = bg.copy()
    img[36:60, 50:80] = 0.95  # salient object

    for name, fn in (("spectral residual", saliency.spectral_residual),
                     ("fine grained", saliency.fine_grained)):
        m = np.asarray(fn(jnp.asarray(img)))
        inside = m[36:60, 50:80].mean()
        outside = (m.sum() - m[36:60, 50:80].sum()) / (m.size - 24 * 30)
        print(f"{name}: object saliency {inside:.3f} vs background {outside:.3f}")

    st = saliency.motion_create((96, 128))
    for t in range(12):
        frame = bg.copy()
        x = 10 + 8 * t
        frame[40:56, x:x + 16] = 0.9
        st, sal = saliency.motion_apply(st, jnp.asarray(frame))
    m = np.asarray(sal)
    print(f"motion saliency: moving-region mean {m[40:56, x:x+16].mean():.3f}, "
          f"static mean {m[:30].mean():.3f}")


if __name__ == "__main__":
    main()
