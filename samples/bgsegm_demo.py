"""Background subtraction demo — bgsegm/samples/bgfg.cpp role.

Runs MOG / CNT / GSOC over the synthetic moving-object sequence and
reports foreground IoU against ground truth.

Usage:
    python samples/bgsegm_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np


def main():
    import jax.numpy as jnp
    from opencv_contrib_tpu import bgsegm

    seqs = list(bgsegm.synthetic_sequence(n_frames=30, shape=(64, 64)))
    for name, create, apply_ in (
            ("MOG", bgsegm.mog_create, bgsegm.mog_apply),
            ("CNT", bgsegm.cnt_create, bgsegm.cnt_apply),
            ("GSOC", bgsegm.gsoc_create, bgsegm.gsoc_apply)):
        st = create((64, 64))
        ious = []
        for i, (frame, gt) in enumerate(seqs):
            st, fg = apply_(st, jnp.asarray(frame))
            if i >= 18:  # after warm-up (sample-based models adapt slower)
                f = np.asarray(fg) > 0.5
                inter = (f & gt).sum()
                union = (f | gt).sum()
                ious.append(inter / max(union, 1))
        print(f"{name}: mean foreground IoU {np.mean(ious):.3f}")


if __name__ == "__main__":
    main()
