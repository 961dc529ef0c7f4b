"""Stereo matching demo — stereo/samples/sample.cpp role.

Builds a synthetic two-layer stereo pair with known disparity and runs
block matching and census-SGM with left-right checking, reporting
bad-pixel rates on valid pixels.

Usage:
    python samples/stereo_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np


def main():
    import jax.numpy as jnp
    from opencv_contrib_tpu import stereo
    from opencv_contrib_tpu.ops import filters

    rng = np.random.default_rng(0)
    H, W = 96, 128
    tex = rng.uniform(0, 1, (H, W)).astype(np.float32)
    left = np.asarray(filters.gaussian_blur(jnp.asarray(tex), 1.0))
    # two-layer scene: background disparity 4, foreground square 10
    disp_gt = np.full((H, W), 4, np.float32)
    disp_gt[30:70, 45:95] = 10.0
    xs = np.arange(W)[None, :].repeat(H, 0)
    src = np.clip(xs + disp_gt.astype(int), 0, W - 1)
    right_rows = [left[y, src[y]] for y in range(H)]
    right = np.stack(right_rows)

    for name, disp_valid in (
            ("block match", stereo.block_match(jnp.asarray(left), jnp.asarray(right), max_disp=16)),
            ("census SGM", stereo.sgm_match(jnp.asarray(left), jnp.asarray(right), max_disp=16))):
        disp, valid = disp_valid
        d = np.asarray(disp)[8:-8, 16:-16]
        v = np.asarray(valid)[8:-8, 16:-16] if valid is not None else np.ones_like(d, bool)
        gt = disp_gt[8:-8, 16:-16]
        bad = (np.abs(d[v] - gt[v]) > 1).mean()
        print(f"{name}: valid {v.mean():.2f}, bad-pixel rate {bad:.3f}")


if __name__ == "__main__":
    main()
