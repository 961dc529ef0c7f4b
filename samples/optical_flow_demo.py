"""Dense optical flow demo — optflow samples parity.

With two image paths (or a Sintel frame pair + .flo ground truth) computes
DIS-class flow and reports EPE; with no arguments runs on a synthetic warp.

Usage:
    python samples/optical_flow_demo.py [img1 img2 [gt.flo]]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opencv_contrib_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

import sys

import numpy as np
import jax.numpy as jnp


def run(img1_path, img2_path, gt_path=None):
    from opencv_contrib_tpu.flow import dis
    from opencv_contrib_tpu.utils import io, datasets

    I0 = io.imread(img1_path, gray=True)
    I1 = io.imread(img2_path, gray=True)
    flow = dis.compute(I0, I1, levels=5)
    print(f"flow range dy [{float(flow[...,0].min()):.2f}, {float(flow[...,0].max()):.2f}] "
          f"dx [{float(flow[...,1].min()):.2f}, {float(flow[...,1].max()):.2f}]")
    if gt_path:
        gt_xy = datasets.read_flo(gt_path)
        gt_yx = gt_xy[..., ::-1]
        epe = float(dis.epe(flow, jnp.asarray(gt_yx)))
        print(f"EPE vs {gt_path}: {epe:.3f} px")
    return flow


def demo_synthetic():
    from opencv_contrib_tpu.flow import dis, tvl1
    from opencv_contrib_tpu.ops import filters
    from opencv_contrib_tpu.ops.image import warp_affine

    rng = np.random.default_rng(0)
    I0 = np.asarray(filters.gaussian_blur(jnp.asarray(rng.uniform(size=(128, 192)).astype(np.float32)), 1.5)) * 4
    M = jnp.array([[1.0, 0.0, 1.5], [0.0, 1.0, -2.0]])
    I1 = np.asarray(warp_affine(jnp.asarray(I0), M))
    gt = np.tile(np.array([2.0, -1.5], np.float32), (128, 192, 1))
    for name, f in [("DIS", dis.compute(I0, I1, levels=3)), ("TV-L1", tvl1.compute(I0, I1, levels=3))]:
        e = float(dis.epe(jnp.asarray(f)[8:-8, 8:-8], jnp.asarray(gt)[8:-8, 8:-8]))
        print(f"{name}: EPE {e:.3f} px (synthetic (+2, -1.5) shift)")


if __name__ == "__main__":
    if len(sys.argv) >= 3:
        run(*sys.argv[1:4])
    else:
        demo_synthetic()
