"""TUM RGB-D sequence writer (the on-disk format of fr1/desk etc.).

Lets the synthetic SDF scenes produce a REAL TUM-layout dataset —
rgb/ + depth/ 16-bit PNGs, rgb.txt / depth.txt indices, groundtruth.txt
quaternion trajectory — so the full data path (reader -> native loader ->
KinFu -> ATE) can be driven end-to-end without the real download
(reference gates: rgbd/test/test_kinfu.cpp:326-330; format:
datasets/src/slam_*.cpp and the TUM benchmark tools).
"""

from __future__ import annotations

import os

import numpy as np


def write_tum_sequence(root: str, depths_m, poses_c2w, rgbs=None,
                       fps: float = 30.0, depth_scale: float = 5000.0):
    """Write a TUM-layout sequence.

    depths_m: list of (H, W) float32 depth maps in meters (0 = invalid).
    poses_c2w: list of (4, 4) camera->world poses (groundtruth.txt rows).
    rgbs: optional list of (H, W[, 3]) float images; synthesized if None.
    """
    from PIL import Image

    import jax.numpy as jnp
    from opencv_contrib_tpu.core import se3

    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    rgb_rows, depth_rows, gt_rows = [], [], []
    for i, d in enumerate(depths_m):
        t = i / fps
        ts = f"{t:.6f}"
        d16 = np.clip(np.asarray(d, np.float64) * depth_scale,
                      0, 65535).astype(np.uint16)
        Image.fromarray(d16).save(os.path.join(root, "depth", f"{ts}.png"))
        depth_rows.append(f"{ts} depth/{ts}.png")
        if rgbs is not None:
            rgb = np.asarray(rgbs[i])
        else:
            # shaded depth as a stand-in rgb stream
            rgb = np.clip(np.asarray(d) / 4.0, 0, 1)
        if rgb.ndim == 2:
            rgb = np.stack([rgb] * 3, axis=-1)
        Image.fromarray((np.clip(rgb, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(root, "rgb", f"{ts}.png"))
        rgb_rows.append(f"{ts} rgb/{ts}.png")

        T = np.asarray(poses_c2w[i], np.float64)
        q = np.asarray(se3.mat_to_quat(jnp.asarray(T[:3, :3], jnp.float32)))
        w, x, y, z = (float(v) for v in q)
        tx, ty, tz = T[:3, 3]
        gt_rows.append(f"{ts} {tx:.6f} {ty:.6f} {tz:.6f} "
                       f"{x:.6f} {y:.6f} {z:.6f} {w:.6f}")

    for name, rows, hdr in (("rgb.txt", rgb_rows, "color images"),
                            ("depth.txt", depth_rows, "depth maps"),
                            ("groundtruth.txt", gt_rows, "ground truth")):
        with open(os.path.join(root, name), "w") as f:
            f.write(f"# {hdr}\n# timestamp data\n")
            f.write("\n".join(rows) + "\n")
