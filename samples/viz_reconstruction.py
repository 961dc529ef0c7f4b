"""Offscreen visualization of a KinFu reconstruction (viz-module demo).

Reference analog: rgbd/samples/kinfu_demo.cpp's viz window + sfm's
scene_reconstruction viewer — here rendered headless on the TPU: run a few
KinFu frames on a synthetic SDF scene, extract the TSDF point cloud, and
rasterize a turntable of PNG frames (cloud + camera trajectory + axes).

Usage: python samples/viz_reconstruction.py [outdir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opencv_contrib_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

import numpy as np
import jax.numpy as jnp

from opencv_contrib_tpu.rgbd import kinfu, tsdf
from opencv_contrib_tpu.utils import sdf_scene
from opencv_contrib_tpu.viz import (Viz3d, cloud, coordinate_system,
                                    trajectory, viewer_pose)
from opencv_contrib_tpu import freetype


def main(outdir="./viz_out", n_frames=6, n_views=8):
    os.makedirs(outdir, exist_ok=True)
    intr = np.array([120.0, 120.0, 80.0, 60.0], np.float32)
    shape = (120, 160)

    poses = sdf_scene.orbit_poses(n_frames, sweep=0.5)
    p = kinfu.KinFuParams.default(intr, shape)
    p.volume_resolution = (128, 128, 128)
    p.volume_size = 3.2
    p.volume_center = (0.0, 0.0, 2.2)
    p.sparse_blocks = 512
    kf = kinfu.KinFu(p)

    cam_poses = []
    for i, pose in enumerate(poses):
        d = sdf_scene.render_depth(jnp.asarray(pose), jnp.asarray(intr),
                                   shape=shape)
        ok = kf.update(d)
        cam_poses.append(kf.pose)
        print(f"frame {i}: tracked={bool(ok)}")

    pts, nrm, valid = tsdf.extract_points(kf.volume, max_points=16384)
    pts = np.asarray(pts)[np.asarray(valid)]
    nrm = np.asarray(nrm)[np.asarray(valid)]
    print(f"extracted {len(pts)} surface points")

    # color by normal direction (like viz cloud shading)
    colors = np.abs(nrm) * 0.7 + 0.3

    v = Viz3d(size=(640, 480), background=(0.05, 0.05, 0.08))
    v.show_widget("cloud", cloud(pts, colors))
    v.show_widget("cs", coordinate_system(scale=0.4))
    v.show_widget("traj", trajectory(np.stack(cam_poses), scale=0.12,
                                     color=(0.2, 0.9, 0.2)))

    center = pts.mean(0) if len(pts) else np.array([0, 0, 2.2])
    for k in range(n_views):
        ang = 2 * np.pi * k / n_views
        eye = center + np.array([2.5 * np.sin(ang), -1.2, 2.5 * np.cos(ang)])
        v.set_viewer_pose(viewer_pose(eye, center))
        img = v.render()
        img = freetype.put_text(img, f"kinfu cloud  view {k}", (8, 8), 16,
                                (1.0, 1.0, 0.3))
        path = os.path.join(outdir, f"view_{k:02d}.png")
        from opencv_contrib_tpu.utils import io
        io.imwrite(path, (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8))
        print("wrote", path)


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["./viz_out"]))
