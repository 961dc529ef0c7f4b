"""KinectFusion demo — the kinfu_demo sample.

Parity: rgbd/samples/kinfu_demo.cpp. With a TUM RGB-D sequence directory it
runs KinFu over the real depth stream (native threaded loader when built)
and reports ATE against ground truth; with no arguments it runs on the
synthetic SDF orbit.

Usage:
    python samples/kinfu_demo.py [tum_sequence_dir] [n_frames]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opencv_contrib_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

import sys

import numpy as np
import jax.numpy as jnp


def run_tum(root, n_frames=100):
    from opencv_contrib_tpu.rgbd import kinfu
    from opencv_contrib_tpu.utils import datasets, metrics, native
    from opencv_contrib_tpu.ops.image import resize

    seq = datasets.load_tum(root)
    intr_full = datasets.TUM_FR1_INTR if "freiburg1" in root else datasets.TUM_DEFAULT_INTR
    # quarter resolution for speed: 160x120
    scale = 0.25
    intr = intr_full.copy()
    intr[:4] *= scale
    p = kinfu.KinFuParams.default(intr, (120, 160))
    p.volume_size = 4.0
    p.volume_center = (0.0, 0.0, 1.8)
    kf = kinfu.KinFu(p)

    est_poses, gt_poses = [], []
    use_native = native.available()
    frames = native.TumLoader(root) if use_native else None

    def frame_iter():
        if use_native:
            for t_rgb, rgb, t_depth, depth in frames:
                yield t_depth, depth
        else:
            from opencv_contrib_tpu.utils import io
            import os
            for pair in seq.pairs:
                yield pair[2], io.imread_depth_tum(os.path.join(root, pair[3]))

    n_ok = 0
    for i, (t_depth, depth) in enumerate(frame_iter()):
        if i >= n_frames:
            break
        d = np.asarray(resize(jnp.asarray(depth), (120, 160), method="nearest"))
        ok = kf.update(d)
        if not ok:
            print(f"frame {i}: tracking lost, reset")
            kf.reset()
            continue
        n_ok += 1
        est_poses.append(kf.pose)
        if seq.gt is not None:
            gt_poses.append(datasets.tum_gt_pose_at(seq.gt, t_depth))

    print(f"tracked {n_ok}/{min(n_frames, len(seq.pairs))} frames")
    if gt_poses:
        ate = metrics.ate_rmse(np.stack(est_poses), np.stack(gt_poses))
        print(f"ATE RMSE: {ate:.4f} m")
    return est_poses


def demo_synthetic():
    from opencv_contrib_tpu.rgbd import kinfu
    from opencv_contrib_tpu.utils import sdf_scene
    from opencv_contrib_tpu.core import se3

    INTR = np.array([120.0, 120.0, 80.0, 60.0, 0, 0, 0, 0, 0], np.float32)
    poses = sdf_scene.orbit_poses(10, sweep=0.6)
    p = kinfu.KinFuParams.default(INTR, (120, 160))
    p.volume_size = 3.2
    p.volume_center = (0, 0, 2.2)
    kf = kinfu.KinFu(p)
    for i, T in enumerate(poses):
        d = np.asarray(sdf_scene.render_depth(jnp.asarray(T), jnp.asarray(INTR), shape=(120, 160)))
        ok = kf.update(d)
        print(f"frame {i}: {'ok' if ok else 'LOST'}")
    T_gt = se3.inverse(jnp.asarray(poses[0])) @ jnp.asarray(poses[-1])
    drift = np.asarray(se3.log_se3(se3.inverse(T_gt) @ jnp.asarray(kf.pose)))
    print(f"final drift: rot {np.linalg.norm(drift[:3]):.4f} rad, t {np.linalg.norm(drift[3:]):.4f} m")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_tum(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 100)
    else:
        demo_synthetic()
