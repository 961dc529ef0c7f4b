"""3D surface matching demo — surface_matching/samples/ppf_load_match.cpp role.

Trains a PPF detector on a synthetic model cloud, matches it in a
transformed scene, and refines with point-to-plane ICP.

Usage:
    python samples/surface_matching_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np


def main():
    import jax.numpy as jnp
    from opencv_contrib_tpu.surface_matching import ppf, icp3d
    from opencv_contrib_tpu.core import se3

    rng = np.random.default_rng(0)
    # model: box surface points + outward normals
    pts, nrms = [], []
    for axis in range(3):
        for sgn in (-1.0, 1.0):
            n = np.zeros(3); n[axis] = sgn
            uv = rng.uniform(-0.5, 0.5, (120, 2))
            p = np.zeros((120, 3)); cols = [c for c in range(3) if c != axis]
            p[:, cols] = uv; p[:, axis] = 0.5 * sgn
            pts.append(p); nrms.append(np.tile(n, (120, 1)))
    model_pts = np.concatenate(pts).astype(np.float32)
    model_nrm = np.concatenate(nrms).astype(np.float32)

    model = ppf.train_model(jnp.asarray(model_pts), jnp.asarray(model_nrm))

    rvec = np.array([0.1, 0.3, -0.2], np.float32)
    R = np.asarray(se3.exp_so3(jnp.asarray(rvec)))
    t = np.array([0.2, -0.1, 0.3], np.float32)
    scene_pts = (model_pts @ R.T + t).astype(np.float32)
    scene_nrm = (model_nrm @ R.T).astype(np.float32)

    poses = ppf.match(model, jnp.asarray(scene_pts), jnp.asarray(scene_nrm))
    T0 = np.asarray(poses[0].T if hasattr(poses[0], "T") else poses[0])
    T_ref, err = icp3d.register_model_to_scene(
        jnp.asarray(model_pts), jnp.asarray(scene_pts), jnp.asarray(scene_nrm),
        T_init=jnp.asarray(T0))
    T_ref = np.asarray(T_ref)
    dR = np.linalg.norm(np.asarray(se3.log_so3(jnp.asarray(T_ref[:3, :3] @ R.T))))
    dt = np.linalg.norm(T_ref[:3, 3] - t)
    print(f"PPF + ICP pose error: |drvec| {dR:.4f} rad, |dt| {dt:.4f} m "
          f"(residual {float(err):.5f})")


if __name__ == "__main__":
    main()
