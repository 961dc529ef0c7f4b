"""PPF + cloud ICP tests on synthetic sampled surfaces."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu import surface_matching as sm
from opencv_contrib_tpu.core import se3


def _box_cloud(n_per_face=36, size=(1.0, 0.6, 0.4)):
    """Points + outward normals sampled on a box surface."""
    rng = np.random.default_rng(0)
    sx, sy, sz = size
    pts, nrms = [], []
    faces = [
        (np.array([1.0, 0, 0]), sx / 2), (np.array([-1.0, 0, 0]), sx / 2),
        (np.array([0, 1.0, 0]), sy / 2), (np.array([0, -1.0, 0]), sy / 2),
        (np.array([0, 0, 1.0]), sz / 2), (np.array([0, 0, -1.0]), sz / 2),
    ]
    dims = np.array(size)
    for n, off in faces:
        free = np.flatnonzero(n == 0)
        for _ in range(n_per_face):
            p = np.zeros(3)
            p += n * off
            for f in free:
                p[f] = rng.uniform(-dims[f] / 2, dims[f] / 2)
            pts.append(p)
            nrms.append(n)
    return np.array(pts, np.float32), np.array(nrms, np.float32)


class TestPPF:
    def test_feature_invariance_to_rigid_motion(self, rng):
        pts, nrms = _box_cloud()
        T = np.asarray(se3.exp_se3(jnp.asarray([0.3, -0.2, 0.5, 0.4, 0.1, -0.3], jnp.float32)))
        R, t = T[:3, :3], T[:3, 3]
        p2 = pts @ R.T + t
        n2 = nrms @ R.T
        f1 = sm.compute_ppf_features(jnp.asarray(pts[:50]), jnp.asarray(nrms[:50]), jnp.asarray(pts[50:100]), jnp.asarray(nrms[50:100]))
        f2 = sm.compute_ppf_features(jnp.asarray(p2[:50]), jnp.asarray(n2[:50]), jnp.asarray(p2[50:100]), jnp.asarray(n2[50:100]))
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-4)

    def test_detects_pose_of_model_in_scene(self):
        pts, nrms = _box_cloud()
        model = sm.train_model(pts, nrms, sampling_step=3)
        T_gt = np.asarray(se3.exp_se3(jnp.asarray([0.2, 0.4, -0.1, 0.3, -0.2, 0.5], jnp.float32)))
        scene = pts @ T_gt[:3, :3].T + T_gt[:3, 3]
        scene_n = nrms @ T_gt[:3, :3].T
        T, votes = sm.ppf_match(model, scene, scene_n, scene_step=3)
        assert float(votes) > 10
        # coarse pose then ICP refine
        T_ref, err = sm.register_model_to_scene(pts, scene, scene_n, T_init=np.asarray(T))
        d = np.asarray(se3.log_se3(se3.inverse(jnp.asarray(T_gt)) @ jnp.asarray(T_ref)))
        assert np.linalg.norm(d[:3]) < 0.05, d
        assert np.linalg.norm(d[3:]) < 0.05, d


class TestCloudICP:
    def test_refines_small_misalignment(self):
        pts, nrms = _box_cloud(n_per_face=40)
        T_gt = np.asarray(se3.exp_se3(jnp.asarray([0.05, -0.04, 0.06, 0.05, 0.03, -0.04], jnp.float32)))
        scene = pts @ T_gt[:3, :3].T + T_gt[:3, 3]
        scene_n = nrms @ T_gt[:3, :3].T
        T, err = sm.register_model_to_scene(pts, scene, scene_n)
        d = np.asarray(se3.log_se3(se3.inverse(jnp.asarray(T_gt)) @ jnp.asarray(T)))
        assert np.linalg.norm(d) < 0.02, d
        assert err < 1e-4

    def test_identity_stays(self):
        pts, nrms = _box_cloud()
        T, err = sm.register_model_to_scene(pts, pts, nrms)
        assert np.abs(np.asarray(se3.log_se3(jnp.asarray(T)))).max() < 1e-4
