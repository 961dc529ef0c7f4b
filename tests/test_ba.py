"""Bundle adjustment tests: noisy synthetic scenes must converge back to the
ground truth within the reference's own gates (reproj <= 1.4 px on noisy
pipelines, ~exact on clean data — test_simple_pipeline.cpp:82)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opencv_contrib_tpu.ba import bundle
from opencv_contrib_tpu.core import se3
from opencv_contrib_tpu.utils.synthetic import generate_scene


def _problem_from_scene(scene, cam_noise=0.0, pt_noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    Rs = scene.Rs.copy()
    ts = scene.ts.copy()
    pts = scene.points3d.copy()
    if cam_noise > 0:
        for i in range(1, Rs.shape[0]):  # keep cam0 exact (gauge)
            dw = rng.normal(scale=cam_noise, size=3).astype(np.float32)
            Rs[i] = np.asarray(se3.exp_so3(jnp.asarray(dw))) @ Rs[i]
            ts[i] = ts[i] + rng.normal(scale=cam_noise, size=3).astype(np.float32)
    if pt_noise > 0:
        pts = pts + rng.normal(scale=pt_noise, size=pts.shape).astype(np.float32)
    return bundle.make_problem_from_scene(
        jnp.asarray(Rs), jnp.asarray(ts), jnp.asarray(pts), jnp.asarray(scene.intr),
        jnp.asarray(scene.points2d), jnp.asarray(scene.visible),
    )


@pytest.fixture(scope="module")
def scene():
    return generate_scene(n_views=6, n_points=150, seed=7)


class TestBundle:
    def test_zero_residual_at_ground_truth(self, scene):
        p = _problem_from_scene(scene)
        err = bundle.rms_reprojection_error(p.cameras, p.points, p.intr, p.obs, p.mask)
        assert float(err) < 1e-3

    def test_converges_from_perturbation(self, scene):
        p = _problem_from_scene(scene, cam_noise=0.02, pt_noise=0.02)
        err0 = bundle.rms_reprojection_error(p.cameras, p.points, p.intr, p.obs, p.mask)
        assert float(err0) > 1.0  # actually perturbed
        res = bundle.bundle_adjust(p, n_iters=25)
        err1 = bundle.rms_reprojection_error(res.cameras, res.points, res.intr, p.obs, p.mask)
        assert float(err1) < 0.05
        assert float(res.final_cost) < float(res.initial_cost) * 1e-3

    def test_pcg_rejects_optimize_intr(self, scene):
        # regression (ADVICE r1): pcg has no intrinsics block; explicitly
        # requesting it must raise instead of silently returning zeros
        p = _problem_from_scene(scene)
        with pytest.raises(ValueError, match="pcg"):
            bundle.bundle_adjust(p, n_iters=2, solver="pcg", optimize_intr=True)

    def test_recovers_camera_poses(self, scene):
        p = _problem_from_scene(scene, cam_noise=0.01)
        res = bundle.bundle_adjust(p, n_iters=25)
        for i in range(scene.Rs.shape[0]):
            R = se3.exp_so3(res.cameras[i, :3])
            assert float(se3.rotation_distance(R, jnp.asarray(scene.Rs[i]))) < 2e-3
            np.testing.assert_allclose(np.asarray(res.cameras[i, 3:]), scene.ts[i], atol=5e-3)

    def test_gauge_first_camera_fixed(self, scene):
        p = _problem_from_scene(scene, cam_noise=0.02, pt_noise=0.02)
        res = bundle.bundle_adjust(p, n_iters=10)
        np.testing.assert_allclose(np.asarray(res.cameras[0]), np.asarray(p.cameras[0]), atol=1e-7)

    def test_points_only(self, scene):
        p = _problem_from_scene(scene, pt_noise=0.05)
        pts = bundle.points_only_adjust(p, n_iters=8)
        err = bundle.rms_reprojection_error(p.cameras, pts, p.intr, p.obs, p.mask)
        assert float(err) < 0.01
        # cameras untouched by construction

    def test_masked_points_stay_put(self, scene):
        p = _problem_from_scene(scene, pt_noise=0.05)
        # kill all observations of point 3
        mask = np.asarray(p.mask).copy()
        mask[:, 3] = False
        p2 = p._replace(mask=jnp.asarray(mask))
        res = bundle.bundle_adjust(p2, n_iters=5)
        np.testing.assert_allclose(np.asarray(res.points[3]), np.asarray(p.points[3]), atol=1e-7)

    def test_with_noisy_observations_reaches_reference_gate(self, scene):
        rng = np.random.default_rng(5)
        obs = scene.points2d + rng.normal(scale=0.5, size=scene.points2d.shape).astype(np.float32)
        p = bundle.make_problem_from_scene(
            jnp.asarray(scene.Rs), jnp.asarray(scene.ts), jnp.asarray(scene.points3d),
            jnp.asarray(scene.intr), jnp.asarray(obs), jnp.asarray(scene.visible),
        )
        p = _noise_cams(p, 0.01)
        res = bundle.bundle_adjust(p, n_iters=20)
        err = bundle.rms_reprojection_error(res.cameras, res.points, res.intr, p.obs, p.mask)
        # the reference's pipeline gate is 1.4 px on its Blender tracks
        assert float(err) < 1.4

    def test_intrinsics_refinement(self, scene):
        p = _problem_from_scene(scene)
        wrong = np.asarray(p.intr).copy()
        wrong[0] *= 1.02  # 2% focal error
        wrong[1] *= 1.02
        p2 = p._replace(intr=jnp.asarray(wrong))
        res = bundle.bundle_adjust(p2, n_iters=30, optimize_intr=True)
        err = bundle.rms_reprojection_error(res.cameras, res.points, res.intr, p.obs, p.mask)
        assert float(err) < 0.1
        np.testing.assert_allclose(float(res.intr[0]), float(p.intr[0]), rtol=2e-3)


def _noise_cams(p, s):
    rng = np.random.default_rng(11)
    cams = np.asarray(p.cameras).copy()
    cams[1:] += rng.normal(scale=s, size=cams[1:].shape).astype(np.float32)
    return p._replace(cameras=jnp.asarray(cams))
