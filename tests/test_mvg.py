"""Multiview geometry tests — synthetic exact-solver gates mirroring
sfm/test/test_{fundamental,reconstruct}.cpp: exact data must reproject to
~1e-6 and robust estimators must reject planted outliers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opencv_contrib_tpu.core import camera, se3
from opencv_contrib_tpu.mvg import (
    conditioning,
    fundamental,
    homography,
    resection,
    robust,
    triangulation,
)
from opencv_contrib_tpu.utils.synthetic import generate_scene


@pytest.fixture(scope="module")
def scene():
    return generate_scene(n_views=4, n_points=120, seed=3)


def _two_view(scene):
    v = scene.visible[0] & scene.visible[1]
    idx = np.flatnonzero(v)
    x1 = scene.points2d[0][idx]
    x2 = scene.points2d[1][idx]
    return jnp.asarray(x1), jnp.asarray(x2), idx


def _F_from_poses(scene, i=0, j=1):
    R, t = fundamental.relative_camera_motion(
        jnp.asarray(scene.Rs[i]), jnp.asarray(scene.ts[i]),
        jnp.asarray(scene.Rs[j]), jnp.asarray(scene.ts[j]),
    )
    E = se3.hat(t) @ R
    K = jnp.asarray(scene.K)
    return fundamental.fundamental_from_essential(E, K, K)


class TestFundamental:
    def test_eight_point_exact(self, scene):
        x1, x2, _ = _two_view(scene)
        F = fundamental.eight_point(x1, x2)
        d = fundamental.epipolar_distance(F, x1, x2)
        assert float(jnp.max(d)) < 1e-6  # squared px

    def test_eight_point_matches_gt_F(self, scene):
        x1, x2, _ = _two_view(scene)
        F = fundamental.eight_point(x1, x2)
        Fgt = _F_from_poses(scene)
        Fgt = Fgt / Fgt[2, 2]
        np.testing.assert_allclose(np.asarray(F), np.asarray(Fgt), atol=1e-4)

    def test_seven_point_exact(self, scene):
        x1, x2, _ = _two_view(scene)
        Fs, valid = fundamental.seven_point(x1[:7], x2[:7])
        # at least one valid candidate must fit the 7 sample points exactly
        best = np.inf
        for k in range(3):
            if bool(valid[k]):
                d = fundamental.epipolar_distance(Fs[k], x1[:7], x2[:7])
                best = min(best, float(jnp.max(d)))
        assert best < 1e-6

    def test_essential_decomposition_recovers_motion(self, scene):
        x1, x2, _ = _two_view(scene)
        K = jnp.asarray(scene.K)
        intr = jnp.asarray(scene.intr)
        F = fundamental.eight_point(x1, x2)
        E = fundamental.essential_from_fundamental(F, K, K)
        E = fundamental.project_to_essential(E)
        Rs, ts = fundamental.motions_from_essential(E)
        x1n = camera.normalize_points(intr, x1)
        x2n = camera.normalize_points(intr, x2)
        R, t, _ = fundamental.choose_motion_cheirality(Rs, ts, x1n, x2n)
        Rgt, tgt = fundamental.relative_camera_motion(
            jnp.asarray(scene.Rs[0]), jnp.asarray(scene.ts[0]),
            jnp.asarray(scene.Rs[1]), jnp.asarray(scene.ts[1]),
        )
        assert float(se3.rotation_distance(R, Rgt)) < 1e-3
        # translation direction (scale is unobservable)
        tdir = t / jnp.linalg.norm(t)
        tgtdir = tgt / jnp.linalg.norm(tgt)
        assert float(jnp.abs(jnp.dot(tdir, tgtdir))) > 0.9999

    def test_projections_from_fundamental_consistent(self, scene):
        x1, x2, _ = _two_view(scene)
        F = fundamental.eight_point(x1, x2)
        P1, P2 = fundamental.projections_from_fundamental(F)
        # triangulate projectively and reproject
        pts = jnp.stack([x1, x2], axis=1)  # (N, 2 views, 2)
        Ps = jnp.stack([P1, P2])
        X = triangulation.triangulate_points_refined(pts, Ps, iters=10)
        r1 = camera.project_P(P1, X) - x1
        r2 = camera.project_P(P2, X) - x2
        # f32 floor in the badly-conditioned projective frame; the Euclidean
        # path (what the pipeline uses) holds 1e-3 px.
        assert float(jnp.abs(r1).max()) < 5e-2
        assert float(jnp.abs(r2).max()) < 5e-2


class TestTriangulation:
    def test_nview_dlt_exact(self, scene):
        vis = scene.visible.all(axis=0)
        idx = np.flatnonzero(vis)[:50]
        Ps = jnp.asarray(
            np.stack(
                [
                    np.asarray(
                        camera.projection_from_KRt(
                            jnp.asarray(scene.K), jnp.asarray(scene.Rs[v]), jnp.asarray(scene.ts[v])
                        )
                    )
                    for v in range(scene.Rs.shape[0])
                ]
            )
        )
        pts2d = jnp.asarray(scene.points2d[:, idx].transpose(1, 0, 2))  # (N, V, 2)
        X = triangulation.triangulate_points(pts2d, Ps)
        np.testing.assert_allclose(np.asarray(X), scene.points3d[idx], atol=1e-3)

    def test_masked_views_ignored(self, scene):
        vis = scene.visible.all(axis=0)
        idx = np.flatnonzero(vis)[:10]
        V = scene.Rs.shape[0]
        Ps = jnp.asarray(
            np.stack(
                [
                    np.asarray(
                        camera.projection_from_KRt(
                            jnp.asarray(scene.K), jnp.asarray(scene.Rs[v]), jnp.asarray(scene.ts[v])
                        )
                    )
                    for v in range(V)
                ]
            )
        )
        pts2d = np.asarray(scene.points2d[:, idx].transpose(1, 0, 2)).copy()
        pts2d[:, V - 1] = 1e6  # corrupt last view
        mask = np.ones((len(idx), V), bool)
        mask[:, V - 1] = False
        X = triangulation.triangulate_points(jnp.asarray(pts2d), Ps, jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(X), scene.points3d[idx], atol=1e-3)

    def test_midpoint_two_view(self, scene):
        x1, x2, idx = _two_view(scene)
        intr = jnp.asarray(scene.intr)
        x1n = camera.normalize_points(intr, x1)
        x2n = camera.normalize_points(intr, x2)
        # relative pose, world = cam1 frame
        R, t = fundamental.relative_camera_motion(
            jnp.asarray(scene.Rs[0]), jnp.asarray(scene.ts[0]),
            jnp.asarray(scene.Rs[1]), jnp.asarray(scene.ts[1]),
        )
        X = triangulation.triangulate_midpoint_two_view(x1n, x2n, R, t)
        Xgt = se3.rotate_points(jnp.asarray(scene.Rs[0]), jnp.asarray(scene.points3d[idx])) + jnp.asarray(scene.ts[0])
        np.testing.assert_allclose(np.asarray(X), np.asarray(Xgt), atol=1e-3)


class TestHomography:
    def test_dlt_exact_on_plane(self, rng):
        Hgt = jnp.asarray(
            np.array([[1.1, 0.05, 3.0], [-0.04, 0.95, -2.0], [1e-4, -2e-4, 1.0]], np.float32)
        )
        x1 = jnp.asarray(rng.uniform(0, 100, size=(30, 2)), jnp.float32)
        x1h = jnp.concatenate([x1, jnp.ones((30, 1))], axis=1)
        y = x1h @ Hgt.T
        x2 = y[:, :2] / y[:, 2:]
        H = homography.dlt(x1, x2)
        np.testing.assert_allclose(np.asarray(H), np.asarray(Hgt), atol=1e-4)
        err = homography.transfer_error(H, x1, x2)
        assert float(err.max()) < 1e-6


class TestResection:
    def test_pnp_dlt_and_refine(self, scene):
        v = 2
        vis = scene.visible[v]
        idx = np.flatnonzero(vis)[:60]
        X = jnp.asarray(scene.points3d[idx])
        intr = jnp.asarray(scene.intr)
        xn = camera.normalize_points(intr, jnp.asarray(scene.points2d[v][idx]))
        R, t, cost = resection.resect(X, xn)
        assert float(se3.rotation_distance(R, jnp.asarray(scene.Rs[v]))) < 1e-4
        np.testing.assert_allclose(np.asarray(t), scene.ts[v], atol=1e-3)

    def test_masked_resection(self, scene):
        v = 1
        idx = np.flatnonzero(scene.visible[v])[:40]
        X = np.concatenate([scene.points3d[idx], np.full((10, 3), 7.0, np.float32)])
        xn_good = np.asarray(
            camera.normalize_points(jnp.asarray(scene.intr), jnp.asarray(scene.points2d[v][idx]))
        )
        xn = np.concatenate([xn_good, np.full((10, 2), 0.3, np.float32)])
        mask = np.concatenate([np.ones(len(idx), bool), np.zeros(10, bool)])
        R, t, _ = resection.resect(jnp.asarray(X), jnp.asarray(xn), jnp.asarray(mask))
        assert float(se3.rotation_distance(R, jnp.asarray(scene.Rs[v]))) < 1e-3


class TestRansac:
    def test_fundamental_8pt_robust_with_outliers(self, scene, rng):
        x1, x2, _ = _two_view(scene)
        n = x1.shape[0]
        n_out = 30
        x1c = jnp.concatenate([x1, jnp.asarray(rng.uniform(0, 640, (n_out, 2)), jnp.float32)])
        x2c = jnp.concatenate([x2, jnp.asarray(rng.uniform(0, 480, (n_out, 2)), jnp.float32)])
        res = robust.fundamental_8pt_robust(jax.random.PRNGKey(0), x1c, x2c, threshold_px=1.0)
        inl = np.asarray(res.inliers)
        assert inl[:n].mean() > 0.95
        assert inl[n:].mean() < 0.2

    def test_pnp_robust_with_outliers(self, scene, rng):
        v = 3
        idx = np.flatnonzero(scene.visible[v])[:60]
        X = jnp.asarray(scene.points3d[idx])
        intr = jnp.asarray(scene.intr)
        xn = camera.normalize_points(intr, jnp.asarray(scene.points2d[v][idx]))
        # corrupt 20% of correspondences
        n_bad = 12
        xn_bad = xn.at[:n_bad].set(jnp.asarray(rng.uniform(-0.5, 0.5, (n_bad, 2)), jnp.float32))
        res = robust.pnp_robust(jax.random.PRNGKey(1), X, xn_bad, threshold=0.005)
        Rt = res.model
        R, t = Rt[:, :3], Rt[:, 3]
        assert float(se3.rotation_distance(R, jnp.asarray(scene.Rs[v]))) < 0.01

    def test_homography_robust(self, rng):
        Hgt = jnp.asarray(np.array([[1.0, 0.1, 5.0], [0.0, 1.1, -3.0], [0.0, 0.0, 1.0]], np.float32))
        x1 = jnp.asarray(rng.uniform(0, 100, size=(80, 2)), jnp.float32)
        x1h = jnp.concatenate([x1, jnp.ones((80, 1))], axis=1)
        y = x1h @ Hgt.T
        x2 = y[:, :2] / y[:, 2:]
        x2 = x2.at[:15].add(jnp.asarray(rng.uniform(10, 40, (15, 2)), jnp.float32))
        res = robust.homography_robust(jax.random.PRNGKey(2), x1, x2, threshold_px=1.0)
        inl = np.asarray(res.inliers)
        assert inl[15:].mean() > 0.95
        assert inl[:15].mean() < 0.2
