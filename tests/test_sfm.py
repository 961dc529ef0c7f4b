"""Incremental SfM tests: synthetic multi-view scenes must reconstruct to the
reference's own pipeline gate (reprojection <= 1.4 px,
test_simple_pipeline.cpp:82) and recover metric structure up to similarity."""

import numpy as np
import pytest

from opencv_contrib_tpu.sfm import tracks as trx
from opencv_contrib_tpu.sfm import pipeline as sfmp
from opencv_contrib_tpu.utils.synthetic import generate_scene


def _tracks_from_scene(scene, noise=0.0, seed=0, drop=0.0):
    obs = scene.points2d.copy()
    mask = scene.visible.copy()
    if noise > 0:
        rng = np.random.default_rng(seed)
        obs += rng.normal(scale=noise, size=obs.shape).astype(np.float32)
    if drop > 0:
        rng = np.random.default_rng(seed + 1)
        mask &= rng.uniform(size=mask.shape) > drop
    return trx.TracksTensor(obs=obs, mask=mask)


def _similarity_align(A, B):
    """Best similarity transform aligning A->B (Umeyama); returns residual RMS."""
    muA, muB = A.mean(0), B.mean(0)
    Ac, Bc = A - muA, B - muB
    U, S, Vt = np.linalg.svd(Ac.T @ Bc / len(A))
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1.0, 1.0, d])
    R = U @ D @ Vt
    var = (Ac**2).sum() / len(A)
    s = np.trace(np.diag(S) @ D) / var
    t = muB - s * muA @ R
    A2 = s * A @ R + t
    return np.sqrt(((A2 - B) ** 2).sum(axis=1).mean())


class TestTracks:
    def test_build_tracks_from_matches(self):
        # 3 views, 4 features each; feature k matches across all views
        kps = [np.array([[10.0 * k, 5.0 * v + k] for k in range(4)], np.float32) for v in range(3)]
        matches = [
            (0, 1, np.arange(4), np.arange(4)),
            (1, 2, np.arange(4), np.arange(4)),
        ]
        t = trx.build_tracks(3, kps, matches)
        assert t.n_tracks == 4
        assert t.mask.all()
        # track content: view 1 observations match kps[1]
        got = {tuple(t.obs[1, i]) for i in range(4)}
        expect = {tuple(k) for k in kps[1]}
        assert got == expect

    def test_collision_dropped(self):
        kps = [np.zeros((2, 2), np.float32), np.zeros((2, 2), np.float32)]
        # match both features of view0 to the same feature of view1 -> collision
        matches = [(0, 1, np.array([0, 1]), np.array([0, 0]))]
        t = trx.build_tracks(2, kps, matches)
        assert t.n_tracks == 0

    def test_min_length_filter(self):
        kps = [np.zeros((3, 2), np.float32) for _ in range(2)]
        matches = [(0, 1, np.array([0]), np.array([0]))]
        t = trx.build_tracks(2, kps, matches, min_length=2)
        assert t.n_tracks == 1  # only the matched pair forms a track

    def test_from_observation_list(self):
        markers = np.array([[0, 0, 1.0, 2.0], [1, 0, 3.0, 4.0], [1, 1, 5.0, 6.0]])
        t = trx.from_observation_list(2, markers)
        assert t.n_tracks == 2
        assert t.mask[0, 0] and t.mask[1, 1] and not t.mask[0, 1]


class TestGric:
    def test_prefers_fundamental_for_parallax(self):
        scene = generate_scene(n_views=2, n_points=100, seed=1)
        common = np.flatnonzero(scene.visible[0] & scene.visible[1])
        gH, gF = sfmp.gric_scores(scene.points2d[0][common], scene.points2d[1][common])
        assert gF < gH

    def test_prefers_homography_for_pure_rotation(self):
        # same camera center, rotated: observations related by homography
        import jax.numpy as jnp
        from opencv_contrib_tpu.core import camera, se3
        rng = np.random.default_rng(0)
        pts = rng.uniform(-1, 1, (80, 3)).astype(np.float32) + np.array([0, 0, 4], np.float32)
        intr = np.array([500.0, 500, 320, 240, 0, 0, 0, 0, 0], np.float32)
        R2 = np.asarray(se3.exp_so3(jnp.asarray([0.0, 0.15, 0.0])))
        x1, _ = camera.project(jnp.asarray(intr), jnp.eye(3), jnp.zeros(3), jnp.asarray(pts))
        x2, _ = camera.project(jnp.asarray(intr), jnp.asarray(R2), jnp.zeros(3), jnp.asarray(pts))
        gH, gF = sfmp.gric_scores(np.asarray(x1), np.asarray(x2))
        assert gH < gF


class TestIncrementalPipeline:
    @pytest.mark.parametrize("noise,gate", [(0.0, 0.05), (0.5, 1.4)])
    def test_full_reconstruction(self, noise, gate):
        scene = generate_scene(n_views=6, n_points=150, seed=4)
        t = _tracks_from_scene(scene, noise=noise)
        rec = sfmp.reconstruct_incremental(t, scene.intr, seed=0)
        assert rec.registered.all(), f"registered only {rec.registered.sum()} views: {rec.log}"
        assert rec.has_point.sum() > 0.8 * t.n_tracks
        err = rec.reprojection_rms(t)
        assert err < gate, f"reproj {err} log={rec.log}"

    def test_structure_recovery_up_to_similarity(self):
        scene = generate_scene(n_views=6, n_points=150, seed=4)
        t = _tracks_from_scene(scene)
        rec = sfmp.reconstruct_incremental(t, scene.intr, seed=0)
        sel = rec.has_point
        rms = _similarity_align(rec.points[sel], scene.points3d[sel])
        assert rms < 0.01  # scene is ~2 units across

    def test_with_dropped_observations(self):
        scene = generate_scene(n_views=8, n_points=200, seed=9)
        t = _tracks_from_scene(scene, noise=0.3, drop=0.2)
        rec = sfmp.reconstruct_incremental(t, scene.intr, seed=0)
        assert rec.registered.sum() >= 7
        assert rec.reprojection_rms(t) < 1.4
