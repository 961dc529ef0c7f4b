"""Tests for videostab completion: RANSAC motion, L1 trajectory, deblur,
inpaint, wobble suppression."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu import videostab
from opencv_contrib_tpu.ops import filters


class TestRansacMotion:
    def test_similarity_with_outliers(self):
        rng = np.random.default_rng(0)
        pts0 = rng.uniform(0, 100, (60, 2)).astype(np.float32)
        th, s = 0.2, 1.1
        R = s * np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32)
        t = np.array([3.0, -2.0], np.float32)
        pts1 = pts0 @ R.T + t
        pts1[:12] += rng.uniform(20, 40, (12, 2))  # 20% outliers
        M, inl = videostab.ransac_motion(jnp.array(pts0), jnp.array(pts1),
                                         jax.random.PRNGKey(0), model="similarity")
        M = np.asarray(M)
        np.testing.assert_allclose(M[:2, :2], R, atol=0.02)
        np.testing.assert_allclose(M[:2, 2], t, atol=0.5)
        assert np.asarray(inl).sum() >= 45

    def test_translation(self):
        rng = np.random.default_rng(1)
        pts0 = rng.uniform(0, 50, (30, 2)).astype(np.float32)
        pts1 = pts0 + np.array([5.0, -3.0], np.float32)
        M, _ = videostab.ransac_motion(jnp.array(pts0), jnp.array(pts1),
                                       jax.random.PRNGKey(1), model="translation")
        np.testing.assert_allclose(np.asarray(M)[:2, 2], [5.0, -3.0], atol=1e-3)

    def test_affine(self):
        rng = np.random.default_rng(2)
        pts0 = rng.uniform(0, 50, (40, 2)).astype(np.float32)
        A = np.array([[1.1, 0.2, 4.0], [-0.1, 0.95, 1.0]], np.float32)
        pts1 = pts0 @ A[:, :2].T + A[:, 2]
        M, _ = videostab.ransac_motion(jnp.array(pts0), jnp.array(pts1),
                                       jax.random.PRNGKey(2), model="affine")
        np.testing.assert_allclose(np.asarray(M)[:2], A, atol=0.02)


class TestLpTrajectory:
    def test_smoother_and_bounded(self):
        rng = np.random.default_rng(3)
        n = 60
        jitter = rng.normal(0, 0.03, (n, 2)).astype(np.float32)
        drift = np.stack([np.linspace(0, 1, n), np.zeros(n)], 1).astype(np.float32)
        C = drift + jitter
        S = np.asarray(videostab.lp_stabilize_trajectory(jnp.array(C), bound=0.08))
        d1_orig = np.abs(np.diff(C, axis=0)).sum()
        d1_smooth = np.abs(np.diff(S, axis=0)).sum()
        assert d1_smooth < d1_orig * 0.6
        assert np.abs(S - C).max() < 0.15  # stays near the crop bound


class TestDeblur:
    def test_blurriness_orders_sharpness(self):
        rng = np.random.default_rng(4)
        sharp = rng.uniform(size=(48, 48)).astype(np.float32)
        blurred = np.asarray(filters.gaussian_blur(jnp.array(sharp), 2.0))
        assert float(videostab.calc_blurriness(jnp.array(blurred))) > \
            float(videostab.calc_blurriness(jnp.array(sharp)))

    def test_weighting_deblur_restores_detail(self):
        rng = np.random.default_rng(5)
        sharp = rng.uniform(size=(32, 32)).astype(np.float32)
        blurred = np.asarray(filters.gaussian_blur(jnp.array(sharp), 2.0))
        frames = [sharp, blurred, sharp]
        eye = np.eye(3, dtype=np.float32)
        motions = [eye, eye]
        out = np.asarray(videostab.weighting_deblur(frames, motions, idx=1))
        assert np.abs(out - sharp).mean() < np.abs(blurred - sharp).mean()


class TestInpaint:
    def test_color_average_fills_hole(self):
        f = np.full((24, 24), 0.7, np.float32)
        mask = np.zeros((24, 24), bool)
        mask[8:14, 9:15] = True
        out = np.asarray(videostab.color_average_inpaint(f, mask, n_iters=100))
        np.testing.assert_allclose(out, 0.7, atol=1e-3)

    def test_consistent_mosaic_recovers_static_scene(self):
        rng = np.random.default_rng(6)
        scene = rng.uniform(size=(32, 32)).astype(np.float32)
        corrupted = scene.copy()
        mask = np.zeros((32, 32), bool)
        mask[10:16, 10:16] = True
        corrupted[mask] = 0.0
        frames = [scene, corrupted, scene, scene, scene]
        eye = np.eye(3, dtype=np.float32)
        motions = [eye] * 4
        out = np.asarray(videostab.consistent_mosaic_inpaint(frames, motions, 1, mask,
                                                             radius=2))
        np.testing.assert_allclose(out[mask], scene[mask], atol=1e-4)


class TestWobble:
    def test_identity_motions_noop(self):
        rng = np.random.default_rng(7)
        f = rng.uniform(size=(24, 24)).astype(np.float32)
        eye = np.eye(3, dtype=np.float32)
        motions = [eye] * 9
        motions2 = [eye] * 9
        out = np.asarray(videostab.wobble_suppress(f, 3, 5, motions, motions2, eye))
        np.testing.assert_allclose(out, f, atol=1e-4)

    def test_anchor_frame_passthrough(self):
        f = np.random.default_rng(8).uniform(size=(16, 16)).astype(np.float32)
        eye = np.eye(3, dtype=np.float32)
        out = np.asarray(videostab.wobble_suppress(f, 0, 5, [eye] * 9, [eye] * 9, eye))
        np.testing.assert_allclose(out, f)
