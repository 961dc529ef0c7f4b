"""Tests for the Boosting tracker, augmented UKF, twist servoing, and the
MultiTracker facade."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu.tracking import boosting, kalman, multitracker, twist
from opencv_contrib_tpu.ops import filters


def _scene(center, H=120, W=160):
    """Bright blob target on a textured background."""
    rng = np.random.default_rng(5)
    bg = rng.uniform(0, 0.2, size=(H, W)).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    blob = np.exp(-(((yy - center[0]) / 6) ** 2 + ((xx - center[1]) / 6) ** 2))
    return np.asarray(filters.gaussian_blur(jnp.asarray(bg + blob), 1.0))


class TestBoosting:
    def test_tracks_moving_blob(self):
        key = jax.random.PRNGKey(0)
        bank = boosting.make_feature_bank(key, n_features=120)
        c = np.array([60.0, 70.0])
        st = boosting.boosting_init(jnp.asarray(_scene(c)), c, key, bank)
        for i in range(5):
            c = c + np.array([2.0, 3.0])
            key, k = jax.random.split(key)
            st, score = boosting.boosting_update(st, jnp.asarray(_scene(c)), k, bank)
        err = np.abs(np.asarray(st.center) - c).max()
        assert err <= 2.0, (np.asarray(st.center), c)


class TestAUKF:
    def test_matches_kf_on_linear_additive(self):
        # with linear f/h and additive noise, AUKF == KF
        F = jnp.array([[1.0, 1.0], [0.0, 1.0]])
        Hm = jnp.array([[1.0, 0.0]])
        Q = jnp.diag(jnp.array([1e-3, 1e-3]))
        R = jnp.array([[1e-2]])
        st_kf = kalman.KalmanState(jnp.array([0.0, 1.0]), jnp.eye(2))
        st_au = kalman.KalmanState(jnp.array([0.0, 1.0]), jnp.eye(2))
        zs = [jnp.array([1.1]), jnp.array([2.0]), jnp.array([2.9])]
        for z in zs:
            st_kf = kalman.kf_correct(kalman.kf_predict(st_kf, F, Q), z, Hm, R)
            st_au = kalman.aukf_correct(
                kalman.aukf_predict(st_au, lambda x, q: F @ x + q, Q),
                z, lambda x, r: Hm @ x + r, R)
        np.testing.assert_allclose(np.asarray(st_au.x), np.asarray(st_kf.x), atol=1e-2)
        np.testing.assert_allclose(np.asarray(st_au.P), np.asarray(st_kf.P), atol=1e-2)

    def test_nonadditive_noise_propagates(self):
        # multiplicative process noise: x' = x * (1 + q)
        Q = jnp.array([[0.04]])
        st = kalman.KalmanState(jnp.array([2.0]), jnp.array([[1e-6]]))
        st = kalman.aukf_predict(st, lambda x, q: x * (1.0 + q[0]), Q)
        # Var[x'] ~ x^2 * Var[q] = 4 * 0.04
        assert abs(float(st.P[0, 0]) - 0.16) < 0.02


class TestTwist:
    def test_pure_translation_recovered(self):
        K = jnp.array([[500.0, 0, 160], [0, 500.0, 120], [0, 0, 1]])
        rng = np.random.default_rng(0)
        pts3 = rng.uniform(-1, 1, size=(12, 3)).astype(np.float32)
        pts3[:, 2] = rng.uniform(2, 4, size=12)
        xi_true = jnp.array([0.1, -0.05, 0.2, 0.0, 0.0, 0.0])

        uv = jnp.stack([K[0, 0] * pts3[:, 0] / pts3[:, 2] + K[0, 2],
                        K[1, 1] * pts3[:, 1] / pts3[:, 2] + K[1, 2]], axis=1)
        L = twist.interaction_matrix(uv, jnp.asarray(pts3[:, 2]), K)
        dn = (L @ xi_true).reshape(-1, 2)
        duv = dn * jnp.array([K[0, 0], K[1, 1]])
        xi = twist.compute_twist(uv, duv, jnp.asarray(pts3[:, 2]), K)
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi_true), atol=1e-5)

    def test_rotation_recovered(self):
        K = jnp.array([[400.0, 0, 100], [0, 400.0, 80], [0, 0, 1]])
        rng = np.random.default_rng(1)
        N = 20
        uv = jnp.asarray(rng.uniform(20, 150, size=(N, 2)).astype(np.float32))
        Z = jnp.asarray(rng.uniform(1, 5, size=N).astype(np.float32))
        xi_true = jnp.array([0.0, 0.0, 0.0, 0.02, -0.03, 0.05])
        L = twist.interaction_matrix(uv, Z, K)
        duv = (L @ xi_true).reshape(-1, 2) * jnp.array([K[0, 0], K[1, 1]])
        xi = twist.compute_twist(uv, duv, Z, K)
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi_true), atol=1e-5)


class TestMultiTracker:
    def test_mixed_kinds_follow_target(self):
        mt = multitracker.MultiTracker(seed=1)
        c = np.array([60.0, 70.0])
        img0 = _scene(c)
        mt.add("mosse", img0, c)
        mt.add("kcf", img0, c)
        mt.add("medianflow", img0, (c, (24.0, 24.0)))
        prev = img0
        for i in range(4):
            c = c + np.array([1.0, 2.0])
            img = _scene(c)
            out = mt.update(img, prev_img=prev)
            prev = img
        for pos in out:
            assert np.abs(np.asarray(pos) - c).max() < 3.0, (np.asarray(pos), c)
