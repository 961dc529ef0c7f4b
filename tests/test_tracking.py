"""Tracking tests: correlation filters follow a moving target on synthetic
sequences; Kalman filters recover known dynamics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu.tracking import correlation, kalman
from opencv_contrib_tpu.ops import filters


def _target_sequence(n=12, shape=(128, 128), start=(40.0, 40.0), vel=(2.0, 3.0), seed=0):
    """Textured blob moving at constant velocity over textured background."""
    rng = np.random.default_rng(seed)
    bg = np.asarray(filters.gaussian_blur(jnp.asarray(rng.uniform(0, 0.3, shape).astype(np.float32)), 2.0))
    tex = np.asarray(filters.gaussian_blur(jnp.asarray(rng.uniform(0.5, 1.0, (21, 21)).astype(np.float32)), 1.0))
    frames, centers = [], []
    for i in range(n):
        cy = start[0] + vel[0] * i
        cx = start[1] + vel[1] * i
        f = bg.copy()
        iy, ix = int(round(cy)) - 10, int(round(cx)) - 10
        f[iy : iy + 21, ix : ix + 21] = tex
        frames.append(f)
        centers.append((cy, cx))
    return frames, centers


class TestMosse:
    def test_follows_target(self):
        frames, centers = _target_sequence()
        st = correlation.mosse_init(jnp.asarray(frames[0]), centers[0], size=(64, 64))
        for i in range(1, len(frames)):
            st, psr = correlation.mosse_update(st, jnp.asarray(frames[i]))
            err = np.linalg.norm(np.asarray(st.center) - np.asarray(centers[i]))
            assert err < 2.5, f"frame {i}: err {err}"
        assert float(psr) > 5.0  # confident lock

    def test_psr_drops_when_target_vanishes(self):
        frames, centers = _target_sequence(n=4)
        st = correlation.mosse_init(jnp.asarray(frames[0]), centers[0], size=(64, 64))
        st, psr_good = correlation.mosse_update(st, jnp.asarray(frames[1]))
        blank = jnp.zeros_like(jnp.asarray(frames[0]))
        _, psr_bad = correlation.mosse_update(st, blank)
        assert float(psr_bad) < float(psr_good)


class TestKcf:
    def test_follows_target(self):
        frames, centers = _target_sequence(vel=(1.5, -2.0), start=(70.0, 80.0), seed=5)
        st = correlation.kcf_init(jnp.asarray(frames[0]), centers[0], size=(64, 64))
        for i in range(1, len(frames)):
            st, peak = correlation.kcf_update(st, jnp.asarray(frames[i]))
            err = np.linalg.norm(np.asarray(st.center) - np.asarray(centers[i]))
            assert err < 2.5, f"frame {i}: err {err}"


class TestKalman:
    def test_linear_constant_velocity(self, rng):
        dt = 1.0
        F = jnp.asarray(np.array([[1, 0, dt, 0], [0, 1, 0, dt], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32))
        Hm = jnp.asarray(np.array([[1, 0, 0, 0], [0, 1, 0, 0]], np.float32))
        Q = 1e-4 * jnp.eye(4)
        R = 0.04 * jnp.eye(2)
        x_true = np.array([0.0, 0.0, 1.0, 0.5])
        st = kalman.KalmanState(jnp.zeros(4), jnp.eye(4))
        for k in range(30):
            x_true = np.asarray(F) @ x_true
            z = x_true[:2] + rng.normal(scale=0.2, size=2)
            st = kalman.kf_predict(st, F, Q)
            st = kalman.kf_correct(st, jnp.asarray(z, jnp.float32), Hm, R)
        np.testing.assert_allclose(np.asarray(st.x[2:]), [1.0, 0.5], atol=0.1)

    def test_ukf_nonlinear_range_bearing(self, rng):
        # state: (px, py, vx, vy); measurement: (range, bearing)
        dt = 0.1

        def f(x):
            return jnp.array([x[0] + dt * x[2], x[1] + dt * x[3], x[2], x[3]])

        def h(x):
            return jnp.array([jnp.sqrt(x[0] ** 2 + x[1] ** 2), jnp.arctan2(x[1], x[0])])

        Q = 1e-5 * jnp.eye(4)
        R = jnp.diag(jnp.array([0.01, 1e-4]))
        x_true = np.array([2.0, 1.0, 0.5, -0.2])
        st = kalman.KalmanState(jnp.array([1.5, 1.5, 0.0, 0.0]), 0.5 * jnp.eye(4))
        for k in range(60):
            x_true = np.array([x_true[0] + dt * x_true[2], x_true[1] + dt * x_true[3], x_true[2], x_true[3]])
            z = np.array([
                np.hypot(x_true[0], x_true[1]) + rng.normal(scale=0.05),
                np.arctan2(x_true[1], x_true[0]) + rng.normal(scale=0.005),
            ])
            st = kalman.ukf_predict(st, f, Q)
            st = kalman.ukf_correct(st, jnp.asarray(z, jnp.float32), h, R)
        np.testing.assert_allclose(np.asarray(st.x[:2]), x_true[:2], atol=0.15)
