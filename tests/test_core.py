"""Core layer tests: SE(3), camera model, pyramids, filters, integral image.

Strategy mirrors SURVEY.md §4: exact analytic/synthetic ground truth, plus
parity with straightforward numpy reference implementations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opencv_contrib_tpu.core import se3, camera, pyramid, color
from opencv_contrib_tpu.ops import filters, integral, image, morphology, histogram


class TestSE3:
    def test_exp_log_so3_roundtrip(self, rng):
        w = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
        R = se3.exp_so3(w)
        # orthonormality
        eye = jnp.eye(3)
        err = jnp.abs(R @ jnp.swapaxes(R, -1, -2) - eye).max()
        assert err < 1e-5
        w2 = se3.log_so3(R)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=2e-5)

    def test_small_angle(self):
        w = jnp.array([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
        R = se3.exp_so3(w)
        np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-6)

    def test_near_pi(self):
        axis = np.array([1.0, 2.0, -0.5])
        axis /= np.linalg.norm(axis)
        w = jnp.asarray((3.1411 * axis)[None], jnp.float32)
        w2 = se3.log_so3(se3.exp_so3(w))
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-3)

    def test_exp_log_se3_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(size=(16, 6)) * 0.7, jnp.float32)
        T = se3.exp_se3(xi)
        xi2 = se3.log_se3(T)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)

    def test_inverse_compose(self, rng):
        xi = jnp.asarray(rng.normal(size=(8, 6)), jnp.float32)
        T = se3.exp_se3(xi)
        I = se3.compose(T, se3.inverse(T))
        np.testing.assert_allclose(np.asarray(I), np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5)

    def test_quat_roundtrip(self, rng):
        w = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
        R = se3.exp_so3(w)
        q = se3.mat_to_quat(R)
        R2 = se3.quat_to_mat(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)

    def test_transform_points(self, rng):
        T = se3.exp_se3(jnp.asarray(rng.normal(size=6), jnp.float32))
        pts = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
        out = se3.transform_points(T, pts)
        R, t = se3.mat_to_rt(T)
        expected = np.asarray(pts) @ np.asarray(R).T + np.asarray(t)
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


class TestCamera:
    def test_distort_undistort_roundtrip(self, rng):
        intr = camera.make_intrinsics(500.0, 500.0, 320.0, 240.0, k1=-0.1, k2=0.02, p1=1e-3, p2=-5e-4)
        xn = jnp.asarray(rng.uniform(-0.4, 0.4, size=(100, 2)), jnp.float32)
        xd = camera.distort(intr, xn)
        xu = camera.undistort(intr, xd, iters=20)
        np.testing.assert_allclose(np.asarray(xu), np.asarray(xn), atol=1e-5)

    def test_project_pixels(self):
        intr = camera.make_intrinsics(100.0, 100.0, 50.0, 50.0)
        R = jnp.eye(3)
        t = jnp.zeros(3)
        X = jnp.array([[0.0, 0.0, 2.0], [0.1, -0.2, 1.0]])
        px, z = camera.project(intr, R, t, X)
        np.testing.assert_allclose(np.asarray(px), [[50.0, 50.0], [60.0, 30.0]], atol=1e-5)
        np.testing.assert_allclose(np.asarray(z), [2.0, 1.0], atol=1e-6)

    def test_KRt_projection_roundtrip(self, rng):
        K = np.array([[800.0, 0, 320], [0, 820.0, 240], [0, 0, 1]], np.float32)
        R = np.asarray(se3.exp_so3(jnp.asarray(rng.normal(size=3), jnp.float32)))
        t = rng.normal(size=3).astype(np.float32)
        P = camera.projection_from_KRt(jnp.asarray(K), jnp.asarray(R), jnp.asarray(t))
        K2, R2, t2 = camera.KRt_from_projection(P)
        np.testing.assert_allclose(np.asarray(K2), K, rtol=1e-4, atol=1e-2)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t2), t, atol=1e-3)

    def test_normalize_denormalize(self, rng):
        intr = camera.make_intrinsics(420.0, 430.0, 319.5, 239.5, k1=-0.3, k2=0.1)
        px = jnp.asarray(rng.uniform(100, 500, size=(50, 2)), jnp.float32)
        xn = camera.normalize_points(intr, px)
        px2 = camera.denormalize_points(intr, xn)
        np.testing.assert_allclose(np.asarray(px2), np.asarray(px), atol=1e-3)


class TestOps:
    def test_integral_matches_numpy(self, rng):
        img = rng.uniform(size=(37, 53)).astype(np.float32)
        ii = np.asarray(integral.integral(jnp.asarray(img)))
        expected = np.zeros((38, 54), np.float32)
        expected[1:, 1:] = img.cumsum(0).cumsum(1)
        np.testing.assert_allclose(ii, expected, rtol=1e-5)

    def test_box_sum(self, rng):
        img = rng.uniform(size=(40, 40)).astype(np.float32)
        ii = integral.integral(jnp.asarray(img))
        s = integral.box_sum(ii, jnp.array([5]), jnp.array([7]), 10, 12)
        np.testing.assert_allclose(np.asarray(s)[0], img[5:15, 7:19].sum(), rtol=1e-4)

    def test_gaussian_blur_preserves_mean(self, rng):
        img = jnp.asarray(rng.uniform(size=(64, 64)), jnp.float32)
        out = filters.gaussian_blur(img, 2.0)
        assert abs(float(out.mean()) - float(img.mean())) < 0.01

    def test_sobel_on_ramp(self):
        x = jnp.broadcast_to(jnp.arange(32, dtype=jnp.float32), (32, 32))
        gx = filters.sobel(x, dx=1, dy=0)
        # interior response of [-1 0 1] x [1 2 1]^T on unit ramp = 8
        np.testing.assert_allclose(np.asarray(gx)[5:-5, 5:-5], 8.0, atol=1e-4)

    def test_bilateral_preserves_edge(self):
        img = np.ones((32, 32), np.float32)
        img[:, 16:] = 2.0
        out = np.asarray(filters.bilateral_filter(jnp.asarray(img), 3.0, 0.05, 4))
        assert abs(out[16, 8] - 1.0) < 1e-3
        assert abs(out[16, 24] - 2.0) < 1e-3

    def test_resize_bilinear(self, rng):
        img = jnp.asarray(rng.uniform(size=(16, 16)), jnp.float32)
        up = image.resize(img, (32, 32))
        assert up.shape == (32, 32)
        assert abs(float(up.mean()) - float(img.mean())) < 0.02

    def test_warp_affine_identity(self, rng):
        img = jnp.asarray(rng.uniform(size=(20, 20)), jnp.float32)
        M = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        out = image.warp_affine(img, M)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)

    def test_warp_perspective_translation(self, rng):
        img = jnp.asarray(rng.uniform(size=(20, 20)), jnp.float32)
        Hm = jnp.array([[1.0, 0.0, 3.0], [0.0, 1.0, 2.0], [0.0, 0.0, 1.0]])
        out = image.warp_perspective(img, Hm)
        np.testing.assert_allclose(np.asarray(out)[:-2, :-3], np.asarray(img)[2:, 3:], atol=1e-5)

    def test_sample_bilinear_exact_at_integers(self, rng):
        img = jnp.asarray(rng.uniform(size=(10, 10)), jnp.float32)
        v = image.sample_bilinear(img, jnp.array([3.0]), jnp.array([7.0]))
        np.testing.assert_allclose(float(v[0]), float(img[3, 7]), atol=1e-6)

    def test_nms2d(self):
        r = jnp.zeros((9, 9)).at[4, 4].set(5.0).at[2, 2].set(3.0)
        m = morphology.nms2d(r)
        assert bool(m[4, 4])
        assert not bool(m[4, 5])

    def test_equalize_hist_uniformizes(self, rng):
        img = jnp.asarray(rng.beta(2, 5, size=(64, 64)), jnp.float32)
        out = histogram.equalize_hist(img)
        assert abs(float(out.mean()) - 0.5) < 0.05

    def test_pyramid_shapes(self, rng):
        img = jnp.asarray(rng.uniform(size=(64, 48)), jnp.float32)
        pyr = pyramid.build_pyramid(img, 3)
        assert pyr[0].shape == (64, 48)
        assert pyr[1].shape == (32, 24)
        assert pyr[2].shape == (16, 12)

    def test_depth_pyramid_keeps_invalid(self):
        d = jnp.ones((8, 8))
        d = d.at[:4, :4].set(0.0)
        out = pyramid.pyr_down_depth(d)
        assert float(out[0, 0]) == 0.0
        assert abs(float(out[3, 3]) - 1.0) < 1e-6

    def test_clahe_runs(self, rng):
        img = jnp.asarray(rng.uniform(size=(64, 64)), jnp.float32)
        out = histogram.clahe(img)
        assert out.shape == (64, 64)
        assert np.isfinite(np.asarray(out)).all()

    def test_guided_filter_smooths(self, rng):
        img = jnp.asarray(rng.uniform(size=(32, 32)), jnp.float32)
        out = filters.guided_filter(img, img, 4, 0.2)
        assert float(jnp.var(out)) < float(jnp.var(img))


class TestColor:
    def test_gray_weights(self):
        img = jnp.ones((4, 4, 3))
        np.testing.assert_allclose(np.asarray(color.rgb_to_gray(img)), 1.0, atol=1e-5)

    def test_ycrcb_roundtrip(self, rng):
        img = jnp.asarray(rng.uniform(0.2, 0.8, size=(8, 8, 3)), jnp.float32)
        out = color.ycrcb_to_rgb(color.rgb_to_ycrcb(img))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-2)

    def test_lab_white(self):
        lab = color.rgb_to_lab(jnp.ones((1, 1, 3)))
        np.testing.assert_allclose(float(lab[0, 0, 0]), 100.0, atol=0.5)
