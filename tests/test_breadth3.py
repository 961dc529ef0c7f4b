"""Breadth batch 3: ccalib omnidir, mcc CCM, plot, line_descriptor."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu import ccalib, mcc, plot, line_descriptor as ld
from opencv_contrib_tpu.core import se3
from opencv_contrib_tpu.ops import filters


class TestOmnidir:
    K = jnp.asarray(np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]], np.float32))

    def test_project_unproject_roundtrip(self, rng):
        X = jnp.asarray(rng.uniform(-1, 1, (50, 3)).astype(np.float32) + np.array([0, 0, 3], np.float32))
        xi = 0.8
        px = ccalib.project_points_omni(X, jnp.eye(3), jnp.zeros(3), self.K, xi)
        rays = ccalib.undistort_points_omni(px, self.K, xi)
        # rays must align with the original directions
        Xd = X / jnp.linalg.norm(X, axis=1, keepdims=True)
        cos = jnp.sum(rays * Xd, axis=1)
        assert float(cos.min()) > 0.9999

    def test_project_with_distortion_roundtrip(self, rng):
        X = jnp.asarray(rng.uniform(-0.5, 0.5, (30, 3)).astype(np.float32) + np.array([0, 0, 3], np.float32))
        xi, dist = 0.6, (0.05, -0.01, 1e-3, -1e-3)
        px = ccalib.project_points_omni(X, jnp.eye(3), jnp.zeros(3), self.K, xi, dist)
        rays = ccalib.undistort_points_omni(px, self.K, xi, dist)
        Xd = X / jnp.linalg.norm(X, axis=1, keepdims=True)
        cos = jnp.sum(rays * Xd, axis=1)
        assert float(cos.min()) > 0.9999

    def test_xi_refinement(self, rng):
        X = jnp.asarray(rng.uniform(-1, 1, (80, 3)).astype(np.float32) + np.array([0, 0, 4], np.float32))
        xi_gt = 0.75
        px = ccalib.project_points_omni(X, jnp.eye(3), jnp.zeros(3), self.K, xi_gt)
        xi = ccalib.calibrate_xi(X, px, self.K, jnp.eye(3), jnp.zeros(3), xi0=0.5)
        assert abs(float(xi) - xi_gt) < 0.01

    def test_undistort_image_runs(self, rng):
        img = jnp.asarray(rng.uniform(size=(240, 320)), jnp.float32)
        out = ccalib.undistort_image_omni(img, self.K, xi=0.7)
        assert out.shape == (240, 320)
        assert np.isfinite(np.asarray(out)).all()


class TestMcc:
    def test_ccm_corrects_cast(self, rng):
        # measured = reference through a known linear distortion
        M_gt = jnp.asarray(np.array([[0.8, 0.1, 0.0], [0.05, 0.9, 0.05], [0.0, 0.1, 0.7]], np.float32))
        ref = jnp.asarray(mcc.MACBETH_SRGB)
        lin = jnp.clip(ref, 1e-6, 1) ** 2.2
        measured = jnp.clip((lin @ M_gt) ** (1 / 2.2), 0, 1)
        M, correct = mcc.color_correction_model(measured)
        restored = correct(measured)
        err = jnp.abs(restored - ref).max()
        assert float(err) < 0.02, float(err)

    def test_ccm_on_image(self, rng):
        img = jnp.asarray(rng.uniform(0.1, 0.9, (16, 16, 3)), jnp.float32)
        M = jnp.eye(3)
        out = mcc.apply_ccm(img, M)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)


class TestPlot:
    def test_curve_rendered(self):
        x = np.linspace(0, 2 * np.pi, 100)
        y = np.sin(x)
        img = np.asarray(plot.plot2d(x, y, shape=(120, 160)))
        assert img.max() == 1.0
        assert 0.005 < (img > 0).mean() < 0.2
        # peak of the sine should be near the top of the plot
        ys, xs = np.nonzero(img)
        assert ys.min() < 30


class TestLineDescriptor:
    def _line_image(self):
        img = np.zeros((96, 96), np.float32)
        img[20, 10:80] = 1.0  # horizontal line
        img[30:85, 60] = 1.0  # vertical line
        return np.asarray(filters.gaussian_blur(jnp.asarray(img), 1.0))

    def test_detects_lines(self):
        img = self._line_image()
        segs, valid = ld.detect_line_segments(jnp.asarray(img), max_lines=8)
        segs = np.asarray(segs)[np.asarray(valid)]
        assert len(segs) >= 2
        # one ~horizontal (y0≈y1≈20) and one ~vertical (x0≈x1≈60)
        horiz = [s for s in segs if abs(s[0] - s[2]) < 3 and abs(s[0] - 20) < 3]
        vert = [s for s in segs if abs(s[1] - s[3]) < 3 and abs(s[1] - 60) < 3]
        assert horiz and vert

    def test_lbd_descriptor_discriminates(self):
        img = self._line_image()
        segs, valid = ld.detect_line_segments(jnp.asarray(img), max_lines=8)
        d = ld.lbd_describe(jnp.asarray(img), segs, valid)
        v = np.asarray(valid)
        dn = np.asarray(d)[v]
        assert np.isfinite(dn).all()
        # same line described twice matches itself better than others
        if len(dn) >= 2:
            sim = dn @ dn.T
            assert (np.diag(sim) > 0.99).all()
