"""Breadth-module tests: xphoto, img_hash, saliency, intensity_transform,
phase_unwrapping, reg."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu import xphoto, img_hash, saliency, intensity_transform as itf
from opencv_contrib_tpu import phase_unwrapping as pu
from opencv_contrib_tpu import reg
from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.ops.image import warp_affine


class TestXphoto:
    def test_grayworld_corrects_cast(self, rng):
        img = rng.uniform(0.2, 0.7, size=(32, 32, 3)).astype(np.float32)
        tinted = img * np.array([1.4, 1.0, 0.7], np.float32)
        out = np.asarray(xphoto.grayworld_wb(jnp.clip(jnp.asarray(tinted), 0, 1)))
        means = out.reshape(-1, 3).mean(0)
        assert means.std() < 0.02, means

    def test_simple_wb_stretches(self, rng):
        img = rng.uniform(0.4, 0.6, size=(32, 32, 3)).astype(np.float32)
        out = np.asarray(xphoto.simple_wb(jnp.asarray(img)))
        assert out.min() < 0.02 and out.max() > 0.98

    def test_dct_denoise_reduces_noise(self, rng):
        clean = np.asarray(filters.gaussian_blur(jnp.asarray(rng.uniform(size=(64, 64)).astype(np.float32)), 3.0))
        noisy = clean + rng.normal(scale=0.05, size=clean.shape).astype(np.float32)
        out = np.asarray(xphoto.dct_denoise(jnp.asarray(noisy), sigma=0.05))
        assert np.abs(out - clean).mean() < np.abs(noisy - clean).mean()

    def test_inpaint_fills_hole(self, rng):
        img = np.full((32, 32), 0.7, np.float32)
        mask = np.zeros((32, 32), bool)
        mask[12:20, 12:20] = True
        corrupted = img.copy()
        corrupted[mask] = 0.0
        out = np.asarray(xphoto.inpaint_diffusion(jnp.asarray(corrupted), jnp.asarray(mask)))
        assert np.abs(out[mask] - 0.7).max() < 0.05

    def test_oil_painting_quantizes(self, rng):
        img = jnp.asarray(rng.uniform(size=(32, 32)), jnp.float32)
        out = xphoto.oil_painting(img, radius=2, bins=8)
        assert out.shape == (32, 32)
        assert np.isfinite(np.asarray(out)).all()


class TestImgHash:
    def _img(self, rng):
        x = rng.uniform(size=(64, 80, 3)).astype(np.float32)
        return np.asarray(filters.gaussian_blur(jnp.asarray(x), 2.0))

    @pytest.mark.parametrize("fn", [
        img_hash.average_hash, img_hash.block_mean_hash, img_hash.phash,
        img_hash.marr_hildreth_hash,
    ])
    def test_binary_hash_robust_to_noise_distinct_for_other(self, fn, rng):
        a = self._img(rng)
        gray_needed = fn in (img_hash.average_hash, img_hash.block_mean_hash, img_hash.phash, img_hash.marr_hildreth_hash)
        a_in = jnp.asarray(a[..., 0]) if gray_needed else jnp.asarray(a)
        noisy = a_in + jnp.asarray(rng.normal(scale=0.01, size=a_in.shape), jnp.float32)
        other = jnp.asarray(self._img(rng)[..., 0]) if gray_needed else jnp.asarray(self._img(rng))
        h_a = fn(a_in)
        d_noise = int(img_hash.hamming_compare(h_a, fn(noisy)))
        d_other = int(img_hash.hamming_compare(h_a, fn(other)))
        assert d_noise < d_other, (d_noise, d_other)
        assert d_noise <= 0.15 * h_a.shape[0]

    def test_color_moment_hash(self, rng):
        a = jnp.asarray(self._img(rng))
        h1 = img_hash.color_moment_hash(a)
        h2 = img_hash.color_moment_hash(a * 0.98)
        h3 = img_hash.color_moment_hash(jnp.asarray(self._img(rng)))
        assert float(jnp.linalg.norm(h1 - h2)) < float(jnp.linalg.norm(h1 - h3))

    def test_radial_variance_rotation_tolerance(self, rng):
        a = self._img(rng)[..., 0]
        h1 = img_hash.radial_variance_hash(jnp.asarray(a))
        h2 = img_hash.radial_variance_hash(jnp.asarray(np.rot90(a, 2).copy()))
        # 180-degree rotation preserves radial line variances
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=0.15)


class TestSaliency:
    def test_spectral_residual_highlights_object(self, rng):
        img = np.full((96, 96), 0.5, np.float32)
        img += rng.normal(scale=0.01, size=img.shape).astype(np.float32)
        img[40:56, 40:56] = 1.0  # salient block
        sal = np.asarray(saliency.spectral_residual(jnp.asarray(img)))
        inside = sal[40:56, 40:56].mean()
        outside = np.concatenate([sal[:30].ravel(), sal[-30:].ravel()]).mean()
        assert inside > outside * 1.5

    def test_fine_grained_runs(self, rng):
        img = jnp.asarray(rng.uniform(size=(64, 64)), jnp.float32)
        sal = saliency.fine_grained(img)
        assert sal.shape == (64, 64)
        assert 0.0 <= float(sal.min()) and float(sal.max()) <= 1.0

    def test_motion_saliency(self, rng):
        st = saliency.motion_create((32, 32))
        base = rng.uniform(size=(32, 32)).astype(np.float32)
        for _ in range(10):
            st, sal = saliency.motion_apply(st, jnp.asarray(base + rng.normal(scale=0.003, size=base.shape).astype(np.float32)))
        moved = base.copy()
        moved[10:20, 10:20] += 0.5
        st, sal = saliency.motion_apply(st, jnp.asarray(moved))
        sal = np.asarray(sal)
        assert sal[10:20, 10:20].mean() > 0.8
        assert sal[25:, 25:].mean() < 0.1


class TestIntensityTransform:
    def test_gamma(self):
        img = jnp.asarray([[0.25]])
        np.testing.assert_allclose(float(itf.gamma_correction(img, 2.0)[0, 0]), 0.0625, atol=1e-6)

    def test_autoscaling(self, rng):
        img = jnp.asarray(rng.uniform(0.3, 0.6, (16, 16)), jnp.float32)
        out = itf.autoscaling(img)
        assert abs(float(out.min())) < 1e-6 and abs(float(out.max()) - 1) < 1e-6

    def test_log_transform_monotone(self, rng):
        img = jnp.asarray(rng.uniform(size=(16, 16)), jnp.float32)
        out = itf.log_transform(img)
        flat_in = np.asarray(img).ravel()
        flat_out = np.asarray(out).ravel()
        order = np.argsort(flat_in)
        assert (np.diff(flat_out[order]) >= -1e-6).all()

    def test_bimef_brightens_dark(self, rng):
        img = jnp.asarray(rng.uniform(0.0, 0.2, (32, 32)), jnp.float32)
        out = itf.bimef(img)
        assert float(out.mean()) > float(img.mean())


class TestPhaseUnwrapping:
    def test_recovers_smooth_ramp(self):
        H, W = 64, 64
        y, x = np.mgrid[0:H, 0:W].astype(np.float32)
        phi = 0.3 * x + 0.15 * y  # smooth true phase, range ~ 28 rad
        wrapped = np.asarray(pu.wrap(jnp.asarray(phi)))
        un = np.asarray(pu.unwrap_phase_dct(jnp.asarray(wrapped)))
        # recovered up to a constant
        diff = un - phi
        assert diff.std() < 0.05, diff.std()

    def test_wrap_identity_within_band(self):
        phi = jnp.asarray([[0.5, -1.2, 3.0]])
        np.testing.assert_allclose(np.asarray(pu.wrap(phi)), np.asarray(phi), atol=1e-6)


class TestReg:
    def _textured(self, rng):
        x = rng.uniform(size=(96, 96)).astype(np.float32)
        return np.asarray(filters.gaussian_blur(jnp.asarray(x), 2.0)) * 3

    def test_shift_model(self, rng):
        ref = self._textured(rng)
        M = jnp.array([[1.0, 0.0, 2.0], [0.0, 1.0, 3.0]])
        mov = np.asarray(warp_affine(jnp.asarray(ref), M))  # mov(y,x) = ref(y+3, x+2)
        p = reg.register_pyramid(ref, mov, model="shift", levels=2)
        # warp(mov, p) == ref requires p = (dy, dx) = (-3, -2)? verify via residual
        out = np.asarray(reg.warp_with_params("shift", p, jnp.asarray(mov)))
        err = np.abs(out[8:-8, 8:-8] - ref[8:-8, 8:-8]).mean()
        assert err < 0.02, (np.asarray(p), err)

    def test_euclidean_model(self, rng):
        ref = self._textured(rng)
        a = 0.05
        c, s = np.cos(a), np.sin(a)
        cy = cx = 48.0
        M = jnp.array([[c, -s, cx - c * cx + s * cy + 1.0], [s, c, cy - s * cx - c * cy - 1.5]])
        mov = np.asarray(warp_affine(jnp.asarray(ref), M))
        p = reg.register_pyramid(ref, mov, model="euclidean", levels=3)
        out = np.asarray(reg.warp_with_params("euclidean", p, jnp.asarray(mov)))
        err = np.abs(out[10:-10, 10:-10] - ref[10:-10, 10:-10]).mean()
        assert err < 0.03, (np.asarray(p), err)

    def test_affine_model(self, rng):
        ref = self._textured(rng)
        M = jnp.array([[1.03, 0.02, -2.0], [-0.01, 0.97, 1.0]])
        mov = np.asarray(warp_affine(jnp.asarray(ref), M))
        p = reg.register_pyramid(ref, mov, model="affine", levels=3)
        out = np.asarray(reg.warp_with_params("affine", p, jnp.asarray(mov)))
        err = np.abs(out[10:-10, 10:-10] - ref[10:-10, 10:-10]).mean()
        assert err < 0.03, (np.asarray(p), err)
