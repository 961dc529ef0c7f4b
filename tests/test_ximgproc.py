"""ximgproc tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu import ximgproc as xi
from opencv_contrib_tpu.ops import filters


@pytest.fixture
def edge_img(rng):
    img = np.full((64, 64), 0.3, np.float32)
    img[:, 32:] = 0.8
    return img + rng.normal(scale=0.02, size=img.shape).astype(np.float32)


class TestFilters:
    def test_anisodiff_preserves_edge(self, edge_img):
        out = np.asarray(xi.anisotropic_diffusion(jnp.asarray(edge_img), n_iters=30))
        # noise reduced on flat regions
        assert out[10:20, 5:25].std() < edge_img[10:20, 5:25].std() * 0.5
        # edge magnitude preserved
        assert (out[:, 36:].mean() - out[:, :28].mean()) > 0.4

    def test_rolling_guidance_removes_texture(self, rng):
        base = np.full((48, 48), 0.5, np.float32)
        base[:, 24:] = 0.9
        textured = base + 0.1 * np.sin(np.arange(48) * 2.0)[None, :].astype(np.float32)
        out = np.asarray(xi.rolling_guidance_filter(jnp.asarray(textured), sigma_s=2.0, sigma_r=0.2))
        # high-frequency texture removed, step preserved
        assert out[:, 4:20].std() < 0.03
        assert (out[:, 36:].mean() - out[:, :12].mean()) > 0.3

    def test_dt_filter_edge_aware(self, edge_img):
        noisy = edge_img
        out = np.asarray(xi.dt_filter(jnp.asarray(noisy), jnp.asarray(noisy), sigma_s=10.0, sigma_r=0.15))
        assert out[10:20, 5:25].std() < noisy[10:20, 5:25].std()
        assert (out[:, 40:].mean() - out[:, :24].mean()) > 0.4

    def test_niblack(self, rng):
        img = rng.uniform(size=(32, 32)).astype(np.float32)
        img[10:20, 10:20] += 2.0
        out = np.asarray(xi.niblack_threshold(jnp.asarray(img), block_radius=5))
        assert out[14, 14]

    def test_ridge_filter_responds_to_line(self):
        img = np.zeros((48, 48), np.float32)
        img[24] = 1.0  # horizontal ridge
        out = np.asarray(xi.ridge_filter(jnp.asarray(img), sigma=1.5))
        assert np.abs(out[24, 10:-10]).mean() > np.abs(out[10, 10:-10]).mean() * 3


class TestSlic:
    def test_labels_cover_and_respect_edges(self, rng):
        img = np.zeros((64, 64), np.float32)
        img[:, 32:] = 1.0
        labels, centers = xi.slic(jnp.asarray(img), grid=4, compactness=0.5)
        labels = np.asarray(labels)
        assert labels.shape == (64, 64)
        # superpixels should not straddle the strong edge much:
        left_labels = set(np.unique(labels[:, :30]))
        right_labels = set(np.unique(labels[:, 34:]))
        assert len(left_labels & right_labels) == 0

    def test_compactness_controls_shape(self, rng):
        img = jnp.asarray(rng.uniform(size=(64, 64)), jnp.float32)
        labels_hi, _ = xi.slic(img, grid=4, compactness=100.0)
        # very high compactness -> near-regular grid: each label's pixel
        # count close to uniform
        counts = np.bincount(np.asarray(labels_hi).reshape(-1), minlength=16)
        assert counts.std() / counts.mean() < 0.2


class TestEdges:
    def test_structured_edges_on_step(self, edge_img):
        e = np.asarray(xi.structured_edges_lite(jnp.asarray(edge_img)))
        assert e[:, 30:34].max() > 0.5
        assert e[:, 5:20].mean() < 0.1

    def test_hough_finds_line(self):
        mask = np.zeros((64, 64), bool)
        mask[:, 20] = True  # vertical line x=20
        acc, thetas, rhos = xi.fast_hough_lines(jnp.asarray(mask))
        acc = np.asarray(acc)
        ai, ri = np.unravel_index(acc.argmax(), acc.shape)
        # vertical line: theta ~ 0, rho ~ 20
        assert abs(float(thetas[ai])) < 0.1 or abs(float(thetas[ai]) - np.pi) < 0.1
        assert abs(abs(float(rhos[ri])) - 20) < 3

    def test_thinning_reduces_width(self):
        mask = np.zeros((32, 32), bool)
        mask[10:16, 4:28] = True  # 6-px-thick bar
        out = np.asarray(xi.thinning(jnp.asarray(mask), n_iters=10))
        widths = out[:, 10:22].sum(axis=0)
        assert widths.max() <= 2
        assert out.sum() > 5  # skeleton survives


class TestInterp:
    def test_edge_aware_interpolation_respects_boundary(self):
        guide = np.zeros((32, 32), np.float32)
        guide[:, 16:] = 1.0
        seeds = jnp.asarray(np.array([[16, 4], [16, 28]], np.float32))
        vals = jnp.asarray(np.array([[1.0], [5.0]], np.float32))
        dense = np.asarray(xi.edge_aware_interpolate(jnp.asarray(guide), seeds, vals, n_iters=300))
        assert abs(dense[8, 8, 0] - 1.0) < 0.3
        assert abs(dense[8, 24, 0] - 5.0) < 0.3


class TestFourier:
    def test_descriptor_invariances(self):
        t = np.linspace(0, 2 * np.pi, 64, endpoint=False)
        ellipse = np.stack([20 * np.sin(t), 40 * np.cos(t)], axis=1).astype(np.float32)
        d1 = xi.fourier_descriptors(jnp.asarray(ellipse))
        # translated + scaled + rotated version
        c, s = np.cos(0.7), np.sin(0.7)
        R = np.array([[c, -s], [s, c]], np.float32)
        e2 = 2.5 * ellipse @ R.T + np.array([100, -50], np.float32)
        d2 = xi.fourier_descriptors(jnp.asarray(e2.astype(np.float32)))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-2)
        # different shape -> different descriptor
        square_t = np.stack([20 * np.sign(np.sin(t)) * np.abs(np.sin(t)) ** 0.2, 20 * np.sign(np.cos(t)) * np.abs(np.cos(t)) ** 0.2], axis=1).astype(np.float32)
        d3 = xi.fourier_descriptors(jnp.asarray(square_t))
        assert np.abs(np.asarray(d1) - np.asarray(d3)).max() > 0.05
