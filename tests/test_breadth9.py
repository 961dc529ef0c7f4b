"""Round-3 breadth: bioinspired color/tone-mapping, face BIF, shape EMD +
affine transformer."""

import numpy as np
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu import bioinspired, face, shape


class TestRetinaColor:
    def test_mux_demux_roundtrip_smooth(self):
        H, W = 32, 48
        ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
        rgb = np.stack([0.3 + 0.3 * np.sin(xs / 15), 0.5 + 0.2 * np.cos(ys / 12),
                        0.4 + 0.1 * np.sin((xs + ys) / 20)], -1).astype(np.float32)
        mosaic = bioinspired.color_multiplex(jnp.array(rgb))
        assert mosaic.shape == (H, W)
        rec = np.asarray(bioinspired.color_demultiplex(mosaic))
        assert np.abs(rec - rgb).mean() < 0.03

    def test_masks_partition(self):
        m = np.asarray(bioinspired.bayer_masks((8, 8)))
        np.testing.assert_allclose(m.sum(0), 1.0)

    def test_tone_mapping_compresses_range(self):
        rng = np.random.default_rng(0)
        hdr = np.exp(rng.normal(0, 2.0, (32, 32))).astype(np.float32)
        out = np.asarray(bioinspired.fast_tone_mapping(jnp.array(hdr)))
        assert out.shape == hdr.shape
        # dynamic range of mid-tones compressed: ratio of 95th/5th percentile shrinks
        p95o, p5o = np.percentile(out, [95, 5])
        p95i, p5i = np.percentile(hdr, [95, 5])
        assert (p95o - p5o) / (p95o + p5o + 1e-9) < (p95i - p5i) / (p95i + p5i + 1e-9)

    def test_tone_mapping_color(self):
        rng = np.random.default_rng(1)
        img = rng.uniform(0.1, 1.0, (16, 16, 3)).astype(np.float32)
        out = np.asarray(bioinspired.fast_tone_mapping(jnp.array(img)))
        assert out.shape == img.shape and np.isfinite(out).all()

    def test_retina_color_pipeline(self):
        retina = bioinspired.Retina((24, 24))
        rgb = np.random.default_rng(2).uniform(size=(24, 24, 3)).astype(np.float32)
        parvo_rgb, magno = bioinspired.retina_run_color(retina, rgb)
        assert parvo_rgb.shape == (24, 24, 3)
        assert magno.shape == (24, 24)


class TestBIF:
    def test_shape_and_determinism(self):
        rng = np.random.default_rng(3)
        img = rng.uniform(size=(64, 64)).astype(np.float32)
        f1 = np.asarray(face.bif_features(jnp.array(img), num_bands=4, num_rotations=6))
        f2 = np.asarray(face.bif_features(jnp.array(img), num_bands=4, num_rotations=6))
        assert f1.shape == (4 * 6 * 4,)
        np.testing.assert_allclose(f1, f2)

    def test_orientation_sensitivity(self):
        # vertical stripes excite one orientation band much more than another
        xs = np.arange(64)
        img = np.tile(np.sin(xs * 0.8), (64, 1)).astype(np.float32)
        f = np.asarray(face.bif_features(jnp.array(img), num_bands=2, num_rotations=4))
        per_rot = f.reshape(2, 4, 4).mean(axis=(0, 1))  # (band, cell, rot)
        assert per_rot.max() > 3 * per_rot.min()

    def test_discriminative(self):
        rng = np.random.default_rng(4)
        a = rng.uniform(size=(48, 48)).astype(np.float32)
        b = rng.uniform(size=(48, 48)).astype(np.float32)
        fa = np.asarray(face.bif_features(jnp.array(a), 4, 6))
        fb = np.asarray(face.bif_features(jnp.array(b), 4, 6))
        assert np.abs(fa - fb).max() > 1e-3


class TestEMD:
    def test_emd_1d_shift(self):
        h1 = np.zeros(10, np.float32); h1[2] = 1
        h2 = np.zeros(10, np.float32); h2[5] = 1
        d = float(shape.emd_1d(jnp.array(h1), jnp.array(h2)))
        assert d == pytest.approx(3.0, abs=1e-5)

    def test_emd_1d_identity(self):
        rng = np.random.default_rng(5)
        h = rng.uniform(size=12).astype(np.float32)
        assert float(shape.emd_1d(jnp.array(h), jnp.array(h))) == pytest.approx(0.0, abs=1e-6)

    def test_emd_l1_grid_axis_moves(self):
        h1 = np.zeros((4, 6), np.float32); h1[1, 2] = 1
        h2 = np.zeros((4, 6), np.float32); h2[3, 4] = 1
        d = float(shape.emd_l1_grid(jnp.array(h1), jnp.array(h2)))
        assert d == pytest.approx(4.0, rel=0.05)  # |dy| + |dx|

    def test_sinkhorn_close_to_exact(self):
        # two unit masses distance 2 apart -> EMD = 2
        x1 = jnp.array([[0.0, 0.0]]); x2 = jnp.array([[2.0, 0.0]])
        w = jnp.array([1.0])
        d = float(shape.emd_sinkhorn(w, x1, w, x2, reg=0.01))
        assert d == pytest.approx(2.0, rel=0.05)

    def test_cost_matrix_shape(self):
        rng = np.random.default_rng(6)
        a = jnp.array(rng.uniform(size=(5, 12)).astype(np.float32))
        b = jnp.array(rng.uniform(size=(7, 12)).astype(np.float32))
        C = np.asarray(shape.emd_histogram_cost(a, b))
        assert C.shape == (5, 7)
        Cg = np.asarray(shape.emd_histogram_cost(a, b, grid_shape=(3, 4)))
        assert Cg.shape == (5, 7) and (Cg >= -1e-6).all()


class TestAffineTransformer:
    def test_recovers_affine(self):
        rng = np.random.default_rng(7)
        src = rng.normal(size=(20, 2)).astype(np.float32)
        M_true = np.array([[1.2, 0.3, 2.0], [-0.2, 0.9, -1.0]], np.float32)
        dst = src @ M_true[:, :2].T + M_true[:, 2]
        M = np.asarray(shape.affine_fit(jnp.array(src), jnp.array(dst), True))
        np.testing.assert_allclose(M, M_true, atol=1e-4)
        out = np.asarray(shape.affine_apply(jnp.array(M), jnp.array(src)))
        np.testing.assert_allclose(out, dst, atol=1e-3)

    def test_similarity_mode(self):
        rng = np.random.default_rng(8)
        src = rng.normal(size=(15, 2)).astype(np.float32)
        th, s = 0.4, 1.3
        R = s * np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32)
        dst = src @ R.T + np.array([1.0, -2.0], np.float32)
        M = np.asarray(shape.affine_fit(jnp.array(src), jnp.array(dst), False))
        np.testing.assert_allclose(M[:, :2], R, atol=1e-4)

    def test_transform_cost_zero_for_rotation(self):
        th = 0.7
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32)
        M = np.concatenate([R, np.zeros((2, 1), np.float32)], 1)
        assert float(shape.affine_transform_cost(jnp.array(M))) == pytest.approx(0.0, abs=1e-5)
        M2 = M.copy(); M2[0, 0] *= 2.5  # sheared
        assert float(shape.affine_transform_cost(jnp.array(M2))) > 0.1
