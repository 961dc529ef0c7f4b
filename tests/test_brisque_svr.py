"""Trained BRISQUE head: score must be monotone in distortion severity on
HELD-OUT images across all three distortion families (the VERDICT done-
criterion; reference model role: quality/src/quality_brisque.cpp)."""

import numpy as np
import pytest

from opencv_contrib_tpu.quality import brisque_svr as bs


@pytest.fixture(scope="module")
def model():
    return bs.train_brisque_model(n_images=10, seed=0)


def _severity_scores(model, kind, rng):
    base = bs.natural_texture(rng)
    return [bs.brisque_score(model, bs.distort(base, kind, s, rng))
            for s in range(5)]


class TestBrisqueTrained:
    @pytest.mark.parametrize("kind", ["blur", "noise", "jpeg"])
    def test_monotone_in_severity_held_out(self, model, kind):
        rng = np.random.default_rng(123)  # held-out seeds
        # average over a few held-out images to damp single-image noise
        scores = np.mean([_severity_scores(model, kind, rng)
                          for _ in range(4)], axis=0)
        assert np.all(np.diff(scores) > 0), (kind, scores)

    def test_pristine_scores_low(self, model):
        rng = np.random.default_rng(99)
        pristine = [bs.brisque_score(model, bs.natural_texture(rng))
                    for _ in range(3)]
        worst = [bs.brisque_score(
            model, bs.distort(bs.natural_texture(rng), "blur", 4, rng))
            for _ in range(3)]
        assert np.mean(pristine) < 30
        assert np.mean(worst) > 60

    def test_save_load_roundtrip(self, model, tmp_path):
        p = str(tmp_path / "brisque.npz")
        bs.save_model(model, p)
        m2 = bs.load_model(p)
        rng = np.random.default_rng(7)
        img = bs.distort(bs.natural_texture(rng), "noise", 2, rng)
        assert abs(bs.brisque_score(model, img)
                   - bs.brisque_score(m2, img)) < 1e-4


class TestJpegBlockiness:
    def test_quantization_degrades_with_quality(self):
        rng = np.random.default_rng(0)
        img = bs.natural_texture(rng)
        e_hi = np.abs(bs.jpeg_blockiness(img, 90) - img).mean()
        e_lo = np.abs(bs.jpeg_blockiness(img, 5) - img).mean()
        assert e_lo > 3 * e_hi > 0
