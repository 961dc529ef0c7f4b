"""Face recognizer tests: synthetic identity classes (distinct texture
patterns + noise/illumination jitter) must be classified correctly."""

import numpy as np
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu.face import EigenFaces, FisherFaces, LBPH, lbp_image


def _identity_images(rng, n_ids=4, n_per_id=6, shape=(32, 32)):
    """Each identity = a fixed random base pattern; samples add noise +
    illumination scaling."""
    bases = [rng.uniform(0, 1, shape).astype(np.float32) for _ in range(n_ids)]
    imgs, labels = [], []
    for i, b in enumerate(bases):
        for _ in range(n_per_id):
            gain = rng.uniform(0.7, 1.3)
            img = np.clip(gain * b + rng.normal(scale=0.05, size=shape), 0, 1.5).astype(np.float32)
            imgs.append(img)
            labels.append(i)
    return imgs, labels, bases


@pytest.fixture
def dataset(rng):
    return _identity_images(rng)


class TestEigenFaces:
    def test_classifies_holdout(self, dataset, rng):
        imgs, labels, bases = dataset
        model = EigenFaces(n_components=8).train(imgs, labels)
        correct = 0
        for i, b in enumerate(bases):
            test = np.clip(1.1 * b + rng.normal(scale=0.05, size=b.shape), 0, 1.5).astype(np.float32)
            pred, conf = model.predict(test)
            correct += pred == i
        assert correct == len(bases)

    def test_save_load_roundtrip(self, dataset, tmp_path):
        imgs, labels, bases = dataset
        m1 = EigenFaces(8).train(imgs, labels)
        p = str(tmp_path / "eigen.npz")
        m1.save(p)
        m2 = EigenFaces(8).load(p)
        pred1, _ = m1.predict(bases[2])
        pred2, _ = m2.predict(bases[2])
        assert pred1 == pred2 == 2


class TestFisherFaces:
    def test_classifies_holdout(self, dataset, rng):
        imgs, labels, bases = dataset
        model = FisherFaces().train(imgs, labels)
        correct = 0
        for i, b in enumerate(bases):
            test = np.clip(0.9 * b + rng.normal(scale=0.05, size=b.shape), 0, 1.5).astype(np.float32)
            pred, _ = model.predict(test)
            correct += pred == i
        assert correct >= len(bases) - 1


class TestLBPH:
    def test_classifies_and_updates(self, dataset, rng):
        imgs, labels, bases = dataset
        model = LBPH(grid=4).train(imgs, labels)
        pred, conf = model.predict(bases[1])
        assert pred == 1
        # incremental update with a new identity
        new_base = rng.uniform(0, 1, (32, 32)).astype(np.float32)
        new_imgs = [np.clip(new_base + rng.normal(scale=0.05, size=(32, 32)), 0, 1.5).astype(np.float32) for _ in range(3)]
        model.update(new_imgs, [9] * 3)
        pred2, _ = model.predict(new_base)
        assert pred2 == 9

    def test_lbp_codes_range(self, rng):
        img = jnp.asarray(rng.uniform(size=(16, 16)), jnp.float32)
        codes = lbp_image(img)
        assert int(codes.min()) >= 0 and int(codes.max()) <= 255

    def test_lbph_illumination_invariance(self, dataset):
        imgs, labels, bases = dataset
        model = LBPH(grid=4).train(imgs, labels)
        # LBP is invariant to monotonic illumination scaling
        pred, _ = model.predict((2.0 * bases[3]).astype(np.float32))
        assert pred == 3
