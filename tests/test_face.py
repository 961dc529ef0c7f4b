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


class TestFacemarkAAM:
    """FacemarkAAM (face/src/facemarkAAM.cpp:45): shape PCA + shape-
    normalized appearance PCA + cascaded parameter-update regression;
    trained in-repo on synthetic faces, fit from a box on a held-out face."""

    @staticmethod
    def _make_face(cy, cx, s, H=96, W=96):
        yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        img = np.zeros((H, W), np.float32)
        img[(((yy - cy) / (1.3 * s)) ** 2 + ((xx - cx) / s) ** 2) < 1] = 0.8
        ey, ex = cy - 0.4 * s, 0.45 * s
        for sx in (-1, 1):
            img[(((yy - ey) ** 2 + (xx - (cx + sx * ex)) ** 2) < (0.18 * s) ** 2)] = 0.2
        img[(np.abs(yy - (cy + 0.55 * s)) < 0.08 * s) & (np.abs(xx - cx) < 0.35 * s)] = 0.3
        img[(np.abs(yy - (cy + 0.1 * s)) < 0.12 * s) & (np.abs(xx - cx) < 0.07 * s)] = 0.5
        lm = np.array([[ey, cx - ex], [ey, cx + ex], [cy + 0.1 * s, cx],
                       [cy + 0.55 * s, cx - 0.35 * s],
                       [cy + 0.55 * s, cx + 0.35 * s],
                       [cy + 1.25 * s, cx]], np.float32)
        return img, lm

    def test_train_fit_held_out(self, rng):
        from opencv_contrib_tpu.face import aam

        imgs, shapes = [], []
        for _ in range(12):
            img, lm = self._make_face(44 + rng.uniform(-6, 6),
                                      46 + rng.uniform(-6, 6),
                                      22 + rng.uniform(-4, 5))
            imgs.append(img + rng.normal(0, 0.01, img.shape).astype(np.float32))
            shapes.append(lm)
        model = aam.train(imgs, shapes, n_shape_modes=4, n_tex_modes=4)

        img_t, lm_t = self._make_face(49, 43, 25)
        lo, hi = lm_t.min(0), lm_t.max(0)
        box = (lo[0] - 0.05 * (hi[0] - lo[0]), lo[1] - 0.05 * (hi[1] - lo[1]),
               1.1 * (hi[0] - lo[0]), 1.1 * (hi[1] - lo[1]))
        q0 = aam.init_params(model, box)
        shape0 = np.asarray(aam._shape_from_params(model, q0))
        shape_fit, _ = aam.fit(model, jnp.asarray(img_t), q0)
        e0 = np.linalg.norm(shape0 - lm_t, axis=1).mean()
        e1 = np.linalg.norm(np.asarray(shape_fit) - lm_t, axis=1).mean()
        assert e1 < 1.5, f"fit landmark error {e1:.2f}px"
        assert e1 < 0.5 * e0, "fitting must materially beat the box init"

    def test_shape_model_spans_training(self, rng):
        from opencv_contrib_tpu.face import aam

        imgs, shapes = [], []
        for _ in range(8):
            img, lm = self._make_face(44 + rng.uniform(-4, 4), 46, 22)
            imgs.append(img)
            shapes.append(lm)
        model = aam.train(imgs, shapes, n_shape_modes=3, n_tex_modes=3)
        assert model.shape_basis.shape[0] == 3
        assert model.R.shape[0] == 4  # cascade stages
