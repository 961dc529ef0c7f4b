"""xobjdetect tests: WaldBoost learns a synthetic pattern; HOG descriptor
properties and SVM sliding-window detection."""

import numpy as np
import jax
import jax.numpy as jnp

from opencv_contrib_tpu.xobjdetect import hog, waldboost


def _cross_patch(win=24, rng=None):
    """Bright cross on dark background (the 'object')."""
    p = rng.uniform(0, 0.2, (win, win)).astype(np.float32)
    c = win // 2
    p[c - 2 : c + 2, 4:-4] += 0.8
    p[4:-4, c - 2 : c + 2] += 0.8
    return p


class TestWaldBoost:
    def _train(self, rng):
        win = 24
        key = jax.random.PRNGKey(0)
        pool = waldboost.make_feature_pool(key, win=win, n_features=256)
        pos_imgs = np.stack([_cross_patch(win, rng) for _ in range(40)])
        neg_imgs = rng.uniform(0, 1, (40, win, win)).astype(np.float32)
        center = jnp.asarray([[win // 2, win // 2]])
        fp = np.concatenate([np.asarray(waldboost.window_features(jnp.asarray(p), center, pool, win=win)) for p in pos_imgs])
        fn = np.concatenate([np.asarray(waldboost.window_features(jnp.asarray(n), center, pool, win=win)) for n in neg_imgs])
        model = waldboost.train(fp, fn, pool, n_rounds=16, win=win)
        return model, win

    def test_train_separates(self, rng):
        model, win = self._train(rng)
        # held-out
        pos = _cross_patch(win, rng)
        neg = rng.uniform(0, 1, (win, win)).astype(np.float32)
        c = jnp.asarray([[win // 2, win // 2]])
        sp = waldboost._score_windows(waldboost.window_features(jnp.asarray(pos), c, model.pool, win=win), model)
        sn = waldboost._score_windows(waldboost.window_features(jnp.asarray(neg), c, model.pool, win=win), model)
        assert float(sp[0]) > 0.0
        assert float(sn[0]) < float(sp[0])

    def test_detect_localizes(self, rng):
        model, win = self._train(rng)
        scene = rng.uniform(0, 0.3, (96, 96)).astype(np.float32)
        obj = _cross_patch(win, rng)
        scene[40 : 40 + win, 30 : 30 + win] = obj
        centers, scores = waldboost.detect(scene, model, stride=2)
        assert len(scores) > 0
        # boosted scores saturate over the object -> check the centroid of
        # the top-scoring cluster, not a single argmax
        top = centers[scores >= scores.max() - 1e-3]
        cy, cx = top.mean(0)
        assert abs(cy - 52) <= 4 and abs(cx - 42) <= 4


class TestHog:
    def test_descriptor_shape_and_norm(self, rng):
        img = rng.uniform(0, 1, (128, 64)).astype(np.float32)
        d = np.asarray(hog.hog_descriptor(img))
        assert d.shape == (15 * 7 * 36,)
        assert d.max() <= 0.5  # L2-Hys clipped and renormalized
        assert d.min() >= 0.0

    def test_rotation_changes_descriptor_translation_does_not(self, rng):
        base = np.zeros((128, 64), np.float32)
        base[30:90, 20:40] = 1.0  # vertical bar
        d1 = np.asarray(hog.hog_descriptor(base))
        d2 = np.asarray(hog.hog_descriptor(np.roll(base, 8, axis=0)))  # one cell down
        # cell-aligned translation mostly preserves the histogram mass
        m1, m2 = d1.sum(), d2.sum()
        assert abs(m1 - m2) / m1 < 0.15

    def test_svm_detection(self, rng):
        # one-shot "SVM": weight vector = descriptor of the target pattern
        win_cells = (8, 8)  # 64x64 window
        target = np.zeros((64, 64), np.float32)
        target[16:48, 28:36] = 1.0
        wvec = np.asarray(hog.hog_descriptor(target, win_cells))
        wvec = wvec - wvec.mean()
        scene = rng.uniform(0, 0.05, (128, 128)).astype(np.float32)
        scene[32 : 32 + 64, 48 : 48 + 64] = np.maximum(scene[32:96, 48:112], target)
        boxes, scores = hog.detect_multiscale(scene, wvec, win_cells=win_cells, scales=(1.0,), score_thresh=0.0)
        assert len(scores) > 0
        b = boxes[np.argmax(scores)]
        assert abs(b[0] - 32) <= 8 and abs(b[1] - 48) <= 8
