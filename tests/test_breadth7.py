"""Facemark cascade, mcc chart detector, BING objectness, LOGOS filter."""

import numpy as np
import jax
import jax.numpy as jnp


def _face_like(landmarks_px, shape=(96, 96)):
    """Render blobs at landmark positions over a gradient background."""
    img = np.zeros(shape, np.float32)
    yy, xx = np.meshgrid(np.arange(shape[0]), np.arange(shape[1]), indexing="ij")
    img += 0.2 + 0.002 * yy
    for (y, x) in landmarks_px:
        img += 0.8 * np.exp(-((yy - y) ** 2 + (xx - x) ** 2) / (2 * 2.5**2))
    return img.astype(np.float32)


class TestFacemark:
    def test_train_and_fit(self, rng):
        from opencv_contrib_tpu.face import facemark

        base = np.array([[30, 30], [30, 60], [55, 45], [70, 35], [70, 55]], np.float32)
        images, shapes, boxes = [], [], []
        for i in range(24):
            jitter = rng.normal(0, 2.0, base.shape).astype(np.float32)
            off = rng.uniform(-6, 6, 2).astype(np.float32)
            lm = base + jitter + off
            images.append(_face_like(lm))
            shapes.append(lm)
            boxes.append([lm[:, 0].min() - 10, lm[:, 1].min() - 10, 60.0])
        model = facemark.train(images, np.stack(shapes), np.stack(boxes), n_stages=3)
        # held-out
        lm = base + rng.normal(0, 2.0, base.shape).astype(np.float32)
        img = _face_like(lm)
        box = jnp.asarray([lm[:, 0].min() - 10, lm[:, 1].min() - 10, 60.0])
        out = np.asarray(facemark.fit(model, jnp.asarray(img), box))
        err = np.linalg.norm(out - lm, axis=1).mean()
        # mean-shape-only error for comparison
        mean_px = np.asarray(model.mean_shape) * 60.0 + np.asarray(box[:2])
        err0 = np.linalg.norm(mean_px - lm, axis=1).mean()
        assert err < err0, (err, err0)
        assert err < 4.0, err


class TestMccDetector:
    def _chart(self):
        from opencv_contrib_tpu.mcc.ccm import MACBETH_SRGB

        ref = np.asarray(MACBETH_SRGB, np.float32).reshape(4, 6, 3)
        img = np.zeros((4 * 20 + 10, 6 * 20 + 10, 3), np.float32)
        for r in range(4):
            for c in range(6):
                y0, x0 = 5 + r * 20, 5 + c * 20
                img[y0 + 2 : y0 + 18, x0 + 2 : x0 + 18] = ref[r, c]
        return img, ref

    def test_detect_chart_colors(self):
        from opencv_contrib_tpu.mcc.detector import detect_chart

        img, ref = self._chart()
        colors, centers = detect_chart(img)
        assert colors is not None, f"found {centers.shape[0]} cells"
        err = np.abs(colors.reshape(4, 6, 3) - ref).max()
        assert err < 0.05, err

    def test_detect_and_fit_ccm_identity(self):
        from opencv_contrib_tpu.mcc.detector import detect_and_fit_ccm

        img, _ = self._chart()
        M, measured = detect_and_fit_ccm(img)
        assert M is not None
        np.testing.assert_allclose(np.asarray(M), np.eye(3), atol=0.08)


class TestBing:
    def test_objectness_finds_object(self, rng):
        from opencv_contrib_tpu.saliency.bing import objectness_boxes

        img = rng.uniform(0, 0.03, (96, 96)).astype(np.float32)
        img[30:62, 40:72] += 0.8  # strong closed-boundary object
        boxes, scores = objectness_boxes(img, sizes=(32,), stride=4, top_k=8)
        b = boxes[0]
        # top box overlaps the object
        iy = max(0, min(b[2], 62) - max(b[0], 30))
        ix = max(0, min(b[3], 72) - max(b[1], 40))
        inter = iy * ix
        assert inter / (32 * 32) > 0.5, (b, scores[0])


class TestLogos:
    def test_rejects_outlier_keeps_inliers(self):
        from opencv_contrib_tpu.features.match import Matches, logos_filter

        rng = np.random.default_rng(0)
        N = 40
        xy1 = rng.uniform(10, 90, (N, 2)).astype(np.float32)
        shift = np.array([5.0, -3.0], np.float32)
        xy2 = xy1 + shift
        train_idx = np.arange(N)
        # corrupt 5 matches to random targets
        bad = rng.choice(N, 5, replace=False)
        xy2_b = xy2.copy()
        xy2_b[bad] = rng.uniform(10, 90, (5, 2))
        m = Matches(
            query_idx=jnp.arange(N, dtype=jnp.int32),
            train_idx=jnp.asarray(train_idx, jnp.int32),
            distance=jnp.zeros(N),
            valid=jnp.ones(N, bool),
        )
        out = logos_filter(m, jnp.asarray(xy1), jnp.asarray(xy2_b), k=5, min_support=2)
        v = np.asarray(out.valid)
        assert v[~np.isin(np.arange(N), bad)].mean() > 0.9
        assert v[bad].sum() == 0

    def test_pure_rotation_inliers_kept(self):
        # regression (ADVICE r1): eye*inf NaN'd the kNN graph and the
        # support test was not rotation-invariant — a pure-rotation scene
        # of 100% true inliers was rejected entirely
        from opencv_contrib_tpu.features.match import Matches, logos_filter

        rng = np.random.default_rng(1)
        N = 60
        xy1 = rng.uniform(10, 90, (N, 2)).astype(np.float32)
        th = np.deg2rad(30.0)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32)
        xy2 = (xy1 - 50.0) @ R.T * 1.2 + 55.0  # rotation + scale + shift
        m = Matches(
            query_idx=jnp.arange(N, dtype=jnp.int32),
            train_idx=jnp.arange(N, dtype=jnp.int32),
            distance=jnp.zeros(N),
            valid=jnp.ones(N, bool),
        )
        out = logos_filter(m, jnp.asarray(xy1), jnp.asarray(xy2), k=5, min_support=2)
        assert np.asarray(out.valid).all()

    def test_support_is_local(self):
        # two well-separated clusters moving with DIFFERENT shifts: every
        # match is locally consistent, so all must survive — fails if the
        # kNN graph ignores geometry (the NaN'd [self, 0, 1, ...] artifact)
        from opencv_contrib_tpu.features.match import Matches, logos_filter

        rng = np.random.default_rng(2)
        a = rng.uniform(0, 30, (20, 2)).astype(np.float32)
        b = rng.uniform(200, 230, (20, 2)).astype(np.float32)
        xy1 = np.concatenate([a, b])
        xy2 = np.concatenate([a + np.array([7.0, 2.0]), b + np.array([-4.0, 9.0])]).astype(np.float32)
        N = xy1.shape[0]
        m = Matches(
            query_idx=jnp.arange(N, dtype=jnp.int32),
            train_idx=jnp.arange(N, dtype=jnp.int32),
            distance=jnp.zeros(N),
            valid=jnp.ones(N, bool),
        )
        out = logos_filter(m, jnp.asarray(xy1), jnp.asarray(xy2), k=5, min_support=2)
        assert np.asarray(out.valid).all()
