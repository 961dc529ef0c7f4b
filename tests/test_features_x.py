"""Tests for the round-2 xfeatures2d additions: FREAK/LATCH/LUCID
descriptors, VGG/BoostDesc-class learned descriptors, Star/MSD/
Harris-Laplace/TBMR detectors, affine adaptation, PCT signatures + SQFD.

Strategy mirrors the reference's rotation/scale invariance suite
(xfeatures2d/test/test_rotation_and_scale_invariance.cpp): detect on a
textured image, rotate, re-describe, and require a high inlier rate among
ratio-test matches under the known transform.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu.features import keypoints as kp_mod
from opencv_contrib_tpu.features.detect import fast_hessian, assign_orientation
from opencv_contrib_tpu.features.detect_x import (
    affine_adapt,
    harris_laplace,
    msd_detector,
    star_detector,
    tbmr,
)
from opencv_contrib_tpu.features.describe_x import (
    freak_describe,
    latch_describe,
    lucid_describe,
)
from opencv_contrib_tpu.features.learned import (
    boostdesc_describe,
    train_projection,
    vgg_describe,
)
from opencv_contrib_tpu.features.match import ratio_test_match
from opencv_contrib_tpu.features.pct import compute_signature, sqfd
from opencv_contrib_tpu.ops import filters, integral as integ
from opencv_contrib_tpu.ops.image import warp_affine


def _blob_image(centers, sigmas, shape=(128, 128)):
    H, W = shape
    y, x = np.mgrid[0:H, 0:W]
    img = np.zeros(shape, np.float32)
    for (cy, cx), s in zip(centers, sigmas):
        img += 200.0 * np.exp(-((y - cy) ** 2 + (x - cx) ** 2) / (2 * s * s))
    return img


@pytest.fixture(scope="module")
def texture_pair():
    """Textured image + 15°-rotated version + forward point map."""
    rng = np.random.default_rng(2)
    img = filters.fast_gaussian_blur(
        jnp.asarray(rng.uniform(0, 255, (240, 320)).astype(np.float32)), 1.5)
    th = np.deg2rad(15.0)
    c, s = np.cos(th), np.sin(th)
    cx, cy = 160.0, 120.0
    M = jnp.asarray([[c, -s, cx - c * cx + s * cy],
                     [s, c, cy - s * cx - c * cy]], jnp.float32)  # out->in
    img2 = warp_affine(img, M)
    Rm = np.array([[c, -s], [s, c]], np.float32)
    t = np.array([float(M[0, 2]), float(M[1, 2])], np.float32)

    def fwd(xy):  # input point -> output point
        return (xy - t) @ Rm

    k1 = fast_hessian(img, max_keypoints=128, threshold=20.0)
    k2 = fast_hessian(img2, max_keypoints=128, threshold=20.0)
    k1 = assign_orientation(integ.integral(img), k1)
    k2 = assign_orientation(integ.integral(img2), k2)
    return img, img2, k1, k2, fwd


def _inlier_rate(k1, k2, m, fwd, tol=3.0):
    v = np.asarray(m.valid)
    if v.sum() == 0:
        return 0.0, 0
    p1 = np.stack([np.asarray(k1.x), np.asarray(k1.y)], 1)
    mapped = fwd(p1)
    x2 = np.asarray(k2.x)[np.asarray(m.train_idx)]
    y2 = np.asarray(k2.y)[np.asarray(m.train_idx)]
    err = np.hypot(mapped[:, 0] - x2, mapped[:, 1] - y2)
    return float((err[v] < tol).mean()), int(v.sum())


class TestDescribeX:
    def test_freak_rotation_invariance(self, texture_pair):
        img, img2, k1, k2, fwd = texture_pair
        _, s1, _ = freak_describe(img, k1)
        _, s2, _ = freak_describe(img2, k2)
        m = ratio_test_match(s1, s2, k1.valid, k2.valid, ratio=0.95, metric="hamming")
        rate, n = _inlier_rate(k1, k2, m, fwd)
        assert n > 20 and rate > 0.6, (n, rate)

    def test_latch_rotation_invariance(self, texture_pair):
        img, img2, k1, k2, fwd = texture_pair
        _, s1 = latch_describe(img, k1)
        _, s2 = latch_describe(img2, k2)
        m = ratio_test_match(s1, s2, k1.valid, k2.valid, ratio=0.95, metric="hamming")
        rate, n = _inlier_rate(k1, k2, m, fwd)
        assert n > 20 and rate > 0.8, (n, rate)

    def test_lucid_shapes(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 255, (64, 64)).astype(np.float32))
        kps = kp_mod.from_arrays(y=rng.uniform(10, 50, 8), x=rng.uniform(10, 50, 8))
        r = lucid_describe(img, kps)
        assert r.shape == (8, 49)
        # ranks are a permutation of 0..P-1 normalized
        row = np.sort(np.asarray(r[0]))
        np.testing.assert_allclose(row, np.arange(49) / 48.0, atol=1e-6)


class TestLearned:
    @pytest.fixture(scope="class")
    def W(self):
        return train_projection(n_patches=192, out_dim=64)

    def test_vgg_rotation_invariance(self, texture_pair, W):
        img, img2, k1, k2, fwd = texture_pair
        d1 = vgg_describe(img, k1, W)
        d2 = vgg_describe(img2, k2, W)
        m = ratio_test_match(d1, d2, k1.valid, k2.valid, ratio=0.95)
        rate, n = _inlier_rate(k1, k2, m, fwd)
        assert n > 20 and rate > 0.8, (n, rate)

    def test_boostdesc_bits(self, texture_pair, W):
        img, img2, k1, k2, fwd = texture_pair
        _, s1 = boostdesc_describe(img, k1, W, n_bits=64)
        _, s2 = boostdesc_describe(img2, k2, W, n_bits=64)
        m = ratio_test_match(s1, s2, k1.valid, k2.valid, ratio=0.95, metric="hamming")
        rate, n = _inlier_rate(k1, k2, m, fwd)
        assert n > 15 and rate > 0.7, (n, rate)

    def test_projection_beats_raw(self, W):
        """The learned projection must improve warp NN-accuracy over raw
        pooled gradients (the training objective's sanity check)."""
        from opencv_contrib_tpu.features.learned import (
            _center_kp, _synthetic_patches, pooled_gradient_raw)

        ps = _synthetic_patches(jax.random.PRNGKey(5), 24)
        size = ps.shape[1]

        def raw(p, ang, sc):
            return np.asarray(pooled_gradient_raw(p, _center_kp(size, ang, 2.0 * sc))[0])

        ra = np.stack([raw(p, 0.0, 1.0) for p in ps])
        rb = np.stack([raw(p, 0.25, 1.1) for p in ps])

        def acc(a, b):
            D = ((a[:, None] - b[None]) ** 2).sum(-1)
            return (D.argmin(1) == np.arange(len(a))).mean()

        Wn = np.asarray(W)
        pa, pb = ra @ Wn, rb @ Wn
        pa /= np.linalg.norm(pa, axis=1, keepdims=True) + 1e-12
        pb /= np.linalg.norm(pb, axis=1, keepdims=True) + 1e-12
        assert acc(pa, pb) >= acc(ra, rb)


class TestDetectX:
    def test_star_finds_blobs(self):
        centers = [(40, 40), (40, 90), (90, 40), (90, 90)]
        img = _blob_image(centers, [5] * 4)
        k = star_detector(jnp.asarray(img), max_keypoints=16)
        got = np.stack([np.asarray(k.y), np.asarray(k.x)], 1)[np.asarray(k.valid)]
        for cy, cx in centers:
            assert np.hypot(got[:, 0] - cy, got[:, 1] - cx).min() < 3.0

    def test_msd_salient_structure(self):
        # an isolated corner structure is self-dissimilar; flat areas are not
        img = np.zeros((96, 96), np.float32)
        img[40:56, 40:56] = 200.0
        k = msd_detector(jnp.asarray(img), max_keypoints=16)
        got = np.stack([np.asarray(k.y), np.asarray(k.x)], 1)[np.asarray(k.valid)]
        assert len(got) >= 4
        # all detections near the square's boundary (self-dissimilar zone)
        d_edge = np.minimum(np.abs(got - 40), np.abs(got - 55)).min(1)
        assert (d_edge < 8).all(), got

    def test_harris_laplace_scale_selection(self):
        small = _blob_image([(64, 64)], [3.0])
        big = _blob_image([(64, 64)], [6.0])
        rng = np.random.default_rng(0)
        noise = rng.uniform(0, 2, (128, 128)).astype(np.float32)
        k1 = harris_laplace(jnp.asarray(small + noise), max_keypoints=8)
        k2 = harris_laplace(jnp.asarray(big + noise), max_keypoints=8)
        s1 = float(k1.scale[0])
        s2 = float(k2.scale[0])
        assert s2 > s1, (s1, s2)

    def test_tbmr_elliptic_regions(self):
        img = _blob_image([(40, 40), (80, 80)], [6, 6])
        ek = tbmr(jnp.asarray(img), max_regions=16)
        v = np.asarray(ek.valid)
        assert v.sum() >= 2
        c = np.stack([np.asarray(ek.y)[v], np.asarray(ek.x)[v]], 1)
        for cy, cx in [(40, 40), (80, 80)]:
            assert np.hypot(c[:, 0] - cy, c[:, 1] - cx).min() < 4.0

    def test_affine_adapt_anisotropy(self):
        # an elongated Gaussian ridge must yield a/b > 1 along the ridge
        y, x = np.mgrid[0:96, 0:96]
        img = 200.0 * np.exp(-(((y - 48) / 4.0) ** 2 + ((x - 48) / 12.0) ** 2) / 2)
        kps = kp_mod.from_arrays(y=jnp.asarray([48.0]), x=jnp.asarray([48.0]),
                                 scale=jnp.asarray([6.0]))
        ek = affine_adapt(jnp.asarray(img.astype(np.float32)), kps)
        assert float(ek.a[0]) / float(ek.b[0]) > 1.5


class TestPCT:
    def test_sqfd_identity_and_discrimination(self):
        rng = np.random.default_rng(0)
        a = filters.fast_gaussian_blur(jnp.asarray(rng.uniform(0, 1, (96, 96)).astype(np.float32)), 2.0)
        b = jnp.asarray(_blob_image([(30, 30)], [8], (96, 96)) / 200.0)
        sa = compute_signature(a)
        sb = compute_signature(b)
        assert float(sqfd(sa, sa)) < 1e-5
        assert float(sqfd(sa, sb)) > 0.01

    def test_signature_weights_normalized(self):
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(0, 1, (64, 64)).astype(np.float32))
        s = compute_signature(img, k=8)
        assert abs(float(s.weights.sum()) - 1.0) < 1e-5
