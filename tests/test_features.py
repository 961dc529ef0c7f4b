"""Feature layer tests, mirroring the reference's invariance/regression
strategy (xfeatures2d/test/test_rotation_and_scale_invariance.cpp):
detect on synthetic blob images, verify localization; describe + rematch
under warps; matcher correctness against numpy brute force."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opencv_contrib_tpu.features import detect, describe, match, keypoints
from opencv_contrib_tpu.ops import filters, image as imops


def _blob_image(centers, sigmas, shape=(128, 128), sign=None):
    H, W = shape
    y, x = np.mgrid[0:H, 0:W]
    img = np.zeros(shape, np.float32)
    for i, ((cy, cx), s) in enumerate(zip(centers, sigmas)):
        sg = 1.0 if sign is None else sign[i]
        img += sg * 200.0 * np.exp(-((y - cy) ** 2 + (x - cx) ** 2) / (2 * s * s))
    return img


@pytest.fixture(scope="module")
def checker():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 50, size=(160, 160)).astype(np.float32)
    # add strong corners via a checkerboard block
    for i in range(4):
        for j in range(4):
            if (i + j) % 2 == 0:
                img[20 + i * 30 : 50 + i * 30, 20 + j * 30 : 50 + j * 30] += 150.0
    return img


class TestDetect:
    def test_fast_hessian_finds_blobs(self):
        centers = [(40, 40), (40, 90), (90, 40), (90, 90)]
        img = _blob_image(centers, [4, 4, 4, 4])
        kps = detect.fast_hessian(jnp.asarray(img), max_keypoints=16, threshold=10.0)
        got = np.stack([np.asarray(kps.y), np.asarray(kps.x)], axis=1)[np.asarray(kps.valid)]
        assert len(got) >= 4
        for cy, cx in centers:
            d = np.sqrt(((got - [cy, cx]) ** 2).sum(axis=1)).min()
            assert d < 2.0, f"blob at {(cy, cx)} missed (min dist {d})"

    def test_fast_hessian_scale_estimate(self):
        img_small = _blob_image([(64, 64)], [3.0])
        img_big = _blob_image([(64, 64)], [6.0])
        k1 = detect.fast_hessian(jnp.asarray(img_small), max_keypoints=4, threshold=10.0)
        k2 = detect.fast_hessian(jnp.asarray(img_big), max_keypoints=4, threshold=10.0)
        s1 = float(k1.scale[0])
        s2 = float(k2.scale[0])
        assert s2 > s1 * 1.4  # doubling blob size should raise the scale

    def test_harris_on_checkerboard(self, checker):
        kps = detect.harris(jnp.asarray(checker), max_keypoints=64)
        n = int(kps.count())
        assert n >= 9  # interior checker corners
        # responses sorted descending
        r = np.asarray(kps.response)[np.asarray(kps.valid)]
        assert (np.diff(r) <= 1e-5).all()

    def test_fast_corners_on_checkerboard(self, checker):
        kps = detect.fast_corners(jnp.asarray(checker / 255.0), max_keypoints=64, threshold=0.1)
        assert int(kps.count()) >= 4

    def test_orientation_rotation_equivariance(self):
        # oriented pattern: a bright ramp edge; rotate image, angle should follow
        H = W = 96
        y, x = np.mgrid[0:H, 0:W]
        img = ((x - W / 2) * 3.0 + 100).astype(np.float32)
        img += _blob_image([(48, 48)], [5.0], (H, W))
        k = detect.fast_hessian(jnp.asarray(img), max_keypoints=4, threshold=5.0)
        a0 = float(k.angle[0])
        # rotate 90 deg
        img90 = np.rot90(img).copy()
        k90 = detect.fast_hessian(jnp.asarray(img90), max_keypoints=4, threshold=5.0)
        a90 = float(k90.angle[0])
        diff = (a90 - a0) % (2 * np.pi)
        assert min(abs(diff - np.pi / 2), abs(diff - 3 * np.pi / 2)) < 0.3


class TestDescribe:
    def _kps_grid(self, n=8, lo=30, hi=100):
        ys, xs = np.meshgrid(np.linspace(lo, hi, 3), np.linspace(lo, hi, 3))
        y = ys.ravel()[:n]
        x = xs.ravel()[:n]
        return keypoints.from_arrays(y, x, scale=np.full(n, 2.0))

    def test_surf_descriptor_shift_invariance(self, rng):
        img = rng.uniform(0, 255, size=(128, 128)).astype(np.float32)
        img = np.asarray(filters.gaussian_blur(jnp.asarray(img), 2.0))
        kps = self._kps_grid()
        d1 = describe.surf_describe(jnp.asarray(img), kps)
        # translate image and keypoints by same amount
        shift = 7
        img2 = np.roll(img, (shift, shift), (0, 1))
        kps2 = kps._replace(y=kps.y + shift, x=kps.x + shift)
        d2 = describe.surf_describe(jnp.asarray(img2), kps2)
        cos = np.sum(np.asarray(d1) * np.asarray(d2), axis=1)
        assert cos.min() > 0.99

    def test_surf_descriptor_rotation_invariance(self, rng):
        img = rng.uniform(0, 255, size=(160, 160)).astype(np.float32)
        img = np.asarray(filters.gaussian_blur(jnp.asarray(img), 3.0))
        # single central keypoint with orientation from detector
        from opencv_contrib_tpu.ops import integral as integ
        k = keypoints.from_arrays([80.0], [80.0], scale=[3.0])
        k = detect.assign_orientation(integ.integral(jnp.asarray(img)), k)
        d1 = describe.surf_describe(jnp.asarray(img), k)
        img90 = np.rot90(img, k=-1).copy()  # (y,x) -> (x, H-1-y)
        k2 = keypoints.from_arrays([80.0], [160 - 1 - 80.0], scale=[3.0])
        k2 = detect.assign_orientation(integ.integral(jnp.asarray(img90)), k2)
        d2 = describe.surf_describe(jnp.asarray(img90), k2)
        cos = float(jnp.sum(d1[0] * d2[0]))
        assert cos > 0.9

    def test_daisy_shape_and_norm(self, rng):
        img = jnp.asarray(rng.uniform(0, 1, size=(128, 128)), jnp.float32)
        kps = self._kps_grid()
        d = describe.daisy_describe(img, kps)
        assert d.shape == (8, 200)
        # partial norm: each 8-bin histogram has norm <= 1
        h = np.asarray(d).reshape(8, 25, 8)
        norms = np.linalg.norm(h, axis=2)
        assert norms.max() < 1.0 + 1e-4

    def test_binary_descriptors_pack_roundtrip(self, rng):
        img = jnp.asarray(rng.uniform(0, 255, size=(128, 128)), jnp.float32)
        kps = self._kps_grid()
        packed, signs = describe.binary_boxes_describe(img, kps)
        assert packed.shape == (8, 8) and packed.dtype == jnp.uint32
        assert signs.shape == (8, 256)
        un = describe.unpack_to_signs(packed, 256)
        np.testing.assert_array_equal(np.asarray(un), np.asarray(signs))

    def test_binary_descriptor_stability_under_noise(self, rng):
        img = rng.uniform(0, 255, size=(128, 128)).astype(np.float32)
        img = np.asarray(filters.gaussian_blur(jnp.asarray(img), 2.0))
        kps = self._kps_grid()
        _, s1 = describe.binary_boxes_describe(jnp.asarray(img), kps)
        _, s2 = describe.binary_boxes_describe(jnp.asarray(img + rng.normal(scale=2.0, size=img.shape).astype(np.float32)), kps)
        ham = 0.5 * (256 - np.sum(np.asarray(s1) * np.asarray(s2), axis=1))
        assert ham.mean() < 40  # < 16% bits flip under mild noise


class TestMatch:
    def test_l2_matrix_matches_numpy(self, rng):
        q = rng.normal(size=(33, 16)).astype(np.float32)
        t = rng.normal(size=(47, 16)).astype(np.float32)
        d = np.asarray(match.l2_distance_matrix(jnp.asarray(q), jnp.asarray(t)))
        ref = ((q[:, None] - t[None]) ** 2).sum(-1)
        np.testing.assert_allclose(d, ref, atol=1e-3)

    def test_hamming_matrix(self, rng):
        a = np.sign(rng.normal(size=(10, 64))).astype(np.float32)
        b = np.sign(rng.normal(size=(12, 64))).astype(np.float32)
        d = np.asarray(match.hamming_distance_matrix(jnp.asarray(a), jnp.asarray(b)))
        ref = (a[:, None] != b[None]).sum(-1)
        np.testing.assert_allclose(d, ref, atol=1e-4)

    def test_ratio_match_identity(self, rng):
        d = rng.normal(size=(40, 32)).astype(np.float32)
        q = d + rng.normal(scale=0.01, size=d.shape).astype(np.float32)
        m = match.ratio_test_match(jnp.asarray(q), jnp.asarray(d), ratio=0.8)
        tv = np.asarray(m.train_idx)[np.asarray(m.valid)]
        qv = np.asarray(m.query_idx)[np.asarray(m.valid)]
        assert (tv == qv).mean() > 0.95
        assert np.asarray(m.valid).sum() > 30

    def test_ratio_match_rejects_padded(self, rng):
        d = rng.normal(size=(20, 32)).astype(np.float32)
        q_valid = np.ones(20, bool)
        q_valid[15:] = False
        t_valid = np.ones(20, bool)
        t_valid[10:] = False
        m = match.ratio_test_match(
            jnp.asarray(d), jnp.asarray(d), jnp.asarray(q_valid), jnp.asarray(t_valid), ratio=0.95
        )
        v = np.asarray(m.valid)
        assert not v[15:].any()
        assert (np.asarray(m.train_idx)[v] < 10).all()

    def test_end_to_end_detect_describe_match_under_shift(self, rng):
        img = rng.uniform(0, 255, size=(160, 160)).astype(np.float32)
        img = np.asarray(filters.gaussian_blur(jnp.asarray(img), 3.0)) * 3
        shift = 10
        img2 = np.roll(img, shift, axis=1)
        k1 = detect.fast_hessian(jnp.asarray(img), max_keypoints=64, threshold=5.0)
        k2 = detect.fast_hessian(jnp.asarray(img2), max_keypoints=64, threshold=5.0)
        d1 = describe.surf_describe(jnp.asarray(img), k1)
        d2 = describe.surf_describe(jnp.asarray(img2), k2)
        m = match.ratio_test_match(d1, d2, k1.valid, k2.valid, ratio=0.9)
        v = np.asarray(m.valid)
        assert v.sum() >= 10
        dx = np.asarray(k2.x)[np.asarray(m.train_idx)[v]] - np.asarray(k1.x)[np.asarray(m.query_idx)[v]]
        # majority of matches should report the true shift
        frac = (np.abs(dx - shift) < 2.0).mean()
        assert frac > 0.7

    def test_gms_keeps_coherent_matches(self, rng):
        n = 200
        xy1 = rng.uniform(50, 590, size=(n, 2)).astype(np.float32)
        xy2 = xy1 + np.array([20.0, 10.0], np.float32)  # coherent motion
        # plant 40 random outlier matches
        xy2[:40] = rng.uniform(0, 640, size=(40, 2)).astype(np.float32)
        m = match.Matches(
            query_idx=jnp.arange(n, dtype=jnp.int32),
            train_idx=jnp.arange(n, dtype=jnp.int32),
            distance=jnp.zeros(n),
            valid=jnp.ones(n, bool),
        )
        # grid sized so ~3 matches land per cell (GMS statistics need density)
        out = match.gms_filter(
            m, jnp.asarray(xy1), jnp.asarray(xy2), shape1=(640, 640), shape2=(640, 640),
            grid=10, tau_factor=3.0,
        )
        v = np.asarray(out.valid)
        assert v[40:].mean() > 0.5
        assert v[:40].mean() < 0.25
