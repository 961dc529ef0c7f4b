"""Round-3 breadth: rgbd normal methods (FALS/LINEMOD/SRI), line_descriptor
multi-index hashing matcher."""

import numpy as np
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu.rgbd import normals as rn
from opencv_contrib_tpu import line_descriptor as ld

INTR = jnp.array([100.0, 100.0, 32.0, 24.0])  # fx, fy, cx, cy


def _plane_depth(H=48, W=64, nz=(0.2, -0.1, 1.0), d0=2.0):
    """Depth map of the plane n.p = n_z*d0 (|n| normalized later)."""
    n = np.asarray(nz, np.float64)
    n = n / np.linalg.norm(n)
    vs, us = np.mgrid[0:H, 0:W].astype(np.float64)
    rx = (us - 32.0) / 100.0
    ry = (vs - 24.0) / 100.0
    # point = z * (rx, ry, 1); n . point = c -> z = c / (n . ray)
    c = n[2] * d0
    z = c / (n[0] * rx + n[1] * ry + n[2])
    return z.astype(np.float32), n


class TestNormals:
    @pytest.mark.parametrize("method", ["fals", "linemod", "sri"])
    def test_plane_normals(self, method):
        depth, n_true = _plane_depth()
        out = np.asarray(rn.rgbd_normals(jnp.array(depth), INTR, method=method))
        # interior pixels; orientation toward camera means n.p < 0 -> n ~ -n_true
        inner = out[8:-8, 8:-8]
        dots = inner @ (-n_true)
        assert np.abs(dots).mean() > 0.99
        assert (np.abs(np.linalg.norm(inner, axis=-1) - 1.0) < 1e-3).all()

    def test_invalid_depth_masked(self):
        depth, _ = _plane_depth()
        depth[10:14, 10:14] = 0.0
        out = np.asarray(rn.normals_linemod(jnp.array(depth), INTR))
        assert (out[11:13, 11:13] == 0).all()

    def test_sri_smoother_on_noise(self):
        depth, n_true = _plane_depth()
        rng = np.random.default_rng(0)
        noisy = depth + rng.normal(0, 0.01, depth.shape).astype(np.float32)
        sri = np.asarray(rn.normals_sri(jnp.array(noisy), INTR))
        lin = np.asarray(rn.normals_linemod(jnp.array(noisy), INTR))
        err_sri = 1 - np.abs(sri[8:-8, 8:-8] @ n_true).mean()
        err_lin = 1 - np.abs(lin[8:-8, 8:-8] @ n_true).mean()
        assert err_sri < err_lin


class TestMIH:
    def _codes(self, n, words, rng):
        return jnp.asarray(rng.integers(0, 2 ** 32, (n, words), dtype=np.uint64).astype(np.uint32))

    def test_exact_self_match(self):
        rng = np.random.default_rng(1)
        codes = self._codes(64, 8, rng)
        index = ld.mih_build(codes, b=8, cap=16)
        idx, dist = ld.mih_knn_match(index, codes, k=1)
        np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(64))
        np.testing.assert_array_equal(np.asarray(dist)[:, 0], 0)

    def test_near_match_within_radius(self):
        rng = np.random.default_rng(2)
        codes = np.asarray(self._codes(128, 8, rng))
        q = codes[7:8].copy()
        q[0, 3] ^= np.uint32(0b101)  # flip 2 bits in one word
        index = ld.mih_build(jnp.asarray(codes), b=8, cap=16)
        idx, dist = ld.mih_knn_match(index, jnp.asarray(q), k=2)
        assert int(idx[0, 0]) == 7
        assert int(dist[0, 0]) == 2

    def test_radius_match(self):
        rng = np.random.default_rng(3)
        codes = np.asarray(self._codes(64, 4, rng))
        index = ld.mih_build(jnp.asarray(codes), b=8, cap=16)
        q = codes[5:6]
        idx, dist = ld.mih_radius_match(index, jnp.asarray(q), radius=0)
        found = set(np.asarray(idx)[0][np.asarray(idx)[0] >= 0].tolist())
        assert found == {5}

    def test_binarize_shapes_and_invariance(self):
        rng = np.random.default_rng(4)
        d = jnp.asarray(rng.normal(size=(10, 12)).astype(np.float32))
        codes = ld.lbd_binarize(d)
        assert codes.dtype == jnp.uint32
        # monotone scaling leaves comparisons unchanged
        codes2 = ld.lbd_binarize(d * 3.0)
        np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes2))

    def test_end_to_end_with_lbd(self):
        rng = np.random.default_rng(5)
        img = rng.uniform(size=(64, 96)).astype(np.float32)
        img[20:24, :] = 1.5  # horizontal bar -> line
        segs, valid = ld.detect_line_segments(jnp.array(img), max_lines=8)
        desc = ld.lbd_describe(jnp.array(img), segs, valid)
        codes = ld.lbd_binarize(desc)
        index = ld.mih_build(codes, b=8, cap=8)
        idx, dist = ld.mih_knn_match(index, codes, k=1)
        v = np.asarray(valid)
        assert (np.asarray(idx)[v, 0] == np.arange(len(v))[v]).all()
