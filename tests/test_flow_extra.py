"""Tests for the remaining optflow algorithms (DeepFlow, SimpleFlow,
SparseToDense, RLOF): synthetic warps recovered within EPE gates, and the
RLOF illumination model recovering flow under gain/bias changes plain LK
cannot handle."""

import numpy as np
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu.flow import extra, lk
from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.ops.image import warp_affine


@pytest.fixture(scope="module")
def textured():
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 1, size=(80, 96)).astype(np.float32)
    return np.asarray(filters.gaussian_blur(jnp.asarray(img), 1.5)) * 4.0


def _shifted(img, dy, dx):
    M = jnp.array([[1.0, 0.0, dx], [0.0, 1.0, dy]])  # output->input map
    return np.asarray(warp_affine(jnp.asarray(img), M))


def _interior_epe(flow, gt_dy, gt_dx, m=10):
    gt = np.tile(np.array([gt_dy, gt_dx], np.float32), flow.shape[:2] + (1,))
    e = np.linalg.norm(np.asarray(flow)[m:-m, m:-m] - gt[m:-m, m:-m], axis=-1)
    return e.mean()


class TestDeepFlow:
    def test_translation(self, textured):
        I1 = _shifted(textured, 1.5, -1.0)
        flow = extra.deepflow(textured, I1, levels=4)
        assert _interior_epe(flow, -1.5, 1.0) < 0.35


class TestSimpleFlow:
    def test_translation(self, textured):
        I1 = _shifted(textured, 2.0, 1.0)
        flow = extra.simpleflow(textured, I1, levels=3, search_radius=3)
        assert _interior_epe(flow, -2.0, -1.0) < 0.5


class TestSparseToDense:
    def test_translation(self, textured):
        I1 = _shifted(textured, 3.0, -2.0)
        flow = extra.sparse_to_dense(textured, I1)
        assert _interior_epe(flow, -3.0, 2.0) < 0.3


class TestRLOF:
    def test_sparse_with_illumination_change(self, textured):
        # gain+bias change on the target frame: plain LK's brightness
        # constancy breaks; RLOF's model absorbs it
        I1 = _shifted(textured, 2.0, -1.0) * 1.3 + 0.15
        pts = jnp.asarray(
            np.array([[40.0, 48.0], [30, 60], [50, 30], [44, 70]], np.float32))
        _, flow_r, valid = extra.rlof_track(
            jnp.asarray(textured), jnp.asarray(I1), pts)
        assert bool(valid.all())
        np.testing.assert_allclose(
            np.asarray(flow_r), np.tile([-2.0, 1.0], (4, 1)), atol=0.15)
        # plain LK on the same input drifts visibly more
        _, flow_l, _ = lk.track(jnp.asarray(textured), jnp.asarray(I1), pts)
        err_r = np.abs(np.asarray(flow_r) - [-2.0, 1.0]).max()
        err_l = np.abs(np.asarray(flow_l) - [-2.0, 1.0]).max()
        assert err_r < err_l

    def test_dense(self, textured):
        I1 = _shifted(textured, 1.0, 2.0)
        flow = extra.rlof_dense(textured, I1, use_variational=True)
        assert _interior_epe(flow, -1.0, -2.0) < 0.35
