"""Optical flow tests: known synthetic warps must be recovered within EPE
gates (the Sintel-metric strategy scaled down to unit fixtures)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu.flow import dis, lk, tvl1, motempl
from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.ops.image import warp_affine


@pytest.fixture(scope="module")
def textured():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, size=(96, 128)).astype(np.float32)
    return np.asarray(filters.gaussian_blur(jnp.asarray(img), 1.5)) * 4.0


def _shifted(img, dy, dx):
    M = jnp.array([[1.0, 0.0, dx], [0.0, 1.0, dy]])  # output->input map
    return np.asarray(warp_affine(jnp.asarray(img), M))


class TestLK:
    def test_sparse_track_translation(self, textured):
        I1 = _shifted(textured, 3.0, -2.0)  # I1(y,x) = I0(y+3, x-2) => flow I0->I1 = (-3, +2)
        pts = jnp.asarray(np.array([[40.0, 50.0], [30, 80], [60, 40], [50, 100]], np.float32))
        new_pts, flow, valid = lk.track(jnp.asarray(textured), jnp.asarray(I1), pts)
        assert bool(valid.all())
        np.testing.assert_allclose(np.asarray(flow), np.tile([-3.0, 2.0], (4, 1)), atol=0.1)

    def test_invalid_outside(self, textured):
        I1 = _shifted(textured, 0.0, 40.0)
        pts = jnp.asarray(np.array([[48.0, 5.0]], np.float32))  # will leave image
        _, _, valid = lk.track(jnp.asarray(textured), jnp.asarray(I1), pts)
        assert not bool(valid[0])


class TestDIS:
    def test_translation_epe(self, textured):
        I1 = _shifted(textured, 2.0, 1.0)
        flow = dis.compute(textured, I1, levels=3)
        gt = np.tile(np.array([-2.0, -1.0], np.float32), (96, 128, 1))
        # interior EPE (borders are unknowable)
        e = np.linalg.norm(np.asarray(flow)[8:-8, 8:-8] - gt[8:-8, 8:-8], axis=-1)
        assert e.mean() < 0.25, e.mean()

    def test_rotation_field(self, textured):
        # small rotation about center
        a = 0.03
        c, s = np.cos(a), np.sin(a)
        H, W = textured.shape
        cy, cx = H / 2, W / 2
        M = jnp.array([[c, -s, cx - c * cx + s * cy], [s, c, cy - s * cx - c * cy]])
        I1 = np.asarray(warp_affine(jnp.asarray(textured), M))
        flow = dis.compute(textured, I1, levels=3)
        # warp_affine maps OUTPUT->INPUT: I1(p) = I0(Mp), so a feature at p0
        # in I0 shows up at M^-1 p0 in I1 => flow(p) = M^-1 p - p
        Mh = np.eye(3, dtype=np.float32)
        Mh[:2] = np.asarray(M)
        Minv = np.linalg.inv(Mh)
        y, x = np.mgrid[0:H, 0:W].astype(np.float32)
        gx = Minv[0, 0] * x + Minv[0, 1] * y + Minv[0, 2] - x
        gy = Minv[1, 0] * x + Minv[1, 1] * y + Minv[1, 2] - y
        gt = np.stack([gy, gx], axis=-1)
        e = np.linalg.norm(np.asarray(flow)[8:-8, 8:-8] - gt[8:-8, 8:-8], axis=-1)
        assert e.mean() < 0.3, e.mean()

    def test_epe_metric(self):
        f = jnp.zeros((4, 4, 2))
        g = jnp.ones((4, 4, 2))
        assert abs(float(dis.epe(f, g)) - np.sqrt(2)) < 1e-6


class TestTVL1:
    def test_translation_epe(self, textured):
        I1 = _shifted(textured, 1.0, 2.0)
        flow = tvl1.compute(textured, I1, levels=3)
        gt = np.tile(np.array([-1.0, -2.0], np.float32), (96, 128, 1))
        e = np.linalg.norm(np.asarray(flow)[8:-8, 8:-8] - gt[8:-8, 8:-8], axis=-1)
        assert e.mean() < 0.35, e.mean()


class TestMotempl:
    def test_history_update_and_decay(self):
        mhi = jnp.zeros((8, 8))
        sil = jnp.zeros((8, 8)).at[2:4, 2:4].set(1.0)
        mhi = motempl.update_motion_history(mhi, sil, timestamp=1.0, duration=0.5)
        assert float(mhi[2, 2]) == 1.0
        mhi = motempl.update_motion_history(mhi, jnp.zeros((8, 8)), timestamp=2.0, duration=0.5)
        assert float(mhi[2, 2]) == 0.0  # decayed

    def test_global_orientation(self):
        # gradient ramp moving right: build mhi with increasing timestamps
        mhi = jnp.zeros((16, 16))
        for t in range(1, 6):
            sil = jnp.zeros((16, 16)).at[:, 2 * t : 2 * t + 2].set(1.0)
            mhi = motempl.update_motion_history(mhi, sil, timestamp=float(t), duration=10.0)
        orient, valid = motempl.calc_motion_gradient(mhi, 0.5, 10.0)
        ang = motempl.calc_global_orientation(orient, valid, mhi, timestamp=5.0, duration=10.0)
        # motion to the right: gradient of mhi points +x => orientation ~0 deg
        a = float(ang)
        assert min(a, 360 - a) < 45.0
