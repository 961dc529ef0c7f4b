"""Block-sparse TSDF integration tests: band-exact parity with the dense
path, full parity in carve mode, overflow robustness, and KinFu tracking
through the sparse path (reference gates: rgbd/test/test_kinfu.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu.core import se3
from opencv_contrib_tpu.rgbd import tsdf, kinfu
from opencv_contrib_tpu.utils import sdf_scene

INTR = np.array([120.0, 120.0, 80.0, 60.0, 0, 0, 0, 0, 0], np.float32)
SHAPE = (120, 160)


@pytest.fixture(scope="module")
def depth0():
    # render from an orbit pose (the origin sits inside scene geometry);
    # integration treats that camera frame as world (volume ~2.2m ahead)
    pose = sdf_scene.orbit_poses(6, sweep=0.4)[0]
    return sdf_scene.render_depth(jnp.asarray(pose), jnp.asarray(INTR),
                                  shape=SHAPE)


def test_band_parity_with_dense(depth0):
    vol = tsdf.create((64, 64, 64), size=3.2, center=(0, 0, 2.2))
    vd = tsdf.integrate(vol, depth0, jnp.asarray(INTR), jnp.eye(4))
    vs = tsdf.integrate_sparse(vol, depth0, jnp.asarray(INTR), jnp.eye(4),
                               max_blocks=256)
    td, ts = np.asarray(vd.tsdf), np.asarray(vs.tsdf)
    wd, ws = np.asarray(vd.weight), np.asarray(vs.weight)
    band = np.abs(td) < 0.999  # strictly inside the truncation band
    assert band.sum() > 100
    np.testing.assert_array_equal(td[band], ts[band])
    np.testing.assert_array_equal(wd[band], ws[band])
    # sparse never writes where dense didn't
    assert not np.any((ws > 0) & (wd == 0))


def test_carve_mode_full_parity(depth0):
    vol = tsdf.create((64, 64, 64), size=3.2, center=(0, 0, 2.2))
    vd = tsdf.integrate(vol, depth0, jnp.asarray(INTR), jnp.eye(4))
    vc = tsdf.integrate_sparse(vol, depth0, jnp.asarray(INTR), jnp.eye(4),
                               max_blocks=512, carve=True)
    np.testing.assert_array_equal(np.asarray(vd.tsdf), np.asarray(vc.tsdf))
    np.testing.assert_array_equal(np.asarray(vd.weight), np.asarray(vc.weight))


def test_overflow_drops_far_blocks_only(depth0):
    """With a tiny block budget the near blocks still integrate and the
    result stays a strict subset of the dense update."""
    vol = tsdf.create((64, 64, 64), size=3.2, center=(0, 0, 2.2))
    vd = tsdf.integrate(vol, depth0, jnp.asarray(INTR), jnp.eye(4))
    vs = tsdf.integrate_sparse(vol, depth0, jnp.asarray(INTR), jnp.eye(4),
                               max_blocks=16)
    ws = np.asarray(vs.weight)
    wd = np.asarray(vd.weight)
    assert 0 < (ws > 0).sum() <= (wd > 0).sum()
    assert not np.any((ws > 0) & (wd == 0))
    # written voxels match dense values exactly
    m = ws > 0
    np.testing.assert_array_equal(np.asarray(vs.tsdf)[m], np.asarray(vd.tsdf)[m])


def test_sparse_raycast_sees_surface(depth0):
    vol = tsdf.create((96, 96, 96), size=3.2, center=(0, 0, 2.2))
    vol = tsdf.integrate_sparse(vol, depth0, jnp.asarray(INTR), jnp.eye(4),
                                max_blocks=512)
    pts, nrm, valid = tsdf.raycast(vol, jnp.asarray(INTR), jnp.eye(4),
                                   shape=SHAPE)
    v = np.asarray(valid)
    assert v.mean() > 0.2
    # raycast depth close to the input depth where both valid
    z = np.asarray(pts[..., 2])
    d = np.asarray(depth0)
    both = v & (d > 0)
    assert np.median(np.abs(z[both] - d[both])) < 0.05


def test_kinfu_sparse_orbit_tracking():
    """KinFu with block-sparse integration must hold the reference pose
    gates (test_kinfu.cpp:326-330): |drvec| < 0.02, |dt| < 0.1."""
    poses = sdf_scene.orbit_poses(6, sweep=0.4)
    depths = [np.asarray(sdf_scene.render_depth(jnp.asarray(p),
                                                jnp.asarray(INTR),
                                                shape=SHAPE))
              for p in poses]
    p = kinfu.KinFuParams.default(INTR, SHAPE)
    p.volume_resolution = (96, 96, 96)
    p.volume_size = 3.2
    p.volume_center = (0.0, 0.0, 2.2)
    p.sparse_blocks = 512
    kf = kinfu.KinFu(p)
    for d in depths:
        assert kf.update(d), f"tracking lost at frame {kf.frame_count}"
    T_est = jnp.asarray(kf.pose)
    T_gt = se3.inverse(jnp.asarray(poses[0])) @ jnp.asarray(poses[-1])
    dlt = np.asarray(se3.log_se3(se3.inverse(T_gt) @ T_est))
    assert np.linalg.norm(dlt[:3]) < 0.02, dlt
    assert np.linalg.norm(dlt[3:]) < 0.1, dlt
