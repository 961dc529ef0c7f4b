"""Splatting raycast (tsdf.raycast_splat) — the scatter-min z-buffer
formulation PERF.md's roofline note called for. Gates: agreement with the
marching raycast, and the reference KinFu drift bounds
(rgbd/test/test_kinfu.cpp:326-330) with the splat path forced."""

import numpy as np
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu.core import se3
from opencv_contrib_tpu.rgbd import kinfu, tsdf
from opencv_contrib_tpu.utils import sdf_scene

INTR = np.array([120.0, 120.0, 80.0, 60.0, 0, 0, 0, 0, 0], np.float32)
SHAPE = (120, 160)


@pytest.fixture(scope="module")
def vol0():
    pose = sdf_scene.orbit_poses(6, sweep=0.4)[0]
    depth0 = sdf_scene.render_depth(jnp.asarray(pose), jnp.asarray(INTR),
                                    shape=SHAPE)
    vol = tsdf.create((64, 64, 64), size=3.2, center=(0, 0, 2.2))
    return tsdf.integrate_sparse(vol, depth0, jnp.asarray(INTR), jnp.eye(4),
                                 max_blocks=512), depth0


class TestSplatVsMarch:
    def test_agreement(self, vol0):
        vol, _ = vol0
        p1, n1, v1 = tsdf.raycast(vol, jnp.asarray(INTR), jnp.eye(4),
                                  shape=SHAPE, normals="screen")
        p2, n2, v2 = tsdf.raycast_splat(vol, jnp.asarray(INTR), jnp.eye(4),
                                        shape=SHAPE, paint_sub=2, stamp=24)
        v1, v2 = np.asarray(v1), np.asarray(v2)
        # coverage: the splat must find most of what the march finds
        assert (v1 & v2).sum() > 0.85 * v1.sum()
        both = v1 & v2
        z1 = np.asarray(p1)[..., 2][both]
        z2 = np.asarray(p2)[..., 2][both]
        vox = 3.2 / 64
        assert np.abs(z1 - z2).mean() < vox
        assert np.percentile(np.abs(z1 - z2), 95) < 2 * vox

    def test_depth_matches_rendered(self, vol0):
        vol, depth0 = vol0
        p2, _, v2 = tsdf.raycast_splat(vol, jnp.asarray(INTR), jnp.eye(4),
                                       shape=SHAPE, paint_sub=2, stamp=24)
        d0 = np.asarray(depth0)
        m = np.asarray(v2) & (d0 > 0)
        z = np.asarray(p2)[..., 2]
        assert np.median(np.abs(z - d0)[m]) < 0.05

    def test_empty_volume_all_invalid(self):
        vol = tsdf.create((64, 64, 64), size=3.2, center=(0, 0, 2.2))
        _, _, v = tsdf.raycast_splat(vol, jnp.asarray(INTR), jnp.eye(4),
                                     shape=SHAPE)
        assert not np.asarray(v).any()


def test_kinfu_orbit_with_splat_raycast(monkeypatch):
    """Force the splat raycast into the KinFu tick (it normally engages
    only above 256^3) and require the reference pose-drift gates."""
    orig = tsdf.raycast_splat

    def splat_small(vol, intr, T_cw, shape=(480, 640), **kw):
        kw.update(paint_sub=2, stamp=24)
        return orig(vol, intr, T_cw, shape=shape, **kw)

    monkeypatch.setattr(kinfu.tsdf_mod, "raycast_splat", splat_small)
    # make the big-volume branch trigger at this small resolution
    import opencv_contrib_tpu.rgbd.kinfu as kfm
    orig_pyr = kfm._raycast_pyramid

    def pyr(volume, intr, T_cw, shape, levels, depth_max, n_coarse=None):
        import numpy as _np
        dims = volume.tsdf.shape
        pts, nrm, valid = splat_small(volume, intr, T_cw, shape=shape,
                                      depth_max=depth_max)
        from opencv_contrib_tpu.rgbd.frame import DepthFrame
        frames = []
        p_l, n_l, v_l = pts, nrm, valid
        depth_l = p_l[..., 2]
        for _ in range(levels):
            frames.append(DepthFrame(depth=depth_l, points=p_l, normals=n_l,
                                     valid=v_l))
            p_l, n_l, v_l = p_l[::2, ::2], n_l[::2, ::2], v_l[::2, ::2]
            depth_l = depth_l[::2, ::2]
        return tuple(frames)

    monkeypatch.setattr(kfm, "_raycast_pyramid", pyr)

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
