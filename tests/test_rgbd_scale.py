"""Hash-TSDF + submap large-scale KinFu tests (SDF-scene strategy)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu.core import se3
from opencv_contrib_tpu.rgbd import hash_tsdf, submap, tsdf
from opencv_contrib_tpu.utils import sdf_scene

INTR = np.array([120.0, 120.0, 80.0, 60.0, 0, 0, 0, 0, 0], np.float32)
SHAPE = (120, 160)


@pytest.fixture(scope="module")
def frame0():
    poses = sdf_scene.orbit_poses(2, sweep=0.3)
    T_wc = poses[0]
    d = np.asarray(sdf_scene.render_depth(jnp.asarray(T_wc), jnp.asarray(INTR), shape=SHAPE))
    return T_wc, d


class TestHashTSDF:
    def test_allocation_follows_surface(self, frame0):
        T_wc, d = frame0
        T_cw = np.asarray(se3.inverse(jnp.asarray(T_wc)))
        vol = hash_tsdf.create(capacity=4096, voxel_size=0.04)
        vol = hash_tsdf.allocate(vol, jnp.asarray(d), jnp.asarray(INTR), jnp.asarray(T_cw))
        n = hash_tsdf.n_active(vol)
        assert 50 < n < 4096, n
        # allocated blocks should be near the observed surface
        centers = (np.asarray(vol.coords[np.asarray(vol.active)]) + 0.5) * hash_tsdf.B * 0.04
        sd = np.asarray(sdf_scene.sdf_cube_spheres(jnp.asarray(centers.astype(np.float32))))
        assert np.abs(sd).min() < 0.4

    def test_integrate_raycast_roundtrip(self, frame0):
        T_wc, d = frame0
        T_cw = np.asarray(se3.inverse(jnp.asarray(T_wc)))
        vol = hash_tsdf.create(capacity=8192, voxel_size=0.03)
        vol = hash_tsdf.allocate(vol, jnp.asarray(d), jnp.asarray(INTR), jnp.asarray(T_cw))
        vol = hash_tsdf.integrate(vol, jnp.asarray(d), jnp.asarray(INTR), jnp.asarray(T_cw))
        pts, nrm, valid = hash_tsdf.raycast(vol, jnp.asarray(INTR), jnp.asarray(T_cw), shape=SHAPE)
        z = np.asarray(pts[..., 2])
        v = np.asarray(valid)
        both = v & (d > 0)
        assert both.mean() > 0.2, both.mean()
        err = np.abs(z[both] - d[both])
        assert np.median(err) < 0.04  # within ~a voxel

    def test_lookup_miss_is_invalid(self):
        vol = hash_tsdf.create(capacity=64)
        val, ok = hash_tsdf.sample(vol, jnp.asarray([[0.5, 0.5, 0.5]]))
        assert not bool(ok[0])

    def test_capacity_overflow_keeps_working(self, frame0):
        T_wc, d = frame0
        T_cw = np.asarray(se3.inverse(jnp.asarray(T_wc)))
        vol = hash_tsdf.create(capacity=128, voxel_size=0.04)  # too small on purpose
        vol = hash_tsdf.allocate(vol, jnp.asarray(d), jnp.asarray(INTR), jnp.asarray(T_cw))
        assert hash_tsdf.n_active(vol) <= 128
        vol = hash_tsdf.integrate(vol, jnp.asarray(d), jnp.asarray(INTR), jnp.asarray(T_cw))
        assert np.isfinite(np.asarray(vol.tsdf)).all()


class TestLargeKinFu:
    def test_orbit_with_submap_creation(self):
        poses = sdf_scene.orbit_poses(10, sweep=1.2)  # wide sweep forces submaps
        depths = [np.asarray(sdf_scene.render_depth(jnp.asarray(p), jnp.asarray(INTR), shape=SHAPE)) for p in poses]
        p = submap.LargeKinFuParams(intr=INTR, frame_shape=SHAPE)
        p.max_dist_from_center = 0.35
        lk = submap.LargeKinFu(p)
        for i, d in enumerate(depths):
            assert lk.update(d), f"tracking lost at {i}"
        assert len(lk.submaps) >= 2, "wide sweep should spawn submaps"
        # pose drift against ground truth (relative to first frame)
        T_est = jnp.asarray(lk.pose)
        T_gt = se3.inverse(jnp.asarray(poses[0])) @ jnp.asarray(poses[-1])
        dr = np.asarray(se3.log_se3(se3.inverse(T_gt) @ T_est))
        assert np.linalg.norm(dr[:3]) < 0.05, dr
        assert np.linalg.norm(dr[3:]) < 0.15, dr

    def test_pose_graph_closes_loop(self):
        poses = sdf_scene.orbit_poses(8, sweep=1.0)
        depths = [np.asarray(sdf_scene.render_depth(jnp.asarray(p), jnp.asarray(INTR), shape=SHAPE)) for p in poses]
        p = submap.LargeKinFuParams(intr=INTR, frame_shape=SHAPE)
        p.max_dist_from_center = 0.3
        p.min_frames_per_submap = 2
        lk = submap.LargeKinFu(p)
        for d in depths:
            lk.update(d)
        if len(lk.submaps) < 3:
            pytest.skip("not enough submaps for a loop test")
        # synthetic loop closure: perfect constraint first->last submap
        i, j = 0, len(lk.submaps) - 1
        # ground-truth-ish relative pose from current estimates plus noise on odometry chain
        T_rel = np.asarray(
            se3.inverse(jnp.asarray(lk.submaps[i].T_ws)) @ jnp.asarray(lk.submaps[j].T_ws)
        )
        lk.add_loop_constraint(i, j, T_rel, weight=2.0)
        c0, c1 = lk.optimize_pose_graph(n_iters=15)
        assert c1 <= c0 + 1e-6


class TestHashKinFu:
    """KinFu on the hashed-block volume — Params::hashTSDFParams role
    (kinfu.hpp:19, hash_tsdf.cpp:81-91): unbounded scenes, blocks
    allocated along the band per frame; same drift gates as dense KinFu
    (test_kinfu.cpp:326-330)."""

    def test_orbit_tracking(self):
        from opencv_contrib_tpu.rgbd import kinfu
        from opencv_contrib_tpu.utils import sdf_scene
        from opencv_contrib_tpu.core import camera as cam, se3

        poses = sdf_scene.orbit_poses(8, sweep=0.5)
        intr = np.asarray(cam.make_intrinsics(100.0, 100.0, 80.0, 60.0))
        depths = [np.asarray(sdf_scene.render_depth(
            jnp.asarray(T), jnp.asarray(intr), shape=(120, 160)))
            for T in poses]
        p = kinfu.KinFuParams.default(intr, (120, 160))
        p.volume_resolution = (96, 96, 96)
        p.volume_size = 3.2
        k = kinfu.HashKinFu(p, capacity=4096)
        for d in depths:
            assert k.update(d), f"tracking lost at frame {k.frame_count}"
        T_est = jnp.asarray(k.pose)
        T_gt = se3.inverse(jnp.asarray(poses[0])) @ jnp.asarray(poses[-1])
        d = np.asarray(se3.log_se3(se3.inverse(T_gt) @ T_est))
        assert np.linalg.norm(d[:3]) < 0.02, d
        assert np.linalg.norm(d[3:]) < 0.1, d
        # the pool only holds band blocks, far below a dense 96^3 grid
        n = k.n_active_blocks()
        assert 0 < n < 4096, n
