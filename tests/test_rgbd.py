"""RGB-D stack tests mirroring the reference's synthetic SDF-scene strategy
(rgbd/test/test_kinfu.cpp, test_odometry.cpp, pose graph tests): raymarched
depth frames with known poses; estimators must recover them within the
reference's own drift gates."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu.core import se3
from opencv_contrib_tpu.rgbd import frame, icp, tsdf, kinfu, odometry, posegraph
from opencv_contrib_tpu.utils import sdf_scene

INTR = np.array([120.0, 120.0, 80.0, 60.0, 0, 0, 0, 0, 0], np.float32)
SHAPE = (120, 160)


def _depth_at(T_wc):
    return sdf_scene.render_depth(jnp.asarray(T_wc), jnp.asarray(INTR), shape=SHAPE)


@pytest.fixture(scope="module")
def poses():
    return sdf_scene.orbit_poses(8, sweep=0.5)


@pytest.fixture(scope="module")
def depths(poses):
    return [np.asarray(_depth_at(p)) for p in poses]


class TestFrame:
    def test_points_normals(self, depths):
        f = frame.make_frame(jnp.asarray(depths[0]), jnp.asarray(INTR), levels=3)
        assert len(f) == 3
        d0 = f[0]
        v = np.asarray(d0.valid)
        assert v.mean() > 0.3
        n = np.asarray(d0.normals)[v]
        np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-4)
        # normals face the camera
        p = np.asarray(d0.points)[v]
        assert ((n * p).sum(axis=1) < 1e-6).mean() > 0.99

    def test_backprojection_consistency(self, depths):
        d = jnp.asarray(depths[0])
        pts = frame.depth_to_points(d, jnp.asarray(INTR))
        # reproject: u = x/z*fx+cx must reproduce the pixel grid where valid
        z = np.asarray(pts[..., 2])
        valid = z > 0
        u = np.asarray(pts[..., 0]) / np.where(valid, z, 1) * INTR[0] + INTR[2]
        uu = np.broadcast_to(np.arange(SHAPE[1], dtype=np.float32), SHAPE)
        assert np.abs((u - uu)[valid]).max() < 1e-3


class TestICP:
    def test_recovers_known_motion(self, poses, depths):
        # two consecutive frames with known relative pose
        f0 = frame.make_frame(jnp.asarray(depths[0]), jnp.asarray(INTR))
        f1 = frame.make_frame(jnp.asarray(depths[1]), jnp.asarray(INTR))
        # ground truth: T maps cam1 coords -> cam0 coords
        T_gt = np.asarray(se3.inverse(jnp.asarray(poses[0])) @ jnp.asarray(poses[1]))
        T, ok, err = icp.estimate_transform(f1, f0, jnp.asarray(INTR))
        assert bool(ok)
        d = np.asarray(se3.log_se3(jnp.asarray(T_gt) @ se3.inverse(T)))
        assert np.linalg.norm(d[:3]) < 0.01, d
        assert np.linalg.norm(d[3:]) < 0.02, d

    def test_identity_for_same_frame(self, depths):
        f0 = frame.make_frame(jnp.asarray(depths[0]), jnp.asarray(INTR))
        T, ok, err = icp.estimate_transform(f0, f0, jnp.asarray(INTR))
        xi = np.asarray(se3.log_se3(T))
        assert np.abs(xi).max() < 1e-4


class TestTSDF:
    def test_integrate_raycast_roundtrip(self, poses, depths):
        vol = tsdf.create((96, 96, 96), size=3.2)
        T_cw = np.asarray(se3.inverse(jnp.asarray(poses[0])))
        vol = tsdf.integrate(vol, jnp.asarray(depths[0]), jnp.asarray(INTR), jnp.asarray(T_cw))
        pts, nrm, valid = tsdf.raycast(vol, jnp.asarray(INTR), jnp.asarray(T_cw), shape=SHAPE)
        z = np.asarray(pts[..., 2])
        v = np.asarray(valid)
        d0 = depths[0]
        both = v & (d0 > 0)
        assert both.mean() > 0.25
        err = np.abs(z[both] - d0[both])
        assert np.median(err) < 0.02  # within ~a voxel

    def test_weight_accumulates(self, poses, depths):
        vol = tsdf.create((64, 64, 64), size=3.2)
        T_cw = np.asarray(se3.inverse(jnp.asarray(poses[0])))
        vol1 = tsdf.integrate(vol, jnp.asarray(depths[0]), jnp.asarray(INTR), jnp.asarray(T_cw))
        vol2 = tsdf.integrate(vol1, jnp.asarray(depths[0]), jnp.asarray(INTR), jnp.asarray(T_cw))
        assert float(vol2.weight.max()) == 2.0
        np.testing.assert_allclose(np.asarray(vol1.tsdf), np.asarray(vol2.tsdf), atol=1e-5)

    def test_extract_points_on_surface(self, poses, depths):
        vol = tsdf.create((64, 64, 64), size=3.2)
        T_cw = np.asarray(se3.inverse(jnp.asarray(poses[0])))
        vol = tsdf.integrate(vol, jnp.asarray(depths[0]), jnp.asarray(INTR), jnp.asarray(T_cw))
        pts, nrm, valid = tsdf.extract_points(vol, max_points=8192)
        v = np.asarray(valid)
        assert v.sum() > 100
        # points should lie near the SDF zero level
        d = np.abs(np.asarray(sdf_scene.sdf_cube_spheres(pts[v])))
        assert np.median(d) < 0.05


class TestTSDFRegressions:
    def test_invalid_depth_pixels_not_integrated(self):
        """Regression (ADVICE r1): depth==0 pixels must never integrate —
        the bf16 matmul lookup could round them to a small positive depth
        passing the d > 0 gate for near-camera voxels."""
        vol = tsdf.create((64, 64, 64), size=3.0, center=(0.0, 0.0, 1.5))
        H, W = SHAPE
        depth = np.full(SHAPE, 2.7, np.float32)
        depth[:, : W // 2] = 0.0  # left half invalid
        vol = tsdf.integrate(vol, jnp.asarray(depth), jnp.asarray(INTR), jnp.eye(4))
        w = np.asarray(vol.weight)
        # voxels projecting left of the principal point (u < cx) see only
        # invalid pixels; none may carry weight (margin of 2 voxels for
        # pixel rounding at the seam)
        assert w[: 64 // 2 - 2].sum() == 0.0
        # the valid half did integrate
        assert w[64 // 2 + 2 :].sum() > 0

    def test_lookup_precision_exact(self):
        """The one-hot matmul depth lookup must reproduce depth exactly
        (HIGHEST precision), not to bf16 (~mm error at meter scale)."""
        vol = tsdf.create((48, 48, 48), size=2.0, center=(0.0, 0.0, 1.5))
        rng = np.random.default_rng(3)
        depth = rng.uniform(1.0, 3.0, SHAPE).astype(np.float32)
        v2 = tsdf.integrate(vol, jnp.asarray(depth), jnp.asarray(INTR), jnp.eye(4))
        # reconstruct measured depth from the fused tsdf at weight-1 voxels:
        # tsdf = clip((d - z)/trunc) -> for |tsdf|<1, d = z + tsdf*trunc
        t = np.asarray(v2.tsdf)
        w = np.asarray(v2.weight)
        X = 48
        gi = np.stack(np.meshgrid(*[np.arange(X)] * 3, indexing="ij"), -1).astype(np.float32)
        pw = gi * float(vol.voxel_size) + np.asarray(vol.origin)
        z = pw[..., 2]
        u = np.round(pw[..., 0] / z * INTR[0] + INTR[2]).astype(int)
        v = np.round(pw[..., 1] / z * INTR[1] + INTR[3]).astype(int)
        sel = (w > 0) & (np.abs(t) < 0.999) & (u >= 0) & (u < SHAPE[1]) & (v >= 0) & (v < SHAPE[0])
        d_rec = z[sel] + t[sel] * float(vol.trunc_dist)
        d_true = depth[v[sel], u[sel]]
        assert np.abs(d_rec - d_true).max() < 1e-4, np.abs(d_rec - d_true).max()

    def test_raycast_thin_band_not_skipped(self):
        """Regression (ADVICE r1): the coarse raycast step must stay below
        trunc_dist — with trunc 40mm < the old fixed 81mm step, a wall's
        narrow negative band was stepped over and lost."""
        vol = tsdf.create((96, 96, 96), size=3.0, center=(0.0, 0.0, 1.5), trunc_dist=0.04)
        depth = np.full(SHAPE, 2.0, np.float32)
        vol = tsdf.integrate(vol, jnp.asarray(depth), jnp.asarray(INTR), jnp.eye(4))
        pts, nrm, valid = tsdf.raycast(vol, jnp.asarray(INTR), jnp.eye(4), shape=SHAPE)
        v = np.asarray(valid)
        assert v.mean() > 0.5, v.mean()
        z = np.asarray(pts[..., 2])[v]
        assert np.median(np.abs(z - 2.0)) < 0.03


class TestKinFu:
    def test_orbit_tracking(self, poses, depths):
        """The reference's acceptance gate (test_kinfu.cpp:326-330):
        pose drift |drvec| < 0.02, |dt| < 0.1 on the synthetic orbit."""
        p = kinfu.KinFuParams.default(INTR, SHAPE)
        p.volume_resolution = (96, 96, 96)
        p.volume_size = 3.2
        p.volume_center = (0.0, 0.0, 2.2)  # scene sits ~2.2m ahead
        kf = kinfu.KinFu(p)
        for d in depths:
            assert kf.update(d), f"tracking lost at frame {kf.frame_count}"
        # compare final pose: estimated cam->world vs ground truth, modulo
        # the first frame (kinfu's world = first camera frame)
        T_est = jnp.asarray(kf.pose)  # cam->world(kinfu)
        T_gt = se3.inverse(jnp.asarray(poses[0])) @ jnp.asarray(poses[-1])  # cam_last -> cam_first
        d = np.asarray(se3.log_se3(se3.inverse(T_gt) @ T_est))
        assert np.linalg.norm(d[:3]) < 0.02, d
        assert np.linalg.norm(d[3:]) < 0.1, d


class TestOdometry:
    def test_icp_odometry(self, poses, depths):
        gray0 = depths[0] * 50.0  # depth-derived fake intensity
        gray1 = depths[1] * 50.0
        T, ok = odometry.compute(gray0 * 0, depths[1], gray1 * 0, depths[0], INTR, method="icp")
        # T maps cam(src=frame1) -> cam(dst=frame0)
        T_gt = np.asarray(se3.inverse(jnp.asarray(poses[0])) @ jnp.asarray(poses[1]))
        d = np.asarray(se3.log_se3(jnp.asarray(T_gt) @ se3.inverse(T)))
        assert ok
        assert np.linalg.norm(d[:3]) < 0.015, d
        assert np.linalg.norm(d[3:]) < 0.03, d

    def test_merged_odometry_with_texture(self, poses, depths):
        # textured gray: project a procedural pattern through depth points
        def gray_of(d, T_wc):
            pts = frame.depth_to_points(jnp.asarray(d), jnp.asarray(INTR))
            R, t = se3.mat_to_rt(jnp.asarray(T_wc))
            pw = jnp.einsum("ij,hwj->hwi", R, pts) + t
            return np.asarray(jnp.sin(4.0 * pw[..., 0]) * jnp.cos(4.0 * pw[..., 1]) * (jnp.asarray(d) > 0))

        g0 = gray_of(depths[0], poses[0])
        g1 = gray_of(depths[1], poses[1])
        T, ok = odometry.compute(g1, depths[1], g0, depths[0], INTR, method="merged")
        T_gt = np.asarray(se3.inverse(jnp.asarray(poses[0])) @ jnp.asarray(poses[1]))
        d = np.asarray(se3.log_se3(jnp.asarray(T_gt) @ se3.inverse(T)))
        assert ok
        assert np.linalg.norm(d[:3]) < 0.015, d
        assert np.linalg.norm(d[3:]) < 0.03, d


class TestPoseGraph:
    def _ring_graph(self, n=12, noise=0.05, seed=0):
        """Ring of poses with noisy odometry edges + exact loop closure."""
        rng = np.random.default_rng(seed)
        # ground-truth poses on a circle
        gt = []
        for k in range(n):
            a = 2 * np.pi * k / n
            T = np.asarray(se3.exp_se3(jnp.asarray([0, a, 0, np.cos(a), 0, np.sin(a)], dtype=np.float32)))
            gt.append(T)
        gt = np.stack(gt)
        edges_ij, edges_T = [], []
        for k in range(n):
            j = (k + 1) % n
            T_rel = np.asarray(se3.inverse(jnp.asarray(gt[k])) @ jnp.asarray(gt[j]))
            if j != 0:  # odometry edges get noise; loop closure exact
                xi = rng.normal(scale=noise, size=6).astype(np.float32)
                T_rel = np.asarray(se3.exp_se3(jnp.asarray(xi))) @ T_rel
            edges_ij.append([k, j])
            edges_T.append(T_rel)
        # initial poses: integrate noisy odometry
        init = [gt[0]]
        for k in range(n - 1):
            init.append(init[-1] @ edges_T[k])
        return gt, np.stack(init), np.array(edges_ij), np.stack(edges_T)

    def test_loop_closure_reduces_error(self):
        gt, init, eij, eT = self._ring_graph()
        g = posegraph.make_graph(init, eij, eT)
        g2, costs = posegraph.optimize(g, n_iters=30)
        assert float(costs[1]) < float(costs[0]) * 0.05
        # final node should be dragged back near ground truth
        d_before = np.linalg.norm(np.asarray(init)[-1][:3, 3] - gt[-1][:3, 3])
        d_after = np.linalg.norm(np.asarray(g2.poses)[-1][:3, 3] - gt[-1][:3, 3])
        assert d_after < d_before * 0.7

    def test_fixed_node_stays(self):
        gt, init, eij, eT = self._ring_graph()
        g = posegraph.make_graph(init, eij, eT)
        g2, _ = posegraph.optimize(g, n_iters=10)
        np.testing.assert_allclose(np.asarray(g2.poses[0]), init[0], atol=1e-6)

    def test_invalid_edges_ignored(self):
        gt, init, eij, eT = self._ring_graph()
        # append a garbage edge, masked out
        eij2 = np.concatenate([eij, [[0, 5]]])
        eT2 = np.concatenate([eT, [np.eye(4, dtype=np.float32)]])
        valid = np.concatenate([np.ones(len(eij), bool), [False]])
        g_clean = posegraph.make_graph(init, eij, eT)
        g_masked = posegraph.make_graph(init, eij2, eT2, edges_valid=valid)
        r1, c1 = posegraph.optimize(g_clean, n_iters=15)
        r2, c2 = posegraph.optimize(g_masked, n_iters=15)
        np.testing.assert_allclose(np.asarray(r1.poses), np.asarray(r2.poses), atol=1e-4)
