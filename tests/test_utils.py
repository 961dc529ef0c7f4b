"""Utils tests: trajectory/image metrics, io roundtrips, dataset parsers."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu.utils import metrics, io, datasets


class TestTrajectoryMetrics:
    def test_ate_zero_for_similarity_transformed(self, rng):
        traj = rng.normal(size=(50, 3)).astype(np.float64)
        R = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        if np.linalg.det(R) < 0:
            R[:, 0] *= -1
        est = 2.0 * traj @ R.T + np.array([1.0, -2.0, 3.0])
        assert metrics.ate_rmse(est, traj) < 1e-6

    def test_ate_nonzero_for_noise(self, rng):
        traj = rng.normal(size=(50, 3))
        est = traj + rng.normal(scale=0.1, size=traj.shape)
        a = metrics.ate_rmse(est, traj)
        assert 0.01 < a < 0.3

    def test_rpe_identity(self):
        n = 10
        poses = np.tile(np.eye(4), (n, 1, 1))
        for i in range(n):
            poses[i, 0, 3] = i * 0.1
        t_err, r_err = metrics.rpe(poses, poses)
        assert t_err < 1e-9 and r_err < 1e-6


class TestImageQuality:
    def test_psnr_identity_inf(self, rng):
        img = rng.uniform(size=(32, 32)).astype(np.float32)
        assert metrics.psnr(img, img) == float("inf")

    def test_psnr_known_value(self):
        a = np.zeros((16, 16), np.float32)
        b = np.full((16, 16), 0.1, np.float32)
        assert abs(metrics.psnr(a, b) - 20.0) < 1e-3

    def test_ssim_ranges(self, rng):
        img = rng.uniform(size=(64, 64)).astype(np.float32)
        assert metrics.ssim(img, img) > 0.999
        noisy = np.clip(img + rng.normal(scale=0.2, size=img.shape), 0, 1).astype(np.float32)
        s = metrics.ssim(img, noisy)
        assert 0.0 < s < 0.9

    def test_gmsd_zero_for_identical(self, rng):
        img = rng.uniform(size=(64, 64)).astype(np.float32)
        assert metrics.gmsd(img, img) < 1e-6
        blurred = np.asarray(jnp.asarray(img))[::1]
        assert metrics.gmsd(img, np.roll(img, 3, 0)) > 0.01


class TestIO:
    def test_image_roundtrip(self, tmp_path, rng):
        img = rng.uniform(size=(16, 16, 3)).astype(np.float32)
        p = str(tmp_path / "x.png")
        io.imwrite(p, img)
        back = io.imread(p)
        assert back.shape == (16, 16, 3)
        np.testing.assert_allclose(back, img, atol=1 / 255.0 + 1e-6)

    def test_checkpoint_roundtrip(self, tmp_path, rng):
        arrays = {"a": rng.normal(size=(4, 5)), "b": np.arange(3)}
        p = str(tmp_path / "ckpt.npz")
        io.save_checkpoint(p, arrays, attrs={"step": 7})
        arrs, attrs = io.load_checkpoint(p)
        np.testing.assert_array_equal(arrs["a"], arrays["a"])
        assert int(attrs["step"]) == 7

    def test_bundler_roundtrip(self, tmp_path, rng):
        from opencv_contrib_tpu.core import se3
        Rs = np.asarray(se3.exp_so3(jnp.asarray(rng.normal(size=(3, 3)), jnp.float32)))
        ts = rng.normal(size=(3, 3)).astype(np.float32)
        pts = rng.normal(size=(10, 3)).astype(np.float32)
        intr = np.array([500.0, 500, 320, 240, 0, 0, 0, 0, 0], np.float32)
        p = str(tmp_path / "rec.out")
        io.export_reconstruction(p, Rs, ts, pts, intr)
        R2, t2, p2, i2 = io.import_reconstruction(p)
        np.testing.assert_allclose(R2, Rs, atol=1e-5)
        np.testing.assert_allclose(p2, pts, atol=1e-5)


class TestDatasets:
    def test_tum_association(self, tmp_path):
        root = str(tmp_path)
        with open(os.path.join(root, "rgb.txt"), "w") as f:
            f.write("# comment\n1.00 rgb/1.png\n2.00 rgb/2.png\n3.00 rgb/3.png\n")
        with open(os.path.join(root, "depth.txt"), "w") as f:
            f.write("1.01 depth/1.png\n2.005 depth/2.png\n9.0 depth/9.png\n")
        with open(os.path.join(root, "groundtruth.txt"), "w") as f:
            f.write("1.0 0 0 0 0 0 0 1\n")
        seq = datasets.load_tum(root)
        assert len(seq.pairs) == 2  # frame 3 has no depth within 20ms
        assert seq.pairs[0][1] == "rgb/1.png"
        T = datasets.tum_gt_pose_at(seq.gt, 1.0)
        np.testing.assert_allclose(T, np.eye(4), atol=1e-6)

    def test_flo_roundtrip(self, tmp_path, rng):
        flow = rng.normal(size=(8, 12, 2)).astype(np.float32)
        p = str(tmp_path / "f.flo")
        datasets.write_flo(p, flow)
        back = datasets.read_flo(p)
        np.testing.assert_array_equal(back, flow)

    def test_kitti_poses_parse(self, tmp_path):
        poses = np.tile(np.eye(4)[:3].reshape(-1), (5, 1))
        pf = str(tmp_path / "00.txt")
        np.savetxt(pf, poses)
        seq = datasets.load_kitti_odometry(str(tmp_path), poses_file=pf)
        assert seq.poses.shape == (5, 3, 4)
