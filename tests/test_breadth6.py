"""Charuco/pose, EDSR/LapSRN, GSOC/LSBP, F1-transform, QR already separate."""

import numpy as np
import jax
import jax.numpy as jnp


class TestCharuco:
    def test_board_detect_and_interpolate(self):
        from opencv_contrib_tpu.aruco import markers as mk
        from opencv_contrib_tpu.aruco import charuco as ch

        d = mk.generate_dictionary(n_markers=12, bits=4)
        board, ids, centers = ch.draw_charuco_board(d, squares=(5, 5), square_px=40)
        det_ids, det_corners = mk.detect_markers(board, d)
        assert len(det_ids) >= 6
        cids, corners = ch.interpolate_charuco_corners(
            det_ids, det_corners, ids, centers, squares=(5, 5), square_px=40)
        assert len(cids) == 16  # 4x4 interior corners
        # interior corners land on the chessboard lattice (multiples of 40)
        err = np.abs(corners - np.round(corners / 40) * 40)
        assert err.max() < 3.0

    def test_pose_estimation(self):
        from opencv_contrib_tpu.aruco import charuco as ch
        from opencv_contrib_tpu.core import se3

        K = np.array([[200.0, 0, 64], [0, 200.0, 64], [0, 0, 1]], np.float32)
        R_true = np.asarray(se3.exp_so3(jnp.asarray([0.1, -0.2, 0.05])))
        t_true = np.array([0.05, -0.02, 1.5], np.float32)
        half = 0.1
        obj = np.array([[-half, -half, 0], [half, -half, 0],
                        [half, half, 0], [-half, half, 0]], np.float32)
        pc = obj @ R_true.T + t_true
        uv = pc[:, :2] / pc[:, 2:] * 200.0 + 64.0  # (x, y)
        quad = uv[:, ::-1]  # (y, x)
        (R, t), = ch.estimate_pose_single_markers([quad], 2 * half, K)
        assert np.linalg.norm(t - t_true) < 0.02
        assert np.asarray(se3.rotation_distance(jnp.asarray(R), jnp.asarray(R_true))) < 0.05


class TestSuperresVariants:
    def test_edsr_lapsrn_shapes_and_training(self, rng):
        from opencv_contrib_tpu.models.dnn_superres import DnnSuperRes

        for algo in ("edsr", "lapsrn"):
            sr = DnnSuperRes(algo=algo, scale=2)
            out = sr.upsample(rng.uniform(0, 1, (16, 16)).astype(np.float32))
            assert out.shape == (32, 32)
            sr.init_training(lr=1e-3)
            hr = rng.uniform(0, 1, (2, 32, 32, 1)).astype(np.float32)
            lr_b = hr[:, ::2, ::2]
            l0 = sr.train_step(jnp.asarray(lr_b), jnp.asarray(hr))
            for _ in range(5):
                l1 = sr.train_step(jnp.asarray(lr_b), jnp.asarray(hr))
            assert l1 < l0, algo


class TestGsocLsbp:
    def test_gsoc_detects_moving_object(self):
        from opencv_contrib_tpu.bgsegm import gsoc_apply, gsoc_create, synthetic_sequence

        st = gsoc_create((48, 48))
        for f, gt_mask in synthetic_sequence(n_frames=24, shape=(48, 48)):
            st, fg = gsoc_apply(st, jnp.asarray(f))
        fg = np.asarray(fg)
        gt = np.asarray(gt_mask) > 0
        tp = (fg & gt).sum() / max(gt.sum(), 1)
        fp = (fg & ~gt).sum() / max((~gt).sum(), 1)
        assert tp > 0.6, tp
        assert fp < 0.15, fp

    def test_lsbp_descriptor_and_subtraction(self):
        from opencv_contrib_tpu.bgsegm import lsbp_apply, lsbp_create, lsbp_descriptor, synthetic_sequence

        code = lsbp_descriptor(jnp.zeros((16, 16)))
        assert int(np.asarray(code).max()) == 0  # flat image -> no bits
        st = lsbp_create((48, 48))
        for f, gt_mask in synthetic_sequence(n_frames=24, shape=(48, 48), seed=3):
            st, fg = lsbp_apply(st, jnp.asarray(f))
        fg = np.asarray(fg)
        gt = np.asarray(gt_mask) > 0
        tp = (fg & gt).sum() / max(gt.sum(), 1)
        assert tp > 0.5, tp


class TestF1:
    def test_f1_reconstructs_linear_ramp_exactly(self):
        from opencv_contrib_tpu.fuzzy import f1_filter

        yy, xx = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
        ramp = (0.01 * yy + 0.02 * xx).astype(np.float32)
        out = np.asarray(f1_filter(jnp.asarray(ramp), radius=8))
        err = np.abs(out[4:-4, 4:-4] - ramp[4:-4, 4:-4]).max()
        assert err < 1e-3, err

    def test_f1_beats_f0_on_ramp(self, rng):
        from opencv_contrib_tpu.fuzzy import f0_filter, f1_filter

        yy, xx = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
        ramp = (0.03 * yy).astype(np.float32)
        noisy = ramp + rng.normal(0, 0.02, ramp.shape).astype(np.float32)
        e0 = np.abs(np.asarray(f0_filter(jnp.asarray(noisy), radius=8))[4:-4, 4:-4] - ramp[4:-4, 4:-4]).mean()
        e1 = np.abs(np.asarray(f1_filter(jnp.asarray(noisy), radius=8))[4:-4, 4:-4] - ramp[4:-4, 4:-4]).mean()
        assert e1 <= e0 + 1e-4
