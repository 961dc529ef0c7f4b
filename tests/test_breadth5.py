"""Round-1 late breadth: BM3D, learning WB, quasi-dense stereo, PCAFlow, GPC."""

import numpy as np
import jax
import jax.numpy as jnp


class TestBm3d:
    def test_denoises_better_than_identity(self, rng):
        from opencv_contrib_tpu.xphoto.bm3d import bm3d_denoise

        # piecewise pattern with self-similarity
        clean = np.zeros((64, 64), np.float32)
        clean[16:48, :] = 0.6
        clean[:, 32:] += 0.3
        noisy = clean + rng.normal(0, 0.08, clean.shape).astype(np.float32)
        out = np.asarray(bm3d_denoise(jnp.asarray(noisy), sigma=0.08))
        err_in = np.abs(noisy - clean).mean()
        err_out = np.abs(out - clean).mean()
        assert err_out < 0.5 * err_in, (err_in, err_out)

    def test_preserves_edges(self, rng):
        from opencv_contrib_tpu.xphoto.bm3d import bm3d_denoise

        clean = np.zeros((64, 64), np.float32)
        clean[:, 32:] = 1.0
        noisy = clean + rng.normal(0, 0.05, clean.shape).astype(np.float32)
        out = np.asarray(bm3d_denoise(jnp.asarray(noisy), sigma=0.05))
        # the step stays sharp: big jump within 2 columns of the edge
        jump = out[:, 34].mean() - out[:, 29].mean()
        assert jump > 0.8


class TestLearningWb:
    def test_fit_and_correct(self, rng):
        from opencv_contrib_tpu.xphoto.learning_wb import fit_wb_model, learning_wb

        # scenes under random illuminants
        base = rng.uniform(0.1, 0.9, (6, 32, 32, 3)).astype(np.float32)
        ills = np.stack([
            [1.2, 1.0, 0.8], [0.8, 1.0, 1.2], [1.0, 1.0, 1.0],
            [1.3, 0.9, 0.8], [0.9, 1.2, 0.9], [1.1, 1.1, 0.8],
        ]).astype(np.float32)
        imgs = [np.clip(base[i] * ills[i] / ills[i].max(), 0, 1) for i in range(6)]
        model = fit_wb_model(imgs, ills)
        # held-out: strong red cast
        test_ill = np.array([1.4, 1.0, 0.7], np.float32)
        scene = rng.uniform(0.1, 0.9, (32, 32, 3)).astype(np.float32)
        casted = np.clip(scene * test_ill / test_ill.max(), 0, 1)
        corrected, est = learning_wb(jnp.asarray(casted), model)
        est = np.asarray(est)
        true_c = test_ill[:2] / test_ill.sum()
        assert np.abs(est[:2] - true_c).max() < 0.08
        # channel means get closer together after correction
        spread_before = np.ptp(np.asarray(casted).mean((0, 1)))
        spread_after = np.ptp(np.asarray(corrected).mean((0, 1)))
        assert spread_after < spread_before


class TestQuasiDense:
    def test_grows_disparity(self, rng):
        from opencv_contrib_tpu.stereo.quasi_dense import quasi_dense_stereo

        H, W, d_true = 48, 96, 6
        tex = rng.uniform(0, 1, (H, W + d_true)).astype(np.float32)
        left = tex[:, :W]        # left pixel x matches right pixel x - d
        right = tex[:, d_true:]
        disp, valid = quasi_dense_stereo(left, right, max_disp=16, seed_stride=8, n_sweeps=32)
        v = np.asarray(valid)
        d = np.asarray(disp)
        interior = np.zeros_like(v)
        interior[4:-4, 12:-4] = True
        cover = (v & interior).sum() / interior.sum()
        assert cover > 0.8, cover
        good = np.abs(d[v & interior] - d_true) <= 1.0
        assert good.mean() > 0.9, good.mean()


class TestPcaFlow:
    def test_recovers_smooth_flow(self, rng):
        from opencv_contrib_tpu.flow import pcaflow
        from opencv_contrib_tpu.ops import filters

        H, W = 64, 64
        I0 = np.asarray(filters.gaussian_blur(
            jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32)), 1.5))
        shift = (2.0, -3.0)
        I1 = np.roll(np.roll(I0, int(shift[0]), 0), int(shift[1]), 1)
        flow = np.asarray(pcaflow.compute(I0, I1, grid_stride=8, k=4))
        inner = flow[16:-16, 16:-16]
        assert abs(np.median(inner[..., 0]) - shift[0]) < 0.5
        assert abs(np.median(inner[..., 1]) - shift[1]) < 0.5


class TestGpc:
    def test_collisions_match_translated_image(self, rng):
        from opencv_contrib_tpu.flow import gpc
        from opencv_contrib_tpu.ops import filters

        H, W = 64, 64
        I0 = np.asarray(filters.gaussian_blur(
            jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32)), 1.0))
        I1 = np.roll(I0, 3, axis=1)
        key = jax.random.PRNGKey(0)
        forest = gpc.make_forest(key, n_trees=3, depth=10)
        d0 = np.asarray(gpc.patch_descriptors(jnp.asarray(I0))).reshape(-1, gpc.DESC_DIM)
        forest = gpc.train_forest(forest, jnp.asarray(d0[rng.choice(H * W, 512)]))
        p0, p1 = gpc.find_correspondences(I0, I1, forest)
        assert p0.shape[0] > 30
        dx = p1[:, 1] - p0[:, 1]
        dy = p1[:, 0] - p0[:, 0]
        # majority of collisions recover the true shift
        ok = (np.abs(dx - 3) <= 0.5) & (np.abs(dy) <= 0.5)
        assert ok.mean() > 0.7, ok.mean()


class TestBm3dStep2:
    """Step-2 Wiener collaborative filtering
    (bm3d_denoising_invoker_step2.hpp)."""

    @staticmethod
    def _scene(rng, sigma):
        x = np.zeros((96, 96), np.float32)
        x[20:70, 15:60] = 0.7
        x[40:90, 50:90] = np.linspace(0.2, 0.9, 40)[None, :]
        noisy = np.clip(x + rng.normal(0, sigma, x.shape), 0, 1).astype(np.float32)
        return x, jnp.asarray(noisy)

    def test_full_profile_denoises(self, rng):
        from opencv_contrib_tpu.xphoto.bm3d import bm3d, bm3d_denoise

        sigma = 0.12
        x, noisy = self._scene(rng, sigma)

        def psnr(a):
            return -10 * np.log10(np.mean((np.asarray(a) - x) ** 2))

        p_noisy = psnr(noisy)
        p_s1 = psnr(bm3d_denoise(noisy, sigma=sigma))
        p_full = psnr(bm3d(noisy, sigma=sigma))
        assert p_s1 > p_noisy + 5
        assert p_full > p_noisy + 5
        # the Wiener pass must not degrade the basic estimate materially
        assert p_full > p_s1 - 0.4

    def test_step2_is_identity_at_zero_noise(self, rng):
        from opencv_contrib_tpu.xphoto.bm3d import bm3d_denoise_step2

        x, _ = self._scene(rng, 0.0)
        xj = jnp.asarray(x)
        out = bm3d_denoise_step2(xj, xj, sigma=1e-4)
        # w -> 1 for signal coefficients: near-perfect reconstruction
        assert float(jnp.abs(out - xj).max()) < 1e-2
