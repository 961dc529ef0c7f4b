"""Tests for ximgproc part-3 completion: global smoothers, texture filters,
IIR gradients, transforms, scan segmentation, ellipse detection."""

import numpy as np
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu import ximgproc


def _step_image(h=48, w=64, noise=0.05, seed=0):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    img[:, w // 2:] = 1.0
    return img, img + rng.normal(0, noise, (h, w)).astype(np.float32)


class TestFGS:
    def test_smooths_but_keeps_edge(self):
        clean, noisy = _step_image()
        out = np.asarray(ximgproc.fast_global_smoother(jnp.array(clean), jnp.array(noisy),
                                                       lam=64.0, sigma_color=0.1))
        # noise suppressed on flat regions
        assert out[:, :20].std() < noisy[:, :20].std() * 0.5
        # edge preserved
        assert abs(out[:, 40:].mean() - out[:, :20].mean()) > 0.8

    def test_constant_fixed_point(self):
        g = jnp.ones((16, 16))
        out = np.asarray(ximgproc.fast_global_smoother(g, g * 3.0, lam=32.0))
        np.testing.assert_allclose(out, 3.0, atol=1e-4)


class TestDisparityWLS:
    def test_confident_regions_kept(self):
        H, W = 32, 48
        dL = np.full((H, W), 8.0, np.float32)
        dR = np.full((H, W), 8.0, np.float32)
        guide = np.zeros((H, W), np.float32)
        filt, conf = ximgproc.disparity_wls_filter(jnp.array(dL), jnp.array(dR), jnp.array(guide))
        assert np.asarray(conf).mean() > 0.9
        np.testing.assert_allclose(np.asarray(filt), 8.0, atol=0.2)


class TestL0:
    def test_piecewise_constant(self):
        clean, noisy = _step_image(noise=0.08)
        out = np.asarray(ximgproc.l0_smooth(jnp.array(noisy), lam=0.02))
        assert out[:, :20].std() < 0.02
        assert abs(out[:, 44:].mean() - out[:, :20].mean()) > 0.8


class TestTextureFilters:
    def test_btf_flattens_texture(self):
        rng = np.random.default_rng(1)
        img = (0.5 + 0.3 * np.sign(rng.normal(size=(40, 40)))).astype(np.float32)
        out = np.asarray(ximgproc.bilateral_texture_filter(jnp.array(img), fr=2))
        assert out.std() < img.std() * 0.8

    def test_joint_bilateral_identity_guide(self):
        clean, noisy = _step_image()
        out = np.asarray(ximgproc.joint_bilateral_filter(jnp.array(clean), jnp.array(noisy),
                                                         sigma_s=2.0, sigma_r=0.2, radius=3))
        assert out[:, :20].std() < noisy[:, :20].std()

    def test_weighted_median(self):
        clean, _ = _step_image()
        sp = clean.copy()
        sp[10, 10] = 5.0  # impulse
        out = np.asarray(ximgproc.weighted_median_filter(jnp.array(clean), jnp.array(sp),
                                                         radius=3, n_bins=8))
        assert abs(out[10, 10]) < 0.5  # impulse removed

    def test_edge_preserving(self):
        clean, noisy = _step_image()
        out = np.asarray(ximgproc.edge_preserving_filter(jnp.array(noisy), radius=3, threshold=0.3))
        assert out[:, :20].std() < noisy[:, :20].std()
        assert abs(out[:, 44:].mean() - out[:, :20].mean()) > 0.8

    def test_adaptive_manifold(self):
        clean, noisy = _step_image()
        out = np.asarray(ximgproc.adaptive_manifold_filter(jnp.array(clean), jnp.array(noisy),
                                                           sigma_s=8.0, sigma_r=0.3))
        assert out[:, :20].std() < noisy[:, :20].std()

    def test_fast_bilateral_solver(self):
        clean, noisy = _step_image()
        conf = jnp.ones_like(jnp.array(clean))
        out = np.asarray(ximgproc.fast_bilateral_solver(jnp.array(clean), jnp.array(noisy),
                                                        conf, lam=4.0, radius=2))
        assert out[:, :20].std() < noisy[:, :20].std() * 0.7
        assert abs(out[:, 44:].mean() - out[:, :20].mean()) > 0.8


class TestIIRGradients:
    def test_deriche_ramp_slope(self):
        # unit-slope ramp along x -> gradient_x == 1 in the interior
        img = np.tile(np.arange(64, dtype=np.float32), (32, 1))
        gx = np.asarray(ximgproc.deriche_gradient_x(jnp.array(img), alpha=1.5))
        np.testing.assert_allclose(gx[10:-10, 20:-20], 1.0, atol=0.05)

    def test_deriche_y_matches_transpose(self):
        rng = np.random.default_rng(2)
        img = rng.normal(size=(32, 48)).astype(np.float32)
        gy = np.asarray(ximgproc.deriche_gradient_y(jnp.array(img), alpha=1.0))
        gx_t = np.asarray(ximgproc.deriche_gradient_x(jnp.array(img.T), alpha=1.0)).T
        np.testing.assert_allclose(gy, gx_t, atol=1e-4)

    def test_paillou_edge_response(self):
        clean, _ = _step_image()
        gx = np.asarray(ximgproc.paillou_gradient_x(jnp.array(clean), alpha=1.0, omega=0.2))
        # peak response at the step column
        assert np.abs(gx).argmax(axis=1).mean() == pytest.approx(32, abs=1.5)


class TestTransforms:
    def test_radon_disc_invariance(self):
        # projections of a centered disc are angle-invariant
        H = W = 48
        ys, xs = np.mgrid[0:H, 0:W]
        disc = ((ys - 23.5) ** 2 + (xs - 23.5) ** 2 < 15 ** 2).astype(np.float32)
        sino = np.asarray(ximgproc.radon_transform(jnp.array(disc), n_angles=24))
        totals = sino.sum(axis=1)
        assert totals.std() / totals.mean() < 0.02

    def test_radon_mass_preserved(self):
        rng = np.random.default_rng(3)
        img = rng.uniform(size=(32, 32)).astype(np.float32)
        sino = np.asarray(ximgproc.radon_transform(jnp.array(img), n_angles=8))
        np.testing.assert_allclose(sino.sum(axis=1), img.sum(), rtol=0.02)

    def test_peilin_returns_2x3(self):
        H = W = 40
        ys, xs = np.mgrid[0:H, 0:W]
        blob = np.exp(-(((ys - 18) / 4.0) ** 2 + ((xs - 22) / 9.0) ** 2)).astype(np.float32)
        M = np.asarray(ximgproc.peilin_normalization(jnp.array(blob)))
        assert M.shape == (2, 3)
        assert np.isfinite(M).all()

    def test_color_match_peak_at_target(self):
        rng = np.random.default_rng(4)
        img = rng.uniform(size=(40, 40, 3)).astype(np.float32)
        tpl = img[12:20, 18:26].copy()
        resp = np.asarray(ximgproc.color_match_template(jnp.array(img), jnp.array(tpl)))
        py, px = np.unravel_index(resp.argmax(), resp.shape)
        assert (py, px) == (12, 18)

    def test_covariance_psd_and_shape(self):
        rng = np.random.default_rng(5)
        img = rng.uniform(size=(24, 24)).astype(np.float32)
        cov = np.asarray(ximgproc.covariance_estimation(jnp.array(img), window=5))
        assert cov.shape == (24, 24, 5, 5)
        evs = np.linalg.eigvalsh(cov[12, 12])
        assert evs.min() > -1e-4

    def test_fast_morphology_matches_direct(self):
        rng = np.random.default_rng(6)
        img = rng.uniform(size=(20, 28)).astype(np.float32)
        r = 3
        out = np.asarray(ximgproc.dilate_fast(jnp.array(img), r, r))
        # direct reference
        pad = np.pad(img, r, constant_values=-np.inf)
        ref = np.stack([np.roll(np.roll(pad, dy, 0), dx, 1)
                        for dy in range(-r, r + 1) for dx in range(-r, r + 1)]).max(0)[r:-r, r:-r]
        np.testing.assert_allclose(out, ref)
        ero = np.asarray(ximgproc.erode_fast(jnp.array(img), r, r))
        assert (ero <= img + 1e-6).all()


class TestScanSegment:
    def test_labels_partition(self):
        rng = np.random.default_rng(7)
        img = rng.uniform(size=(48, 64)).astype(np.float32)
        labels = np.asarray(ximgproc.scan_segment(jnp.array(img), n_superpixels=48, n_iters=3))
        assert labels.shape == (48, 64)
        assert labels.min() >= 0
        assert len(np.unique(labels)) > 20

    def test_respects_color_boundary(self):
        img = np.zeros((32, 64), np.float32)
        img[:, 32:] = 1.0
        labels = np.asarray(ximgproc.scan_segment(jnp.array(img), n_superpixels=32, n_iters=4))
        left = set(np.unique(labels[:, :28]))
        right = set(np.unique(labels[:, 36:]))
        assert not (left & right)


class TestFindEllipses:
    def test_single_ellipse_recovered(self):
        H = W = 96
        ys, xs = np.mgrid[0:H, 0:W]
        cx, cy, a, b = 48.0, 44.0, 30.0, 18.0
        r = ((xs - cx) / a) ** 2 + ((ys - cy) / b) ** 2
        img = np.clip(1.0 - np.abs(r - 1.0) * 4.0, 0, 1).astype(np.float32)
        ells, scores = ximgproc.find_ellipses(jnp.array(img), max_ellipses=4, min_pts=20)
        ells, scores = np.asarray(ells), np.asarray(scores)
        assert scores.max() > 0.5
        best = ells[scores.argmax()]
        assert abs(best[0] - cx) < 3 and abs(best[1] - cy) < 3
        assert abs(max(best[2], best[3]) - a) < 4
        assert abs(min(best[2], best[3]) - b) < 4


class TestEdgeForest:
    """Learned structured edge detector trained in-repo
    (structured_edge_detection.cpp:359-366 role)."""

    def test_learned_beats_gradient_on_texture(self):
        import jax.numpy as jnp
        from opencv_contrib_tpu.ximgproc import edge_forest as ef
        from opencv_contrib_tpu.ximgproc.edges import structured_edges_lite

        params = ef.train(n_images=30, steps=300)
        rng = np.random.default_rng(99)

        def f1(pred, gt, thr):
            p = np.asarray(pred) > thr
            gtd = gt.copy()
            for dy, dx in ((0, 1), (1, 0), (0, -1), (-1, 0)):
                gtd |= np.roll(gt, (dy, dx), (0, 1))
            tp = (p & gtd).sum()
            fp = (p & ~gtd).sum()
            pd = p.copy()
            for dy, dx in ((0, 1), (1, 0), (0, -1), (-1, 0)):
                pd |= np.roll(p, (dy, dx), (0, 1))
            fn = (gt & ~pd).sum()
            prec = tp / max(tp + fp, 1)
            rec = (gt.sum() - fn) / max(gt.sum(), 1)
            return 2 * prec * rec / max(prec + rec, 1e-9)

        sf, sl = [], []
        for _ in range(6):
            im, gt = ef._synthetic_scene(rng)
            imj = jnp.asarray(im)
            pf = ef.edges_nms(ef.structured_edges(imj, params), imj)
            pl = structured_edges_lite(imj)
            sf.append(max(f1(pf, gt, t) for t in (0.2, 0.3, 0.5, 0.7)))
            sl.append(max(f1(pl, gt, t) for t in (0.05, 0.1, 0.2, 0.3, 0.5)))
        assert np.mean(sf) > 0.72, f"learned F1 {np.mean(sf):.3f}"
        # the learned detector must beat the gradient stand-in on
        # texture-bearing scenes (the structured forest's value add)
        assert np.mean(sf) > np.mean(sl), (np.mean(sf), np.mean(sl))

    def test_edge_boxes_accepts_learned_map(self):
        import jax.numpy as jnp
        from opencv_contrib_tpu.ximgproc import edge_forest as ef
        from opencv_contrib_tpu.ximgproc.segmentation import edge_boxes

        rng = np.random.default_rng(1)
        im, _ = ef._synthetic_scene(rng)
        emap = np.abs(np.gradient(im)[0])  # any HxW map works as input
        boxes = [(10, 10, 50, 50), (2, 2, 8, 8)]
        s = edge_boxes(im, boxes, edge_map=emap)
        assert len(s) == 2
