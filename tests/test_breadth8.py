"""Pair pruning, GMS auto grid, transient segmentation, random pattern,
non-local matting."""

import numpy as np
import jax
import jax.numpy as jnp


class TestPairing:
    def test_selects_similar_pairs(self, rng):
        from opencv_contrib_tpu.sfm.pairing import make_codebook, select_pairs

        # two groups of images with distinct descriptor statistics
        D, K = 32, 64
        base_a = rng.normal(size=(1, 1, D))
        base_b = -base_a
        descs = np.concatenate([
            base_a + 0.1 * rng.normal(size=(4, K, D)),
            base_b + 0.1 * rng.normal(size=(4, K, D)),
        ]).astype(np.float32)
        valids = np.ones((8, K), bool)
        pairs = select_pairs(descs, valids, k=2)
        # intra-group pairs dominate
        intra = sum(1 for i, j in pairs if (i < 4) == (j < 4))
        assert intra / len(pairs) > 0.8

    def test_prunes_quadratic(self, rng):
        from opencv_contrib_tpu.sfm.pairing import select_pairs

        descs = rng.normal(size=(12, 32, 16)).astype(np.float32)
        pairs = select_pairs(descs, np.ones((12, 32), bool), k=3)
        assert len(pairs) < 12 * 11 / 2  # strictly fewer than all pairs


class TestGmsAuto:
    def test_runs_and_filters(self, rng):
        from opencv_contrib_tpu.features.match import Matches, gms_filter_auto

        N = 200
        xy1 = rng.uniform(0, 400, (N, 2)).astype(np.float32)
        xy2 = xy1 + np.array([6.0, 4.0], np.float32)
        bad = rng.choice(N, 40, replace=False)
        xy2b = xy2.copy()
        xy2b[bad] = rng.uniform(0, 400, (40, 2))
        m = Matches(jnp.arange(N, dtype=jnp.int32), jnp.arange(N, dtype=jnp.int32),
                    jnp.zeros(N), jnp.ones(N, bool))
        out = gms_filter_auto(m, jnp.asarray(xy1), jnp.asarray(xy2b),
                              shape1=(400, 400), shape2=(400, 400))
        v = np.asarray(out.valid)
        good = ~np.isin(np.arange(N), bad)
        assert v[good].mean() > 0.6
        assert v[bad].mean() < 0.3


class TestTransient:
    def test_segments_moving_region(self, rng):
        from opencv_contrib_tpu.bioinspired.transient import transient_create, transient_run

        st = transient_create((64, 64))
        for i in range(10):
            magno = 0.01 * rng.standard_normal((64, 64)).astype(np.float32)
            magno[20:40, 24:44] += 0.5  # persistent transient region
            st, seg = transient_run(st, jnp.asarray(magno))
        seg = np.asarray(seg)
        assert seg[24:36, 28:40].mean() > 0.7
        assert seg[:10, :10].mean() < 0.1


class TestRandomPattern:
    def test_finds_correspondences_identity(self):
        from opencv_contrib_tpu.ccalib.random_pattern import find_correspondences, generate_pattern

        pat = generate_pattern((96, 128))
        obj, img_pts, n = find_correspondences(pat, pat, pattern_size_m=(0.096, 0.128))
        assert n >= 20
        # identity view: image pixels == pattern pixels -> obj = px * scale
        np.testing.assert_allclose(obj[:, 0], img_pts[:, 0] * 0.001, atol=5e-4)

    def test_shifted_view(self):
        from opencv_contrib_tpu.ccalib.random_pattern import find_correspondences, generate_pattern

        pat = generate_pattern((96, 128))
        img = np.roll(pat, (4, 7), (0, 1))
        obj, img_pts, n = find_correspondences(pat, img)
        assert n >= 15
        # displaced by (7, 4) in (x, y)
        dx = img_pts[:, 0] - obj[:, 0] / (0.20 / 128)
        dy = img_pts[:, 1] - obj[:, 1] / (0.16 / 96)
        assert abs(np.median(dx) - 7) < 1.0
        assert abs(np.median(dy) - 4) < 1.0


class TestNonlocalMatting:
    def test_propagates_across_gap(self):
        from opencv_contrib_tpu.alphamat.infoflow import info_flow, info_flow_nonlocal

        # two same-color regions separated by a background strip; FG label
        # only on the left region — non-local flow should carry alpha to the
        # right region, the local-only solve should not (as strongly)
        H, W = 48, 48
        img = np.zeros((H, W), np.float32)
        img[16:32, 4:16] = 1.0
        img[16:32, 32:44] = 1.0
        trimap = np.full((H, W), 0.5, np.float32)
        trimap[20:28, 6:10] = 1.0   # FG seed in left region
        trimap[:8] = 0.0            # BG seeds
        trimap[-8:] = 0.0
        a_loc = np.asarray(info_flow(jnp.asarray(img), jnp.asarray(trimap)))
        a_nl = np.asarray(info_flow_nonlocal(jnp.asarray(img), jnp.asarray(trimap),
                                             n_samples=512, k=4))
        right = (slice(20, 28), slice(34, 42))
        assert a_nl[right].mean() > a_loc[right].mean() + 0.05
        assert a_nl[right].mean() > 0.5
        # background stays background
        assert a_nl[:6].mean() < 0.2


class TestTemplateMatch:
    def test_modes_localize(self, rng):
        from opencv_contrib_tpu.ops.template_match import match_template, min_max_loc

        img = rng.uniform(0, 1, (64, 80)).astype(np.float32)
        tm = img[20:36, 30:50].copy()
        for method, use_max in [("ccorr_normed", True), ("sqdiff", False),
                                ("ccoeff_normed", True), ("sqdiff_normed", False)]:
            r = match_template(jnp.asarray(img), jnp.asarray(tm), method)
            mn_v, mx_v, mn, mx = min_max_loc(r)
            loc = mx if use_max else mn
            assert loc == (20, 30), (method, loc)
        # normalized peak is ~1
        r = match_template(jnp.asarray(img), jnp.asarray(tm), "ccoeff_normed")
        assert abs(float(jnp.max(r)) - 1.0) < 1e-3


class TestCannyHoughMser:
    def test_canny_connects_weak_chain(self):
        from opencv_contrib_tpu.ximgproc.hough_mser import canny

        # ramp edge whose magnitude decays along the edge: weak tail must
        # survive because it connects to the strong head
        img = np.zeros((48, 64), np.float32)
        for x in range(64):
            img[24:, x] = 0.15 + 0.85 * (1 - x / 63)
        e = np.asarray(canny(jnp.asarray(img), low=0.02, high=0.3))
        row = e[22:26]
        assert row[:, 5:60].any(axis=0).mean() > 0.9

    def test_hough_circles(self):
        from opencv_contrib_tpu.ximgproc.hough_mser import hough_circles

        yy, xx = np.meshgrid(np.arange(96), np.arange(96), indexing="ij")
        img = (((yy - 40) ** 2 + (xx - 50) ** 2) <= 14**2).astype(np.float32)
        c = hough_circles(img, r_min=8, r_max=20, n_radii=13, top_k=3)
        assert c.shape[0] >= 1
        best = c[0]
        assert abs(best[0] - 40) <= 2 and abs(best[1] - 50) <= 2
        assert abs(best[2] - 14) <= 2

    def test_mser_finds_stable_blob(self, rng):
        from opencv_contrib_tpu.ximgproc.hough_mser import mser

        img = np.full((64, 64), 0.9, np.float32)
        img[20:40, 24:44] = 0.1  # high-contrast stable dark blob
        img += rng.normal(0, 0.01, img.shape).astype(np.float32)
        regions = mser(img, n_levels=16)
        assert regions.shape[0] >= 1
        r = regions[0]
        assert abs(r[0] - 29.5) < 3 and abs(r[1] - 33.5) < 3


class TestGmg:
    def test_detects_after_init(self):
        from opencv_contrib_tpu.bgsegm.gmg import gmg_apply, gmg_create
        from opencv_contrib_tpu.bgsegm import synthetic_sequence

        st = gmg_create((48, 48))
        frames = list(synthetic_sequence(n_frames=40, shape=(48, 48), seed=5))
        # init on static background (object-free frames = background only)
        bg = np.asarray(frames[0][0]) * 0 + 0.5
        rng = np.random.default_rng(1)
        for i in range(22):
            st, fg = gmg_apply(st, jnp.asarray((bg + rng.normal(0, 0.01, bg.shape)).astype(np.float32)))
        assert not bool(np.asarray(fg).any())
        # now a bright object appears
        obj = bg.copy()
        obj[10:20, 10:20] = 0.95
        st, fg = gmg_apply(st, jnp.asarray(obj.astype(np.float32)))
        fg = np.asarray(fg)
        assert fg[12:18, 12:18].mean() > 0.9
        assert fg[30:, 30:].mean() < 0.05


class TestRegRobust:
    def test_huber_ignores_occlusion(self, rng):
        from opencv_contrib_tpu.reg.mapper import register_pyramid, warp_with_params
        from opencv_contrib_tpu.ops import filters

        base = np.asarray(filters.gaussian_blur(
            jnp.asarray(rng.uniform(0, 1, (64, 64)).astype(np.float32)), 1.5))
        mov = np.roll(base, (3, -2), (0, 1))
        ref = base.copy()
        ref[40:56, 40:56] = 1.0  # occluder in the reference only
        p = register_pyramid(jnp.asarray(ref), jnp.asarray(mov), model="shift", levels=None)
        # recovered shift close to truth despite the occluder
        assert abs(float(p[0]) - 3) < 0.5 and abs(float(p[1]) + 2) < 0.5


class TestOmniCalibrate:
    def test_joint_calibration_recovers_parameters(self, rng):
        from opencv_contrib_tpu.ccalib.omnidir import calibrate_omni, project_points_omni
        from opencv_contrib_tpu.core import se3

        K_true = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]], np.float32)
        xi_true = 0.9
        # WIDE-ANGLE board views: the unified model's (f, xi) pair is only
        # identifiable when the board subtends a large angle (the same
        # degeneracy omnidir::calibrate documents) — 0.08 m pitch at ~0.35 m
        gy, gx = np.meshgrid(np.arange(6), np.arange(8), indexing="ij")
        board = np.stack([gx.ravel() * 0.08, gy.ravel() * 0.08, np.zeros(48)], 1).astype(np.float32)
        board -= board.mean(0)
        objs, imgs = [], []
        for i in range(6):
            w = 0.3 * rng.standard_normal(3).astype(np.float32)
            R = np.asarray(se3.exp_so3(jnp.asarray(w)))
            t = np.array([0.02, -0.01, 0.0], np.float32) + 0.08 * rng.standard_normal(3).astype(np.float32)
            t[2] = abs(t[2]) + 0.3
            px = np.asarray(project_points_omni(jnp.asarray(board), jnp.asarray(R), jnp.asarray(t),
                                                jnp.asarray(K_true), xi_true))
            objs.append(board)
            imgs.append(px + 0.1 * rng.standard_normal(px.shape).astype(np.float32))
        K, xi, Rs, ts, rms = calibrate_omni(objs, imgs, (240, 320), outer_iters=60)
        assert rms < 0.3, rms
        assert abs(K[0, 0] - 300) / 300 < 0.05, K
        assert abs(xi - xi_true) < 0.1, xi
        # with xi known (fix_xi), same quality
        K2, xi2, _, _, rms2 = calibrate_omni(objs, imgs, (240, 320), xi0=xi_true,
                                             outer_iters=60, fix_xi=True)
        assert rms2 < 0.3 and abs(K2[0, 0] - 300) / 300 < 0.05
        assert abs(xi2 - xi_true) < 1e-6
