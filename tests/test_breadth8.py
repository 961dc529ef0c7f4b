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
