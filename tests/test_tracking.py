"""Tracking tests: correlation filters follow a moving target on synthetic
sequences; Kalman filters recover known dynamics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu.tracking import correlation, kalman
from opencv_contrib_tpu.ops import filters


def _target_sequence(n=12, shape=(128, 128), start=(40.0, 40.0), vel=(2.0, 3.0), seed=0):
    """Textured blob moving at constant velocity over textured background."""
    rng = np.random.default_rng(seed)
    bg = np.asarray(filters.gaussian_blur(jnp.asarray(rng.uniform(0, 0.3, shape).astype(np.float32)), 2.0))
    tex = np.asarray(filters.gaussian_blur(jnp.asarray(rng.uniform(0.5, 1.0, (21, 21)).astype(np.float32)), 1.0))
    frames, centers = [], []
    for i in range(n):
        cy = start[0] + vel[0] * i
        cx = start[1] + vel[1] * i
        f = bg.copy()
        iy, ix = int(round(cy)) - 10, int(round(cx)) - 10
        f[iy : iy + 21, ix : ix + 21] = tex
        frames.append(f)
        centers.append((cy, cx))
    return frames, centers


class TestMosse:
    def test_follows_target(self):
        frames, centers = _target_sequence()
        st = correlation.mosse_init(jnp.asarray(frames[0]), centers[0], size=(64, 64))
        for i in range(1, len(frames)):
            st, psr = correlation.mosse_update(st, jnp.asarray(frames[i]))
            err = np.linalg.norm(np.asarray(st.center) - np.asarray(centers[i]))
            assert err < 2.5, f"frame {i}: err {err}"
        assert float(psr) > 5.0  # confident lock

    def test_psr_drops_when_target_vanishes(self):
        frames, centers = _target_sequence(n=4)
        st = correlation.mosse_init(jnp.asarray(frames[0]), centers[0], size=(64, 64))
        st, psr_good = correlation.mosse_update(st, jnp.asarray(frames[1]))
        blank = jnp.zeros_like(jnp.asarray(frames[0]))
        _, psr_bad = correlation.mosse_update(st, blank)
        assert float(psr_bad) < float(psr_good)


class TestKcf:
    def test_follows_target(self):
        frames, centers = _target_sequence(vel=(1.5, -2.0), start=(70.0, 80.0), seed=5)
        st = correlation.kcf_init(jnp.asarray(frames[0]), centers[0], size=(64, 64))
        for i in range(1, len(frames)):
            st, peak = correlation.kcf_update(st, jnp.asarray(frames[i]))
            err = np.linalg.norm(np.asarray(st.center) - np.asarray(centers[i]))
            assert err < 2.5, f"frame {i}: err {err}"


class TestKalman:
    def test_linear_constant_velocity(self, rng):
        dt = 1.0
        F = jnp.asarray(np.array([[1, 0, dt, 0], [0, 1, 0, dt], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32))
        Hm = jnp.asarray(np.array([[1, 0, 0, 0], [0, 1, 0, 0]], np.float32))
        Q = 1e-4 * jnp.eye(4)
        R = 0.04 * jnp.eye(2)
        x_true = np.array([0.0, 0.0, 1.0, 0.5])
        st = kalman.KalmanState(jnp.zeros(4), jnp.eye(4))
        for k in range(30):
            x_true = np.asarray(F) @ x_true
            z = x_true[:2] + rng.normal(scale=0.2, size=2)
            st = kalman.kf_predict(st, F, Q)
            st = kalman.kf_correct(st, jnp.asarray(z, jnp.float32), Hm, R)
        np.testing.assert_allclose(np.asarray(st.x[2:]), [1.0, 0.5], atol=0.1)

    def test_ukf_nonlinear_range_bearing(self, rng):
        # state: (px, py, vx, vy); measurement: (range, bearing)
        dt = 0.1

        def f(x):
            return jnp.array([x[0] + dt * x[2], x[1] + dt * x[3], x[2], x[3]])

        def h(x):
            return jnp.array([jnp.sqrt(x[0] ** 2 + x[1] ** 2), jnp.arctan2(x[1], x[0])])

        Q = 1e-5 * jnp.eye(4)
        R = jnp.diag(jnp.array([0.01, 1e-4]))
        x_true = np.array([2.0, 1.0, 0.5, -0.2])
        st = kalman.KalmanState(jnp.array([1.5, 1.5, 0.0, 0.0]), 0.5 * jnp.eye(4))
        for k in range(60):
            x_true = np.array([x_true[0] + dt * x_true[2], x_true[1] + dt * x_true[3], x_true[2], x_true[3]])
            z = np.array([
                np.hypot(x_true[0], x_true[1]) + rng.normal(scale=0.05),
                np.arctan2(x_true[1], x_true[0]) + rng.normal(scale=0.005),
            ])
            st = kalman.ukf_predict(st, f, Q)
            st = kalman.ukf_correct(st, jnp.asarray(z, jnp.float32), h, R)
        np.testing.assert_allclose(np.asarray(st.x[:2]), x_true[:2], atol=0.15)


class TestCsrt:
    def test_follows_target(self):
        from opencv_contrib_tpu.tracking import csrt

        frames, centers = _target_sequence(vel=(2.0, 2.5), seed=3)
        st = csrt.csrt_init(jnp.asarray(frames[0]), centers[0], target_hw=(21, 21))
        for i in range(1, len(frames)):
            st, peak = csrt.csrt_update(st, jnp.asarray(frames[i]))
            err = np.linalg.norm(np.asarray(st.center) - np.asarray(centers[i]))
            assert err < 3.0, f"frame {i}: err {err}"

    def test_spatial_reliability_masks_background(self):
        from opencv_contrib_tpu.tracking import csrt

        frames, centers = _target_sequence(n=1)
        patch = np.asarray(frames[0])[8:72, 8:72]
        m = np.asarray(csrt._spatial_reliability(jnp.asarray(patch), (21, 21), (64, 64)))
        assert m.shape == (64, 64)
        assert m.max() <= 1.0 + 1e-5 and m.min() >= 0.0
        # corners (pure background) must carry no weight
        assert m[0, 0] == 0.0 and m[-1, -1] == 0.0


class TestMedianFlow:
    def test_follows_target(self):
        from opencv_contrib_tpu.tracking import medianflow

        frames, centers = _target_sequence(vel=(2.0, 3.0), seed=7)
        box = medianflow.Box(jnp.asarray(centers[0], jnp.float32), jnp.asarray([20.0, 20.0]))
        for i in range(1, len(frames)):
            box, ok = medianflow.medianflow_update(box, jnp.asarray(frames[i - 1]), jnp.asarray(frames[i]))
            assert bool(ok), f"lost at frame {i}"
            err = np.linalg.norm(np.asarray(box.center) - np.asarray(centers[i]))
            assert err < 2.5, f"frame {i}: err {err}"

    def test_masked_median(self):
        from opencv_contrib_tpu.tracking.medianflow import _masked_median

        x = jnp.asarray([5.0, 1.0, 9.0, 3.0])
        m = jnp.asarray([True, True, False, True])
        assert float(_masked_median(x, m)) == 3.0
        assert float(_masked_median(x, jnp.zeros(4, bool))) == 0.0


class TestMil:
    def test_follows_target(self):
        from opencv_contrib_tpu.tracking import mil

        frames, centers = _target_sequence(vel=(2.0, 2.0), seed=11)
        key = jax.random.PRNGKey(0)
        bank = mil.make_feature_bank(key, patch=32, n_features=120)
        st = mil.mil_init(jnp.asarray(frames[0]), centers[0], key, bank)
        for i in range(1, len(frames)):
            key, k = jax.random.split(key)
            st, score = mil.mil_update(st, jnp.asarray(frames[i]), k, bank)
            err = np.linalg.norm(np.asarray(st.center) - np.asarray(centers[i]))
        # MIL is a detector-style tracker: require final lock within a few px
        assert err < 6.0, f"final err {err}"


class TestTld:
    def test_tracks_and_relocalizes(self):
        from opencv_contrib_tpu.tracking import tld

        frames, centers = _target_sequence(n=8, vel=(2.0, 2.0), seed=13)
        key = jax.random.PRNGKey(1)
        bank = tld.fern_bank(key)
        st = tld.tld_init(jnp.asarray(frames[0]), centers[0], (21.0, 21.0), key)
        for i in range(1, len(frames)):
            st, conf = tld.tld_update(st, jnp.asarray(frames[i - 1]), jnp.asarray(frames[i]), bank)
            err = np.linalg.norm(np.asarray(st.box.center) - np.asarray(centers[i]))
            assert err < 4.0, f"frame {i}: err {err}"
        assert float(conf) > 0.5


class TestKuhnMunkres:
    def test_optimal_assignment(self):
        from opencv_contrib_tpu.tracking.matching import kuhn_munkres

        cost = np.array([[4.0, 1.0, 3.0], [2.0, 0.0, 5.0], [3.0, 2.0, 2.0]])
        col = kuhn_munkres(cost)
        assert sorted(col.tolist()) == [0, 1, 2]
        total = cost[np.arange(3), col].sum()
        # brute force optimum
        import itertools

        best = min(sum(cost[i, p[i]] for i in range(3)) for p in itertools.permutations(range(3)))
        assert total == best

    def test_rectangular_both_ways(self):
        from opencv_contrib_tpu.tracking.matching import kuhn_munkres

        rng = np.random.default_rng(0)
        import itertools

        for shape in [(3, 5), (5, 3), (4, 4)]:
            cost = rng.uniform(0, 10, shape)
            col = kuhn_munkres(cost)
            n, m = shape
            k = min(n, m)
            assigned = [(i, c) for i, c in enumerate(col) if c >= 0]
            assert len(assigned) == k
            assert len({c for _, c in assigned}) == k
            total = sum(cost[i, c] for i, c in assigned)
            # brute force optimum over the smaller side
            if n <= m:
                best = min(
                    sum(cost[i, p[i]] for i in range(n)) for p in itertools.permutations(range(m), n)
                )
            else:
                best = min(
                    sum(cost[p[j], j] for j in range(m)) for p in itertools.permutations(range(n), m)
                )
            assert abs(total - best) < 1e-9, shape


class TestTrackerByMatching:
    def test_track_continuity_and_spawn(self):
        from opencv_contrib_tpu.tracking.matching import TrackerByMatching

        trk = TrackerByMatching(max_cost=0.8)
        b0 = np.array([[10, 10, 30, 30], [50, 50, 70, 70]], np.float32)
        ids0 = {tid for tid, _ in trk.process(b0)}
        # both move slightly -> same ids
        b1 = b0 + 2.0
        out1 = trk.process(b1)
        ids1 = {tid for tid, _ in out1}
        assert ids1 == ids0
        # a new detection spawns a new track
        b2 = np.vstack([b1 + 2.0, [[100, 100, 120, 120]]]).astype(np.float32)
        out2 = trk.process(b2)
        assert len(out2) == 3

    def test_track_death(self):
        from opencv_contrib_tpu.tracking.matching import TrackerByMatching

        trk = TrackerByMatching(max_cost=0.8, max_misses=2)
        trk.process(np.array([[10, 10, 30, 30]], np.float32))
        for _ in range(4):
            out = trk.process(np.zeros((0, 4), np.float32))
        assert out == []


class TestDsstScale:
    """DSST scale estimation (trackerCSRT.cpp:131's scale module + the
    DSST scale pyramid): a zoom sequence where translation-only trackers
    keep the stale box and the scale-adaptive path holds IoU."""

    @staticmethod
    def _zoom_frames(rng, n=20, lo=24, hi=48, H=160, W=160):
        from PIL import Image
        tex = rng.uniform(0.2, 1.0, (64, 64)).astype(np.float32)
        sizes = np.linspace(lo, hi, n).astype(int)
        frames = []
        for sz in sizes:
            img = np.full((H, W), 0.1, np.float32)
            t = np.asarray(Image.fromarray((tex * 255).astype(np.uint8))
                           .resize((int(sz), int(sz)))) / 255.0
            y0, x0 = H // 2 - sz // 2, W // 2 - sz // 2
            img[y0:y0 + sz, x0:x0 + sz] = t
            frames.append(img)
        return frames, sizes

    @staticmethod
    def _iou(a, b):
        inter = min(a, b) ** 2
        return inter / (a * a + b * b - inter)

    def test_csrt_scale_holds_iou_on_zoom(self, rng):
        from opencv_contrib_tpu.tracking import dsst

        frames, sizes = self._zoom_frames(rng)
        st = dsst.csrt_scale_init(jnp.asarray(frames[0]), (80.0, 80.0),
                                  target_hw=(int(sizes[0]), int(sizes[0])))
        for f in frames[1:]:
            st, (c, box), _ = dsst.csrt_scale_update(st, jnp.asarray(f))
        est, true = float(box[0]), float(sizes[-1])
        assert self._iou(est, true) > 0.7
        # translation-only would keep the initial box: materially worse
        assert self._iou(est, true) > self._iou(float(sizes[0]), true) + 0.2
        assert abs(float(c[0]) - 80.0) < 4 and abs(float(c[1]) - 80.0) < 4

    def test_kcf_scale_holds_iou_on_zoom(self, rng):
        from opencv_contrib_tpu.tracking import dsst

        frames, sizes = self._zoom_frames(rng, lo=28, hi=48)
        st = dsst.kcf_scale_init(jnp.asarray(frames[0]), (80.0, 80.0),
                                 target_hw=(int(sizes[0]), int(sizes[0])))
        for f in frames[1:]:
            st, (c, box), _ = dsst.kcf_scale_update(st, jnp.asarray(f))
        est, true = float(box[0]), float(sizes[-1])
        assert self._iou(est, true) > 0.6

    def test_scale_stable_on_constant_size(self, rng):
        from opencv_contrib_tpu.tracking import dsst

        frames, sizes = self._zoom_frames(rng, lo=32, hi=32, n=12)
        st = dsst.csrt_scale_init(jnp.asarray(frames[0]), (80.0, 80.0),
                                  target_hw=(32, 32))
        for f in frames[1:]:
            st, (c, box), _ = dsst.csrt_scale_update(st, jnp.asarray(f))
        assert 0.85 < float(st.dsst.scale) < 1.18
