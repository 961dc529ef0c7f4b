"""Scalable incremental SfM (sfm/pipeline_scale.py) + sparse-BA routing.

The reference's incremental driver (pipeline.cc:138-264) brute-forces a
full Ceres bundle per round; these tests gate the TPU-native scalable twin:
sequential registration + windowed sparse BA + final global sparse BA on
sequences the dense (V, T) grid could never hold, including the
VERDICT-mandated 1k+-view CPU reconstruction.
"""

import numpy as np
import pytest

from opencv_contrib_tpu.sfm import pipeline_scale as ps
from opencv_contrib_tpu.utils import metrics
from opencv_contrib_tpu.utils.synthetic import generate_sequence_scene


def _centers(Rs, ts):
    return np.einsum("vij,vi->vj", Rs, -ts)


class TestSequenceScene:
    def test_shapes_and_spans(self):
        sc = generate_sequence_scene(n_views=96, slots_per_view=48,
                                     track_span=10, seed=3)
        assert sc.tid.shape == (96, 48)
        assert sc.ok.sum(axis=1).mean() > 30  # slots mostly filled
        # span: tracks live for a bounded run of consecutive views
        lens = np.zeros(sc.n_tracks, np.int64)
        np.add.at(lens, sc.tid[sc.ok], 1)
        seen = lens[lens > 0]
        assert 4 <= seen.mean() <= 16

    def test_observations_project_exactly(self):
        sc = generate_sequence_scene(n_views=32, slots_per_view=32,
                                     track_span=8, seed=0, noise_px=0.0)
        v = 10
        m = sc.ok[v]
        X = sc.points3d[sc.tid[v][m]]
        Xc = X @ sc.Rs[v].T + sc.ts[v]
        px = np.stack([sc.intr[0] * Xc[:, 0] / Xc[:, 2] + sc.intr[2],
                       sc.intr[1] * Xc[:, 1] / Xc[:, 2] + sc.intr[3]], axis=1)
        assert np.abs(px - sc.uv[v][m]).max() < 1e-3


class TestSequentialPipeline:
    def test_small_sequence_reconstruction(self):
        sc = generate_sequence_scene(n_views=96, slots_per_view=48,
                                     track_span=10, seed=0, noise_px=0.3)
        tr = ps.from_sequence_scene(sc)
        rec = ps.reconstruct_sequential(tr, sc.intr, window=12, ba_every=3,
                                        min_gap=2)
        assert rec.registered.sum() >= 0.9 * 96
        assert rec.has_point.sum() >= 0.7 * sc.n_tracks
        # the reference's own pipeline gate (test_simple_pipeline.cpp:82)
        assert rec.reprojection_mean_px(tr) < 1.4
        reg = rec.registered & (rec.seg_of_view == rec.seg_of_view[0])
        ate = metrics.ate_rmse(_centers(rec.Rs, rec.ts)[reg],
                               _centers(sc.Rs, sc.ts)[reg])
        assert ate < 0.3  # camera ring radius is 4.0

    def test_noise_free_is_tight(self):
        sc = generate_sequence_scene(n_views=64, slots_per_view=48,
                                     track_span=10, seed=1, noise_px=0.0)
        tr = ps.from_sequence_scene(sc)
        rec = ps.reconstruct_sequential(tr, sc.intr, window=12, ba_every=3,
                                        min_gap=2)
        assert rec.registered.sum() == 64
        assert rec.reprojection_mean_px(tr) < 0.1

    def test_thousand_view_reconstruction(self):
        # the VERDICT round-5 done-criterion: a synthetic 1k+-view
        # reconstruction end-to-end on CPU through the windowed sparse-BA
        # schedule (no dense (V, T) structure anywhere)
        sc = generate_sequence_scene(n_views=1024, slots_per_view=48,
                                     track_span=16, seed=2, noise_px=0.3)
        tr = ps.from_sequence_scene(sc)
        rec = ps.reconstruct_sequential(tr, sc.intr, window=12, ba_every=4,
                                        min_gap=2, final_global_iters=8)
        assert rec.registered.sum() >= 0.9 * 1024
        assert rec.reprojection_mean_px(tr) < 1.4
        assert rec.has_point.sum() >= 0.6 * sc.n_tracks


class TestSparseRoutingInDenseDriver:
    def test_run_bundle_routes_through_sparse(self, monkeypatch):
        """Above the obs threshold the dense fixpoint driver must use
        ba.sparse and still hit its acceptance gates."""
        from opencv_contrib_tpu.sfm import pipeline as sfmp
        from opencv_contrib_tpu.sfm import tracks as trx
        from opencv_contrib_tpu.utils.synthetic import generate_scene

        calls = {"sparse": 0}
        orig = sfmp._run_bundle_sparse

        def spy(*a, **k):
            calls["sparse"] += 1
            return orig(*a, **k)

        monkeypatch.setattr(sfmp, "_run_bundle_sparse", spy)
        monkeypatch.setattr(sfmp, "SPARSE_BA_OBS_THRESHOLD", 100)

        scene = generate_scene(n_views=8, n_points=200, seed=0, noise_px=0.3)
        tr = trx.TracksTensor(obs=scene.points2d, mask=scene.visible)
        rec = sfmp.reconstruct_incremental(tr, scene.intr)
        assert calls["sparse"] > 0
        assert rec.reprojection_mean(tr) < 1.4
