"""Acceptance runs on the reference's OWN sample data.

These are the reference's de-facto gates run against this framework:

- backyard_tracks.txt: the exact Blender track set behind the reference's
  pipeline test (sfm/test/test_simple_pipeline.cpp:48-87), same pinned
  keyframes (1, 30), same initial intrinsics (f=860.986572265625,
  pp=(400, 225), k1=-0.158, k2=0.131), same refinement set (focal + pp +
  k1 + k2), same metric (MEAN per-marker reprojection error,
  pipeline.cc:266-318), same threshold: <= 1.4 px (reference measures
  1.38894; this pipeline measures ~1.36).
- desktop_tracks.txt: the trajectory-estimation sample's track set
  (sfm/samples/trajectory_reconstruction.cpp, tutorial parameters
  f=1914, pp=(640, 360)); reconstruction quality pinned as a regression
  bound.

Both files are read from the reference checkout; tests skip if absent.
"""

import os

import numpy as np
import pytest

from opencv_contrib_tpu.core import camera as cam
from opencv_contrib_tpu.sfm import pipeline, tracks as trx

_DATA = "/root/reference/modules/sfm/samples/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_DATA), reason="reference sample data not available")


def test_backyard_tracks_pipeline_gate():
    """The reference's own 1.4 px pipeline acceptance gate."""
    t = trx.load_blender_tracks(os.path.join(_DATA, "backyard_tracks.txt"))
    assert t.n_views == 100
    assert t.mask.sum() > 2000
    f = 860.986572265625
    intr = np.asarray(cam.make_intrinsics(f, f, 400.0, 225.0,
                                          k1=-0.158, k2=0.131))
    rec = pipeline.reconstruct_incremental(
        t, intr, init_pair=(1, 30), refine_intrinsics=True)
    err = rec.reprojection_mean(t)
    # the reference's gate (test_simple_pipeline.cpp:82): EXPECT_LE(err, 1.4)
    assert err <= 1.4, f"mean reprojection {err:.4f} px > 1.4 px gate"
    # and the reconstruction must actually be complete, not a lucky subset
    assert rec.registered.sum() >= 90
    assert rec.has_point.sum() == t.n_tracks


def test_sceaux_castle_scene_reconstruction():
    """End-to-end SfM from the Sceaux Castle images (BASELINE row 1):
    Fast-Hessian + SURF frontend -> all-pairs ratio matching -> tracks ->
    incremental pipeline. Pinned regression: measured 0.36 px mean
    reprojection over 4/4 registered views and 400+ points (the
    reference's scene_reconstruction tutorial reports ~1.24 px on this
    dataset with libmv+Ceres)."""
    img_dir = os.path.join(_DATA, "images")
    paths = [os.path.join(img_dir, f"resized_IMG_{i}.jpg")
             for i in range(2889, 2893)]
    if not all(os.path.exists(p) for p in paths):
        pytest.skip("Sceaux Castle images not available")
    import sys
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)
    from samples.scene_reconstruction import reconstruct_from_images

    f = 19.0 / 22.3 * 718  # EXIF focal (Canon EOS 60D APS-C, 19 mm)
    intr = np.asarray(cam.make_intrinsics(f, f, 718 / 2, 480 / 2))
    rec, t = reconstruct_from_images(paths, intr, max_keypoints=1024)
    assert rec.registered.sum() == 4
    assert rec.has_point.sum() >= 300
    err = rec.reprojection_mean(t)
    assert err <= 1.24, f"mean reprojection {err:.3f} px > libmv tutorial baseline"
    # pinned at measured 0.36 px + margin
    assert err <= 0.6, f"mean reprojection {err:.3f} px regression (measured 0.36)"


def test_desktop_tracks_trajectory_regression():
    """Desktop (trajectory_reconstruction sample) track set, subsampled to
    every 8th frame for CPU runtime; measured reprojection pinned as a
    regression bound."""
    t_full = trx.load_blender_tracks(os.path.join(_DATA, "desktop_tracks.txt"))
    sub = np.arange(0, t_full.n_views, 8)
    t = trx.TracksTensor(obs=t_full.obs[sub], mask=t_full.mask[sub])
    # tutorial gives f=1914 pp=(640,360), but that focal is approximate for
    # this render: with intrinsics refinement the pipeline settles at
    # f~1679 and mean error 1.42 px (without refinement: 2.86 px)
    intr = np.asarray(cam.make_intrinsics(1914.0, 1914.0, 640.0, 360.0))
    rec = pipeline.reconstruct_incremental(
        t, intr, init_pair=(0, t.n_views - 1), refine_intrinsics=True)
    err = rec.reprojection_mean(t)
    assert rec.registered.sum() >= t.n_views - 2
    assert rec.has_point.sum() >= t.n_tracks - 3
    # pinned regression bound (measured 1.42 px)
    assert err <= 1.6, f"mean reprojection {err:.4f} px regression"
