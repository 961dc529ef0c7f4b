"""End-to-end large-scale sequential SfM run on the real TPU.

The BASELINE row "distributed SfM, 5k images" as a WORKING SYSTEM rather
than a solver microbenchmark: generates a 5k-view synthetic sequence
(~5M observations), runs the full incremental driver
(sfm/pipeline_scale.reconstruct_sequential: robust-PnP registration,
pairwise triangulation, windowed sparse BA, final global sparse BA), and
reports keyframes/s + wall + accuracy. Results are recorded in PERF.md.

Usage: python scripts/sfm_scale_run.py [n_views] [slots]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opencv_contrib_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from opencv_contrib_tpu.sfm import pipeline_scale as ps  # noqa: E402
from opencv_contrib_tpu.utils import metrics  # noqa: E402
from opencv_contrib_tpu.utils.synthetic import generate_sequence_scene  # noqa: E402


def main():
    n_views = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    slots = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    # track_span/min_gap scale with n_views: a 5k-view orbit moves ~0.07
    # deg/view, so triangulation baselines need ~12+ view gaps
    span = max(24, n_views // 125)
    gap = max(3, span // 3)
    t0 = time.time()
    sc = generate_sequence_scene(
        n_views=n_views, slots_per_view=slots, track_span=span, seed=0,
        noise_px=0.3)
    t_gen = time.time() - t0
    n_obs = int(sc.ok.sum())
    print(f"scene: {n_views} views x {slots} slots, {sc.n_tracks} tracks, "
          f"{n_obs} obs ({t_gen:.1f}s)", flush=True)

    tr = ps.from_sequence_scene(sc)
    t0 = time.time()
    rec = ps.reconstruct_sequential(
        tr, sc.intr, window=24, ba_every=4, min_gap=gap,
        min_parallax_deg=0.4, final_global_iters=15, progress_every=250)
    wall = time.time() - t0

    n_reg = int(rec.registered.sum())
    reproj = rec.reprojection_mean_px(tr)
    c_est = np.einsum("vij,vi->vj", rec.Rs, -rec.ts)
    c_gt = np.einsum("vij,vi->vj", sc.Rs, -sc.ts)
    # ATE on the dominant segment (similarity-aligned)
    segs, counts = np.unique(rec.seg_of_view[rec.registered],
                             return_counts=True)
    main_seg = segs[np.argmax(counts)]
    m = rec.registered & (rec.seg_of_view == main_seg)
    ate = metrics.ate_rmse(c_est[m], c_gt[m])

    print(f"registered {n_reg}/{n_views} views "
          f"({rec.n_segments} segment(s)), "
          f"{int(rec.has_point.sum())}/{sc.n_tracks} points")
    print(f"wall {wall:.1f}s = {n_reg / wall:.2f} keyframes/s end-to-end")
    print(f"mean reprojection {reproj:.3f} px (gate 1.4), "
          f"ATE(main seg) {ate:.4f} (ring radius 4.0)")


if __name__ == "__main__":
    main()
