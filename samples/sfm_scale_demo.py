"""Large-scale sequential SfM demo — the 5k-image pipeline in miniature.

Parity role: the reference's scene_reconstruction sample at the scale its
incremental driver (pipeline.cc:138-264 + full Ceres bundles) cannot
reach. Runs the scalable driver (sfm/pipeline_scale.py: chunked
device-resident registration, windowed sparse BA, growth-triggered global
re-bundles, bundle<->re-intersect fixpoint) on a synthetic orbit sequence
and reports registration, reprojection against the reference's own 1.4 px
gate, and similarity-aligned ATE.

Usage:
    python samples/sfm_scale_demo.py [n_views] [slots_per_view]

Defaults (256 views x 128 slots) run in ~1 min on CPU; on the TPU,
`scripts/sfm_scale_run.py` drives the full 5000-view configuration.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opencv_contrib_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

import numpy as np


def main():
    n_views = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    slots = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    from opencv_contrib_tpu.sfm import pipeline_scale as ps
    from opencv_contrib_tpu.utils import metrics
    from opencv_contrib_tpu.utils.synthetic import generate_sequence_scene

    span = max(12, n_views // 125)
    sc = generate_sequence_scene(n_views=n_views, slots_per_view=slots,
                                 track_span=span, seed=0, noise_px=0.3)
    tracks = ps.from_sequence_scene(sc)
    print(f"sequence: {n_views} views x {slots} slots, {sc.n_tracks} "
          f"tracks, {int(sc.ok.sum())} observations")

    t0 = time.time()
    rec = ps.reconstruct_sequential(
        tracks, sc.intr, window=16, ba_every=4, min_gap=max(2, span // 3),
        min_parallax_deg=0.4, final_global_iters=12)
    wall = time.time() - t0

    n_reg = int(rec.registered.sum())
    reproj = rec.reprojection_mean_px(tracks)
    c_est = np.einsum("vij,vi->vj", rec.Rs, -rec.ts)
    c_gt = np.einsum("vij,vi->vj", sc.Rs, -sc.ts)
    m = rec.registered
    ate = metrics.ate_rmse(c_est[m], c_gt[m])
    print(f"registered {n_reg}/{n_views} views "
          f"({rec.n_segments} segment(s)), "
          f"{int(rec.has_point.sum())}/{sc.n_tracks} points")
    print(f"wall {wall:.1f}s = {n_reg / wall:.2f} keyframes/s")
    print(f"mean reprojection {reproj:.3f} px (reference gate: 1.4)")
    print(f"ATE (similarity-aligned) {ate:.4f} on a radius-4 orbit")


if __name__ == "__main__":
    main()
