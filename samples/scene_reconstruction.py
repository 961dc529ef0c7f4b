"""Incremental SfM from images — the scene_reconstruction sample.

Parity: sfm/samples/scene_reconstruction.cpp (one-call reconstruction from
image paths). Given a directory of images it runs the full frontend
(detect -> describe -> match all pairs -> link tracks) and the incremental
pipeline; with no arguments it demonstrates on a synthetic scene.

Usage:
    python samples/scene_reconstruction.py [image_dir f cx cy] [out.ply]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opencv_contrib_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

import sys

import numpy as np
import jax
import jax.numpy as jnp


def reconstruct_from_images(image_paths, intr, max_keypoints=512):
    from opencv_contrib_tpu.features import detect, describe, match
    from opencv_contrib_tpu.sfm import tracks as trx, pipeline
    from opencv_contrib_tpu.utils import io

    imgs = [io.imread(p, gray=True) * 255.0 for p in image_paths]
    kps, descs, valids = [], [], []
    for im in imgs:
        k = detect.fast_hessian(jnp.asarray(im), max_keypoints=max_keypoints, threshold=40.0)
        d = describe.surf_describe(jnp.asarray(im), k)
        kps.append(k)
        descs.append(d)
        valids.append(k.valid)

    # match schedule: all pairs for small sets, BoW top-k pruning beyond
    # (sfm/pairing.py — the reference brute-forces all pairs,
    # nRobustViewMatching.cc:154, which is O(N^2) and infeasible at the
    # 5k-image BASELINE config)
    n = len(imgs)
    if n <= 12:
        pair_list = [(i, j) for i in range(n) for j in range(i + 1, n)]
    else:
        from opencv_contrib_tpu.sfm import pairing
        pair_list = pairing.select_pairs(
            np.stack([np.asarray(d) for d in descs]),
            np.stack([np.asarray(v) for v in valids]), k=8)
        print(f"BoW pruning: {len(pair_list)} pairs of {n*(n-1)//2}")

    matches = []
    for i, j in pair_list:
        m = match.ratio_test_match(descs[i], descs[j], valids[i], valids[j], ratio=0.8)
        sel = np.asarray(m.valid)
        matches.append((i, j, np.asarray(m.query_idx)[sel], np.asarray(m.train_idx)[sel]))

    kxy = [np.stack([np.asarray(k.x), np.asarray(k.y)], axis=1) for k in kps]
    t = trx.build_tracks(n, kxy, matches, min_length=2)
    print(f"{n} images, {t.n_tracks} tracks")
    rec = pipeline.reconstruct_incremental(t, intr, refine_intrinsics=True)
    print(f"registered {rec.registered.sum()}/{n} views, "
          f"{rec.has_point.sum()} points, reproj {rec.reprojection_rms(t):.3f} px")
    return rec, t


def demo_synthetic():
    from opencv_contrib_tpu.sfm import tracks as trx, pipeline
    from opencv_contrib_tpu.utils.synthetic import generate_scene

    scene = generate_scene(n_views=8, n_points=300, seed=1, noise_px=0.4)
    t = trx.TracksTensor(obs=scene.points2d, mask=scene.visible)
    rec = pipeline.reconstruct_incremental(t, scene.intr)
    print(f"synthetic: registered {rec.registered.sum()}/8 views, "
          f"reproj {rec.reprojection_rms(t):.3f} px")
    return rec


def save_ply(path, points, mask=None):
    pts = points if mask is None else points[mask]
    with open(path, "w") as f:
        f.write(f"ply\nformat ascii 1.0\nelement vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\nend_header\n")
        for p in pts:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")


if __name__ == "__main__":
    if len(sys.argv) >= 5:
        import glob, os

        paths = sorted(glob.glob(os.path.join(sys.argv[1], "*")))
        f, cx, cy = map(float, sys.argv[2:5])
        intr = np.array([f, f, cx, cy, 0, 0, 0, 0, 0], np.float32)
        rec, t = reconstruct_from_images(paths, intr)
        if len(sys.argv) > 5:
            save_ply(sys.argv[5], rec.points, rec.has_point)
    else:
        demo_synthetic()
