"""Synthetic scene generators for tests and benchmarks.

Parity with the reference's dominant test strategy (SURVEY.md §4.1):
- generate_scene: random 3D points seen by a ring of cameras
  (sfm/test/scene.h:38 generateScene equivalent).
- SDF-raymarched depth scenes for KinFu tests
  (rgbd/test/test_kinfu.cpp:36-171 Scene equivalent) live in
  utils/sdf_scene.py.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from opencv_contrib_tpu.core import camera as cam


class SyntheticScene(NamedTuple):
    points3d: np.ndarray  # (P, 3)
    Rs: np.ndarray  # (V, 3, 3) world->cam
    ts: np.ndarray  # (V, 3)
    K: np.ndarray  # (3, 3)
    intr: np.ndarray  # (9,)
    points2d: np.ndarray  # (V, P, 2) pixel observations
    visible: np.ndarray  # (V, P) bool


def generate_scene(
    n_views: int = 8,
    n_points: int = 200,
    seed: int = 0,
    image_size=(640, 480),
    radius: float = 4.0,
    noise_px: float = 0.0,
    distortion: bool = False,
) -> SyntheticScene:
    """Random cloud of points near the origin, cameras on a ring looking in.

    All observations are exact (plus optional Gaussian pixel noise), so exact
    solvers must reach ~1e-7 px reprojection (the reference's own gate,
    sfm/test/test_reconstruct.cpp:66).
    """
    rng = np.random.default_rng(seed)
    W, H = image_size
    f = 0.9 * W
    if distortion:
        intr = np.array([f, f, W / 2, H / 2, -0.1, 0.02, 0.0, 1e-3, -5e-4], np.float32)
    else:
        intr = np.array([f, f, W / 2, H / 2, 0, 0, 0, 0, 0], np.float32)
    K = np.array([[intr[0], 0, intr[2]], [0, intr[1], intr[3]], [0, 0, 1]], np.float32)

    pts = rng.uniform(-1.0, 1.0, size=(n_points, 3)).astype(np.float32)

    Rs, ts, obs, vis = [], [], [], []
    import jax.numpy as jnp

    for i in range(n_views):
        angle = 2.0 * np.pi * i / max(n_views, 1) * 0.5  # half ring
        eye = np.array(
            [radius * np.sin(angle), 0.4 * rng.standard_normal(), -radius * np.cos(angle)],
            np.float32,
        )
        target = rng.uniform(-0.2, 0.2, size=3).astype(np.float32)
        R, t = cam.look_at(jnp.asarray(eye), jnp.asarray(target))
        R = np.asarray(R)
        t = np.asarray(t)
        px, z = cam.project(jnp.asarray(intr), jnp.asarray(R), jnp.asarray(t), jnp.asarray(pts))
        px = np.asarray(px)
        z = np.asarray(z)
        v = (z > 0.1) & (px[:, 0] >= 0) & (px[:, 0] < W) & (px[:, 1] >= 0) & (px[:, 1] < H)
        if noise_px > 0:
            px = px + rng.normal(scale=noise_px, size=px.shape).astype(np.float32)
        Rs.append(R)
        ts.append(t)
        obs.append(px)
        vis.append(v)

    return SyntheticScene(
        points3d=pts,
        Rs=np.stack(Rs),
        ts=np.stack(ts),
        K=K,
        intr=intr,
        points2d=np.stack(obs).astype(np.float32),
        visible=np.stack(vis),
    )
