"""Distributed bundle adjustment demo — the multi-chip scaling config.

Runs Schur BA on a synthetic scene with the observation grid sharded over a
(dp, sp) device mesh and reports per-iteration timing vs the single-device
solve. On CPU use XLA_FLAGS=--xla_force_host_platform_device_count=8 to
simulate 8 devices.

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python samples/distributed_ba_demo.py [n_views n_points]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opencv_contrib_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main(n_views=16, n_points=2048):
    from opencv_contrib_tpu.ba import bundle
    from opencv_contrib_tpu.parallel import mesh as mesh_mod, dist_ba
    from opencv_contrib_tpu.utils.synthetic import generate_scene

    scene = generate_scene(n_views=n_views, n_points=n_points, seed=0)
    rng = np.random.default_rng(0)
    pts = scene.points3d + rng.normal(scale=0.03, size=scene.points3d.shape).astype(np.float32)
    prob = bundle.make_problem_from_scene(
        scene.Rs, scene.ts, pts, scene.intr, scene.points2d, scene.visible
    )

    n_dev = len(jax.devices())
    print(f"{n_dev} devices: {jax.devices()[0].platform}")

    def run_single():
        res = bundle.bundle_adjust(prob, n_iters=10)
        res.final_cost.block_until_ready()
        return res

    t0 = time.perf_counter()
    res1 = run_single()
    compile_single = time.perf_counter() - t0
    t0 = time.perf_counter()
    res1 = run_single()
    t_single = time.perf_counter() - t0

    if n_dev >= 2:
        m = mesh_mod.make_mesh()
        print(f"mesh: {dict(m.shape)}")
        t0 = time.perf_counter()
        res2 = dist_ba.bundle_adjust(prob, m, n_iters=10)
        res2.final_cost.block_until_ready()
        compile_dist = time.perf_counter() - t0
        t0 = time.perf_counter()
        res2 = dist_ba.bundle_adjust(prob, m, n_iters=10)
        res2.final_cost.block_until_ready()
        t_dist = time.perf_counter() - t0
        print(f"single-device: {t_single:.3f}s  sharded: {t_dist:.3f}s  "
              f"(costs {float(res1.final_cost):.4f} / {float(res2.final_cost):.4f})")
    else:
        print(f"single-device: {t_single:.3f}s (cost {float(res1.final_cost):.4f})")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    main(*args)
