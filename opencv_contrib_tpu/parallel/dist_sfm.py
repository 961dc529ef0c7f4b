"""Distributed SfM building blocks composed: the BASELINE "distributed SfM"
config (5k images over N hosts) in miniature.

Pipeline step (one jitted program per stage, all device-resident):
  1. batched feature frontend over the dp axis (frames sharded),
  2. ring all-pairs matching over the sp axis (descriptor blocks ppermute),
  3. track counting + Schur BA with the observation grid sharded (dp x sp).

The host only sequences stages — the same split the single-host pipeline
uses, with shardings added (SURVEY §7 step 7).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opencv_contrib_tpu.ba import bundle
from opencv_contrib_tpu.parallel import dist_ba, ring_match


def batched_frontend(imgs: jnp.ndarray, mesh: Mesh, max_keypoints: int = 256, threshold: float = 10.0):
    """Detect+describe a batch of frames sharded over dp.

    imgs (N, H, W) with N divisible by the dp size. Returns
    (descs (N, K, D), xy (N, K, 2), valid (N, K)) sharded over dp.
    """
    from opencv_contrib_tpu.features import detect, describe

    imgs = jax.device_put(imgs, NamedSharding(mesh, P("dp", None, None)))

    @jax.jit
    def one(img):
        k = detect.fast_hessian(img, max_keypoints=max_keypoints, threshold=threshold, n_octaves=2)
        d = describe.surf_describe(img, k)
        return d, k.xy(), k.valid

    with mesh:
        descs, xy, valid = jax.vmap(one)(imgs)
    return descs, xy, valid


def distributed_matching(descs, valids, mesh: Mesh, ratio: float = 0.8):
    """Ring all-pairs matching (descriptor blocks over sp)."""
    with mesh:
        return ring_match.ring_all_pairs_match(descs, valids, mesh, ratio=ratio)


def distributed_bundle(problem: bundle.BAProblem, mesh: Mesh, **kw) -> bundle.BAResult:
    return dist_ba.bundle_adjust(problem, mesh, **kw)


def scaling_report(problem: bundle.BAProblem, mesh: Mesh, n_iters: int = 10, repeats: int = 3):
    """Timing comparison single-device vs sharded BA — the scaling-efficiency
    measurement harness (BASELINE: >= 0.7 efficiency 1 host -> N)."""
    import time

    def run_single():
        r = bundle.bundle_adjust(problem, n_iters=n_iters)
        r.final_cost.block_until_ready()
        return r

    def run_sharded():
        r = dist_ba.bundle_adjust(problem, mesh, n_iters=n_iters)
        r.final_cost.block_until_ready()
        return r

    run_single()
    run_sharded()  # compile both
    t_s = min(_time(run_single) for _ in range(repeats))
    t_d = min(_time(run_sharded) for _ in range(repeats))
    n_dev = mesh.devices.size
    return {
        "t_single_s": t_s,
        "t_sharded_s": t_d,
        "n_devices": int(n_dev),
        "speedup": t_s / t_d,
        "efficiency": (t_s / t_d) / n_dev,
    }


def _time(f):
    import time

    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0
