"""Distributed Schur bundle adjustment over a device mesh.

Design (SURVEY §5.8 / §7): the Schur structure is exactly what distributes —
landmark blocks are owned by sp-shards (their 3x3 inverses are local), the
reduced camera system is a psum over track shards, and the small dense
camera solve is replicated. We express this with sharding annotations and
let XLA GSPMD place the collectives (psum on the S-matrix einsum
contractions over the track axis) — the "pick a mesh, annotate shardings,
let XLA insert collectives" recipe.

Sharding layout:
- obs/mask (C, T, 2): P("dp", "sp") — views over dp, tracks over sp
- points (T, 3): P("sp")
- cameras (C, 6): P("dp")
- intr (9,): replicated
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opencv_contrib_tpu.ba import bundle


def shard_problem(problem: bundle.BAProblem, mesh: Mesh) -> bundle.BAProblem:
    return bundle.BAProblem(
        cameras=jax.device_put(problem.cameras, NamedSharding(mesh, P("dp", None))),
        points=jax.device_put(problem.points, NamedSharding(mesh, P("sp", None))),
        intr=jax.device_put(problem.intr, NamedSharding(mesh, P())),
        obs=jax.device_put(problem.obs, NamedSharding(mesh, P("dp", "sp", None))),
        mask=jax.device_put(problem.mask, NamedSharding(mesh, P("dp", "sp"))),
    )


def bundle_adjust(problem: bundle.BAProblem, mesh: Mesh, **kwargs) -> bundle.BAResult:
    """Sharded BA: same contract as ba.bundle.bundle_adjust, executed with
    the observation grid partitioned over (dp, sp)."""
    sharded = shard_problem(problem, mesh)
    with mesh:
        return bundle.bundle_adjust(sharded, **kwargs)


# ---------------------------------------------------------------------------
# sparse-observation layout (ba.sparse) over the mesh: the 5k-image-scale
# path. The flat obs list is pure data parallelism — shard it over EVERY
# mesh axis; camera/point blocks are replicated and the bucket reductions
# become per-shard partials + psum under GSPMD.

def shard_sparse_problem(problem, mesh: Mesh):
    from opencv_contrib_tpu.ba import sparse

    axes = tuple(mesh.axis_names)
    obs_sh = NamedSharding(mesh, P(axes))
    rep = NamedSharding(mesh, P())
    return sparse.SparseBAProblem(
        cameras=jax.device_put(problem.cameras, rep),
        points=jax.device_put(problem.points, rep),
        intr=jax.device_put(problem.intr, rep),
        obs_cam=jax.device_put(problem.obs_cam, obs_sh),
        obs_pt=jax.device_put(problem.obs_pt, obs_sh),
        obs_uv=jax.device_put(problem.obs_uv,
                              NamedSharding(mesh, P(None, axes))),
        obs_ok=jax.device_put(problem.obs_ok, obs_sh),
    )


def bundle_adjust_sparse(problem, mesh: Mesh, buckets=None, **kwargs):
    """Sharded sparse-observation BA (ba.sparse.bundle_adjust_sparse
    contract). Buckets are built host-side once per sparsity pattern."""
    from opencv_contrib_tpu.ba import sparse

    if buckets is None:
        buckets = sparse.build_buckets(
            problem.obs_cam, problem.obs_pt, problem.obs_ok,
            problem.cameras.shape[0], problem.points.shape[0])
    sharded = shard_sparse_problem(problem, mesh)
    with mesh:
        return sparse.bundle_adjust_sparse(sharded, buckets=buckets, **kwargs)
