"""Point-cloud ICP (parity: surface_matching's standalone ICP,
icp.hpp:80 registerModelToScene — point-to-plane minimization with
nearest-neighbor correspondence, iteration pyramid via subsampling; this is
the reference's *unordered cloud* ICP, distinct from the projective KinFu
one).

TPU-first: NN correspondence is a brute-force distance matrix (matmul) +
argmin; each level is a fixed-iteration scan."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import se3


def _nearest(model_pts, scene_pts):
    d = (
        jnp.sum(model_pts * model_pts, axis=1)[:, None]
        + jnp.sum(scene_pts * scene_pts, axis=1)[None]
        - 2.0 * model_pts @ scene_pts.T
    )
    idx = jnp.argmin(d, axis=1)
    return idx, jnp.min(d, axis=1)


@partial(jax.jit, static_argnames=("iters",))
def _icp_level(T0, model_pts, scene_pts, scene_nrm, iters: int, dist_gate: float):
    def body(T, _):
        R, t = se3.mat_to_rt(T)
        mp = model_pts @ R.T + t
        idx, d2 = _nearest(mp, scene_pts)
        q = scene_pts[idx]
        n = scene_nrm[idx]
        w = (d2 < dist_gate * dist_gate).astype(jnp.float32)
        r = jnp.sum(n * (mp - q), axis=1)
        Jw = jnp.cross(mp, n)
        J = jnp.concatenate([Jw, n], axis=1) * w[:, None]
        A = J.T @ J
        b = -J.T @ (r * w)
        dx = jnp.linalg.solve(A + 1e-6 * jnp.eye(6), b)
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros(6))
        return se3.exp_se3(dx) @ T, jnp.sum(w * r * r) / jnp.maximum(jnp.sum(w), 1.0)

    T, errs = jax.lax.scan(body, T0, None, length=iters)
    return T, errs[-1]


def register_model_to_scene(
    model_pts,
    scene_pts,
    scene_normals,
    T_init=None,
    levels: int = 3,
    iters_per_level: int = 10,
    dist_gate: float = 0.5,
):
    """Refine T (model->scene) with coarse-to-fine subsampled point-to-plane
    ICP (registerModelToScene contract). Returns (T, residual)."""
    model_pts = jnp.asarray(model_pts, jnp.float32)
    scene_pts = jnp.asarray(scene_pts, jnp.float32)
    scene_normals = jnp.asarray(scene_normals, jnp.float32)
    T = jnp.eye(4) if T_init is None else jnp.asarray(T_init, jnp.float32)
    err = jnp.inf
    for l in reversed(range(levels)):
        step = 2**l
        T, err = _icp_level(
            T, model_pts[::step], scene_pts[::step], scene_normals[::step],
            iters=iters_per_level, dist_gate=dist_gate * (l + 1),
        )
    return T, float(err)
