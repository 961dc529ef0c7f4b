"""Sparse-observation BA: parity with the dense-grid solver and scale
behavior (the Ceres-CRS-equivalent layout, bundle.cc:283-299)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu.ba import bundle, sparse
from opencv_contrib_tpu.utils.synthetic import generate_scene


@pytest.fixture
def noisy_problem():
    scene = generate_scene(n_views=8, n_points=256, seed=3)
    rng = np.random.default_rng(0)
    noisy_pts = scene.points3d + rng.normal(scale=0.02, size=(256, 3)).astype(np.float32)
    noisy_cams = np.asarray(scene.ts) + rng.normal(scale=0.01, size=(8, 3)).astype(np.float32)
    return bundle.make_problem_from_scene(
        scene.Rs, noisy_cams, noisy_pts, scene.intr, scene.points2d, scene.visible
    )


def test_sparse_matches_dense(noisy_problem):
    """Same problem through both layouts converges to the same cost."""
    dense = bundle.bundle_adjust(noisy_problem, n_iters=15)
    sp = sparse.from_dense(noisy_problem)
    res = sparse.bundle_adjust_sparse(sp, n_iters=15)
    assert float(res.final_cost) < float(res.initial_cost) * 1e-2
    # both solvers should reach the same basin (within 10%)
    assert float(res.final_cost) <= float(dense.final_cost) * 1.1 + 1e-3


def test_sparse_cost_equals_dense_cost(noisy_problem):
    sp = sparse.from_dense(noisy_problem)
    c_dense = bundle.cost(noisy_problem.cameras, noisy_problem.points,
                          noisy_problem.intr, noisy_problem.obs,
                          noisy_problem.mask)
    c_sp = sparse.sparse_cost(sp.cameras, sp.points, sp.intr, sp.obs_cam,
                              sp.obs_pt, sp.obs_uv, sp.obs_ok)
    np.testing.assert_allclose(float(c_sp), float(c_dense), rtol=1e-5)


def test_sparse_padding_rows_inert(noisy_problem):
    """Extra padding rows (obs_ok=False) must not change the result."""
    sp = sparse.from_dense(noisy_problem)
    n = sp.obs_cam.shape[0]
    pad = 512
    sp2 = sparse.SparseBAProblem(
        sp.cameras, sp.points, sp.intr,
        jnp.concatenate([sp.obs_cam, jnp.zeros(pad, jnp.int32)]),
        jnp.concatenate([sp.obs_pt, jnp.zeros(pad, jnp.int32)]),
        jnp.concatenate([sp.obs_uv, jnp.full((2, pad), 123.0, jnp.float32)], axis=1),
        jnp.concatenate([sp.obs_ok, jnp.zeros(pad, bool)]),
    )
    r1 = sparse.bundle_adjust_sparse(sp, n_iters=5)
    r2 = sparse.bundle_adjust_sparse(sp2, n_iters=5)
    np.testing.assert_allclose(np.asarray(r1.cameras), np.asarray(r2.cameras),
                               atol=1e-5)
    np.testing.assert_allclose(float(r1.final_cost), float(r2.final_cost),
                               rtol=1e-5)


def test_sparse_fixed_first_camera(noisy_problem):
    sp = sparse.from_dense(noisy_problem)
    res = sparse.bundle_adjust_sparse(sp, n_iters=5)
    np.testing.assert_allclose(np.asarray(res.cameras[0]),
                               np.asarray(sp.cameras[0]), atol=1e-7)


def test_sparse_moderate_scale_cpu():
    """Larger-than-dense-feasible shape on CPU: 64 cams x 4096 pts with
    ~8 obs/pt (the dense grid would be 64x4096x2x6 Jacobians; the flat
    list is 32k rows)."""
    rng = np.random.default_rng(1)
    C, P = 64, 4096
    obs_per_pt = 8
    scene = generate_scene(n_views=C, n_points=64, seed=2)  # poses only
    pts = rng.uniform(-1, 1, (P, 3)).astype(np.float32)
    cam_ids = np.stack([rng.choice(C, obs_per_pt, replace=False)
                        for _ in range(P)])  # (P, 8)
    obs_cam = cam_ids.reshape(-1).astype(np.int32)
    obs_pt = np.repeat(np.arange(P, dtype=np.int32), obs_per_pt)

    from opencv_contrib_tpu.ba.bundle import _project_obs
    from opencv_contrib_tpu.core import se3
    cams6 = np.concatenate([np.asarray(se3.log_so3(jnp.asarray(scene.Rs))),
                            np.asarray(scene.ts)], axis=1).astype(np.float32)
    uv = jax.vmap(lambda c, X: _project_obs(c, X, jnp.asarray(scene.intr)))(
        jnp.asarray(cams6)[obs_cam], jnp.asarray(pts)[obs_pt])
    obs_ok = np.ones(len(obs_cam), bool)

    noisy = pts + rng.normal(scale=0.01, size=pts.shape).astype(np.float32)
    prob = sparse.SparseBAProblem(
        jnp.asarray(cams6), jnp.asarray(noisy), jnp.asarray(scene.intr),
        jnp.asarray(obs_cam), jnp.asarray(obs_pt), uv.T,
        jnp.asarray(obs_ok))
    res = sparse.bundle_adjust_sparse(prob, n_iters=8, n_cg=20)
    assert float(res.final_cost) < float(res.initial_cost) * 1e-2
