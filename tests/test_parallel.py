"""Distributed-path tests on the 8-device virtual CPU mesh (SURVEY §4
pattern 5 — the multi-host-simulated strategy): sharded programs must agree
with their single-device references."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from opencv_contrib_tpu.ba import bundle
from opencv_contrib_tpu.parallel import mesh as mesh_mod
from opencv_contrib_tpu.parallel import dist_ba, ring_match
from opencv_contrib_tpu.utils.synthetic import generate_scene


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return mesh_mod.make_mesh(n_dp=2, n_sp=4)


def _problem(noise=0.02):
    scene = generate_scene(n_views=4, n_points=128, seed=2)
    rng = np.random.default_rng(0)
    pts = scene.points3d + rng.normal(scale=noise, size=scene.points3d.shape).astype(np.float32)
    return bundle.make_problem_from_scene(
        scene.Rs, scene.ts, pts, scene.intr, scene.points2d, scene.visible
    )


class TestMesh:
    def test_make_mesh_shape(self, mesh8):
        assert mesh8.shape == {"dp": 2, "sp": 4}

    def test_shard_placement(self, mesh8):
        x = jnp.zeros((8, 16))
        xs = mesh_mod.shard(mesh8, x, P("sp", None))
        # sharded over sp (4 shards), replicated over dp -> lives on all 8
        assert len(xs.sharding.device_set) == 8
        assert xs.sharding.spec == P("sp", None)


class TestDistBA:
    def test_sharded_matches_single_device(self, mesh8):
        p = _problem()
        res_single = bundle.bundle_adjust(p, n_iters=8)
        res_shard = dist_ba.bundle_adjust(p, mesh8, n_iters=8)
        # same math, different partitioning: costs must agree tightly
        np.testing.assert_allclose(
            float(res_shard.final_cost), float(res_single.final_cost), rtol=1e-3, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(res_shard.cameras), np.asarray(res_single.cameras), atol=5e-4
        )

    def test_sharded_converges(self, mesh8):
        p = _problem(noise=0.05)
        res = dist_ba.bundle_adjust(p, mesh8, n_iters=15)
        assert float(res.final_cost) < float(res.initial_cost) * 1e-2


class TestRingMatch:
    def test_ring_equals_reference(self, mesh8):
        rng = np.random.default_rng(1)
        N, K, D = 8, 32, 16  # 8 images over 4 sp shards -> blocks of 2
        descs = rng.normal(size=(N, K, D)).astype(np.float32)
        valids = rng.uniform(size=(N, K)) > 0.2
        idx_r, dist_r, ok_r = ring_match.ring_all_pairs_match(
            jnp.asarray(descs), jnp.asarray(valids), mesh8
        )
        idx_s, dist_s, ok_s = ring_match.all_pairs_match_reference(
            jnp.asarray(descs), jnp.asarray(valids)
        )
        np.testing.assert_array_equal(np.asarray(ok_r), np.asarray(ok_s))
        # where valid, the matched indices and distances agree
        m = np.asarray(ok_s)
        np.testing.assert_array_equal(np.asarray(idx_r)[m], np.asarray(idx_s)[m])
        np.testing.assert_allclose(np.asarray(dist_r)[m], np.asarray(dist_s)[m], rtol=1e-4, atol=1e-4)

    def test_self_matches_are_identity(self, mesh8):
        rng = np.random.default_rng(2)
        descs = rng.normal(size=(8, 16, 8)).astype(np.float32)
        valids = np.ones((8, 16), bool)
        idx, dist, ok = ring_match.ring_all_pairs_match(
            jnp.asarray(descs), jnp.asarray(valids), mesh8, ratio=1.1
        )
        for i in range(8):
            np.testing.assert_array_equal(np.asarray(idx)[i, i], np.arange(16))


class TestDistSfm:
    def test_batched_frontend_sharded(self, mesh8, rng):
        from opencv_contrib_tpu.parallel import dist_sfm
        from opencv_contrib_tpu.ops import filters

        imgs = np.stack([
            np.asarray(filters.gaussian_blur(jnp.asarray(rng.uniform(0, 255, (96, 128)).astype(np.float32)), 2.0))
            for _ in range(4)
        ])
        descs, xy, valid = dist_sfm.batched_frontend(jnp.asarray(imgs), mesh8, max_keypoints=64, threshold=1.0)
        assert descs.shape == (4, 64, 64)
        assert np.asarray(valid).sum() > 0
        # sharded over dp
        assert "dp" in str(descs.sharding.spec) or descs.sharding.spec[0] is not None

    def test_end_to_end_distributed_step(self, mesh8, rng):
        """Frontend -> ring matching -> sharded BA in sequence on the mesh."""
        from opencv_contrib_tpu.parallel import dist_sfm
        from opencv_contrib_tpu.ops import filters

        base = np.asarray(filters.gaussian_blur(jnp.asarray(rng.uniform(0, 255, (96, 128)).astype(np.float32)), 2.0)) * 3
        imgs = np.stack([np.roll(base, 3 * i, axis=1) for i in range(4)])
        descs, xy, valid = dist_sfm.batched_frontend(jnp.asarray(imgs), mesh8, max_keypoints=64, threshold=1.0)
        idx, dist, ok = dist_sfm.distributed_matching(descs, valid, mesh8)
        # neighboring shifted frames must match
        assert int(ok[0, 1].sum()) > 10
        # sharded BA on a synthetic problem closes the loop
        p = _problem()
        res = dist_sfm.distributed_bundle(p, mesh8, n_iters=8)
        assert float(res.final_cost) < float(res.initial_cost)

    def test_scaling_report_shape(self, mesh8):
        from opencv_contrib_tpu.parallel import dist_sfm

        rep = dist_sfm.scaling_report(_problem(), mesh8, n_iters=3, repeats=1)
        assert set(rep) == {"t_single_s", "t_sharded_s", "n_devices", "speedup", "efficiency"}
        assert rep["n_devices"] == 8


class TestCheckpoint:
    def test_pytree_roundtrip_npz(self, tmp_path):
        from opencv_contrib_tpu.parallel import checkpoint as cp

        tree = {"a": jnp.arange(12.0).reshape(3, 4), "b": {"c": jnp.ones(5)}}
        p = cp.save_pytree(str(tmp_path / "ck"), tree, use_orbax=False)
        like = jax.tree_util.tree_map(jnp.zeros_like, tree)
        out = cp.restore_pytree(p, like, use_orbax=False)
        np.testing.assert_allclose(np.asarray(out["a"]), np.arange(12).reshape(3, 4))
        np.testing.assert_allclose(np.asarray(out["b"]["c"]), 1.0)

    def test_orbax_roundtrip(self, tmp_path):
        from opencv_contrib_tpu.parallel import checkpoint as cp

        if not cp._HAS_ORBAX:
            import pytest

            pytest.skip("orbax not available")
        tree = {"vol": jnp.arange(8.0), "T": jnp.eye(4)}
        p = cp.save_pytree(str(tmp_path / "ck_orbax"), tree)
        like = jax.tree_util.tree_map(jnp.zeros_like, tree)
        out = cp.restore_pytree(p, like)
        np.testing.assert_allclose(np.asarray(out["vol"]), np.arange(8.0))


class TestSubmapShard:
    def test_sharded_gn_aligns_submaps(self):
        from opencv_contrib_tpu.core import se3
        from opencv_contrib_tpu.parallel import mesh as mesh_mod
        from opencv_contrib_tpu.parallel.submap_shard import optimize_submaps

        mesh = mesh_mod.make_mesh(n_dp=1, n_sp=8)
        rng = np.random.default_rng(0)
        S, M = 8, 32
        # ground truth submap poses
        T_true = [np.eye(4, dtype=np.float32)]
        for s in range(1, S):
            xi = 0.2 * rng.standard_normal(6).astype(np.float32)
            T_true.append(np.asarray(se3.exp_se3(jnp.asarray(xi))))
        T_true = np.stack(T_true)
        # boundary points shared between submap s and s-1 (ring topology)
        pts = rng.uniform(-1, 1, (S, M, 3)).astype(np.float32)
        nbr = np.asarray([(s - 1) % S for s in range(S)], np.int32)
        tgt = np.zeros_like(pts)
        for s in range(S):
            pw = pts[s] @ T_true[s, :3, :3].T + T_true[s, :3, 3]
            Tn = np.linalg.inv(T_true[nbr[s]])
            tgt[s] = pw @ Tn[:3, :3].T + Tn[:3, 3]
        w = np.ones((S, M), np.float32)
        # start from perturbed poses (submap 0 anchored at truth)
        T0 = T_true.copy()
        for s in range(1, S):
            xi = 0.05 * rng.standard_normal(6).astype(np.float32)
            T0[s] = np.asarray(se3.exp_se3(jnp.asarray(xi))) @ T0[s]

        out = np.asarray(optimize_submaps(
            jnp.asarray(T0), jnp.asarray(pts), jnp.asarray(tgt),
            jnp.asarray(nbr), jnp.asarray(w), mesh, n_iters=25))
        err0 = np.mean([np.linalg.norm(T0[s] - T_true[s]) for s in range(1, S)])
        err1 = np.mean([np.linalg.norm(out[s] - T_true[s]) for s in range(1, S)])
        assert err1 < 0.3 * err0, (err0, err1)


class TestStagePipeline:
    """Pipeline parallelism over the mesh (SURVEY P9 PP-analog): stages
    owned by devices, items handed off via ppermute."""

    def test_matches_sequential_composition(self):
        import jax
        from jax.sharding import Mesh
        from opencv_contrib_tpu.parallel import stage_pipeline

        devs = np.array(jax.devices()[:4])
        mesh = Mesh(devs, ("pp",))

        k = jnp.ones((3, 3)) / 9.0

        def blur(x):
            return jax.scipy.signal.convolve2d(x, k, mode="same")

        def grad(x):
            gy = jnp.diff(x, axis=0, append=x[-1:])
            gx = jnp.diff(x, axis=1, append=x[:, -1:])
            return jnp.sqrt(gy * gy + gx * gx)

        def norm(x):
            return (x - x.mean()) / (x.std() + 1e-6)

        def soft(x):
            return jax.nn.sigmoid(4.0 * x)

        stages = [blur, grad, norm, soft]
        rng = np.random.default_rng(0)
        items = jnp.asarray(rng.normal(size=(6, 32, 32)).astype(np.float32))
        out = stage_pipeline.pipeline_map(stages, items, mesh)
        ref = jnp.stack([soft(norm(grad(blur(items[i])))) for i in range(6)])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
