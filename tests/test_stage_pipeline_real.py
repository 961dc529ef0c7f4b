"""The REAL frontend chain through the pipeline-parallel stage executor
(VERDICT round-5 item 8): detect -> describe -> match as mesh stages with
the feed SHARDED over the pipeline axis, validated against sequential
execution on the virtual mesh."""

import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from opencv_contrib_tpu.parallel import stage_pipeline as sp


def _frames(n, hw=(64, 64), seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 1, hw).astype(np.float32)
    # blobs give the detector real structure
    yy, xx = np.mgrid[0:hw[0], 0:hw[1]]
    for _ in range(12):
        cy, cx = rng.uniform(8, hw[0] - 8), rng.uniform(8, hw[1] - 8)
        base += 0.8 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 8.0)
    base /= base.max()
    return [np.roll(base, (0, k), axis=(0, 1)) for k in range(n)]


@pytest.fixture(scope="module")
def mesh4():
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 virtual devices")
    return Mesh(np.array(devs[:4]), ("pp",))


@pytest.fixture(scope="module")
def chain():
    from opencv_contrib_tpu.features import describe as fdesc
    from opencv_contrib_tpu.features import detect as fdet

    ref = jnp.asarray(_frames(1, seed=3)[0])
    kp = fdet.fast_hessian(ref, max_keypoints=16, threshold=1e-4)
    ref_desc = fdesc.surf_describe(ref, kp)
    return sp.frontend_stages(ref_desc, kp.valid, img_hw=(64, 64), n_kp=16)


class TestRealChainPipeline:
    def test_matches_sequential_exactly(self, mesh4, chain):
        stages, pack, unpack, C = chain
        stages = stages + [sp.identity_stage]
        frames = _frames(6)
        items = jnp.stack([pack(f) for f in frames])
        out_pp = sp.pipeline_map_sharded(stages, items, mesh4)
        # sequential reference: same stage functions composed per item
        out_seq = items
        for s in stages:
            out_seq = jax.vmap(s)(out_seq)
        np.testing.assert_allclose(np.asarray(out_pp), np.asarray(out_seq),
                                   rtol=0, atol=0)

    def test_matches_are_meaningful(self, mesh4, chain):
        stages, pack, unpack, C = chain
        stages = stages + [sp.identity_stage]
        frames = _frames(4, seed=3)  # frame 0 == reference frame
        items = jnp.stack([pack(f) for f in frames])
        out = sp.pipeline_map_sharded(stages, items, mesh4)
        idx0, dist0 = unpack(out[0])
        # the reference frame matched against itself: several finite
        # self-matches at near-zero distance
        good = np.asarray(dist0) > -0.5  # -1 = no-match sentinel
        assert good.sum() >= 4, good.sum()
        assert float(np.asarray(dist0)[good].min()) < 1e-3

    def test_sharded_feed_layout(self, mesh4, chain):
        """The feed must be partitioned over pp, not replicated."""
        stages, pack, unpack, C = chain
        items = jnp.stack([pack(f) for f in _frames(8)])
        # the sharded entry interleaves and shards; verify round-trip via
        # the public API against the replicated variant
        out_a = sp.pipeline_map_sharded(stages + [sp.identity_stage],
                                        items, mesh4)
        out_b = sp.pipeline_map(stages + [sp.identity_stage], items, mesh4)
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                                   rtol=0, atol=0)

    def test_overlap_timing_row(self, mesh4, chain):
        """SCALING.md row: pipelined wall vs sequential wall on the
        virtual mesh (2-core host: this validates the schedule, not
        physical speedup)."""
        stages, pack, unpack, C = chain
        stages = stages + [sp.identity_stage]
        items = jnp.stack([pack(f) for f in _frames(8)])
        f_pp = jax.jit(lambda it: sp.pipeline_map_sharded(stages, it, mesh4))
        out = f_pp(items)
        jax.block_until_ready(out)
        t0 = time.time()
        jax.block_until_ready(f_pp(items))
        t_pp = time.time() - t0

        def seq(it):
            o = it
            for s in stages:
                o = jax.vmap(s)(o)
            return o

        f_seq = jax.jit(seq)
        jax.block_until_ready(f_seq(items))
        t0 = time.time()
        jax.block_until_ready(f_seq(items))
        t_seq = time.time() - t0
        print(f"\n[stage-pipeline] real-chain 8 items x 4 stages: "
              f"pipelined {t_pp*1e3:.1f} ms, sequential {t_seq*1e3:.1f} ms")
        assert np.isfinite(t_pp) and np.isfinite(t_seq)
