"""Pallas kernel parity tests (interpret mode on CPU — the dual-backend
pattern of SURVEY §4 pattern 4: kernel output must match the XLA reference)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu.ops.pallas import matching as pmatch
from opencv_contrib_tpu.features import match as xmatch


class TestFusedKnn:
    def test_matches_xla_reference(self, rng):
        q = jnp.asarray(rng.normal(size=(512, 128)).astype(np.float32))
        t = jnp.asarray(rng.normal(size=(1024, 128)).astype(np.float32))
        dist, idx = pmatch.knn2(q, t, tile_q=256, tile_t=512, interpret=True)
        d_ref = xmatch.l2_distance_matrix(q, t)
        neg, idx_ref = jax.lax.top_k(-d_ref, 2)
        np.testing.assert_allclose(np.asarray(dist[:, 0]), np.asarray(-neg[:, 0]), rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(dist[:, 1]), np.asarray(-neg[:, 1]), rtol=1e-4, atol=1e-3)
        # indices agree except where distances tie
        agree = np.asarray(idx) == np.asarray(idx_ref[:, 0])
        assert agree.mean() > 0.999

    def test_second_best_crosses_tiles(self, rng):
        # construct data where best and second-best live in different tiles
        q = jnp.asarray(rng.normal(size=(256, 32)).astype(np.float32))
        t = jnp.concatenate([q + 0.01, q + 0.02, jnp.asarray(rng.normal(size=(512, 32)), jnp.float32)])
        dist, idx = pmatch.knn2(q, t, tile_q=256, tile_t=256, interpret=True)
        # best must be row i (tile 0), second row i+256 (tile 1)
        np.testing.assert_array_equal(np.asarray(idx), np.arange(256))
        assert float(jnp.max(jnp.abs(dist[:, 1] - dist[:, 0]))) < 0.1

    def test_fused_ratio_match(self, rng):
        d = rng.normal(size=(256, 64)).astype(np.float32)
        qq = d + rng.normal(scale=0.01, size=d.shape).astype(np.float32)
        m = pmatch.ratio_test_match_fused(jnp.asarray(qq), jnp.asarray(d), interpret=True)
        v = np.asarray(m.valid)
        assert v.mean() > 0.9
        assert (np.asarray(m.train_idx)[v] == np.arange(256)[v]).all()
