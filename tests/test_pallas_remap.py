"""Pallas bounded-displacement remap (ops/pallas/remap.py) — the cudev
ptr2d remap/texture role. Parity against the XLA gather sampler."""

import numpy as np
import jax.numpy as jnp

from opencv_contrib_tpu.ops.pallas import remap as prm


def _field(hw, amp, seed=0):
    rng = np.random.default_rng(seed)
    H, W = hw
    g = rng.standard_normal((H // 16, W // 16)).astype(np.float32)
    import jax
    f = np.asarray(jax.image.resize(jnp.asarray(g), (H, W), "bilinear"))
    return (amp * f / max(np.abs(f).max(), 1e-6)).astype(np.float32)


class TestRemapParity:
    def test_matches_xla_sampler_interior(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 1, (96, 128)).astype(np.float32))
        dy = jnp.asarray(_field((96, 128), 3.0, 1))
        dx = jnp.asarray(_field((96, 128), 3.0, 2))
        out_p = np.asarray(prm.remap_bounded(img, dy, dx, max_disp=4))
        out_x = np.asarray(prm.remap_bounded_xla(img, dy, dx, max_disp=4))
        # interior parity is exact up to f32 accumulation order
        np.testing.assert_allclose(out_p[4:-5, 4:-5], out_x[4:-5, 4:-5],
                                   atol=2e-5)

    def test_zero_displacement_is_identity(self):
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(0, 1, (64, 128)).astype(np.float32))
        z = jnp.zeros((64, 128), jnp.float32)
        out = np.asarray(prm.remap_bounded(img, z, z, max_disp=2))
        np.testing.assert_allclose(out, np.asarray(img), atol=1e-6)

    def test_integer_shift(self):
        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.uniform(0, 1, (64, 128)).astype(np.float32))
        dy = jnp.full((64, 128), 2.0)
        dx = jnp.full((64, 128), -1.0)
        out = np.asarray(prm.remap_bounded(img, dy, dx, max_disp=3))
        ref = np.asarray(img)
        np.testing.assert_allclose(out[4:-4, 4:-4],
                                   ref[6:-2, 3:-5], atol=1e-6)

    def test_clamps_oversized_displacement(self):
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.uniform(0, 1, (64, 128)).astype(np.float32))
        dy = jnp.full((64, 128), 10.0)  # beyond max_disp=2 -> clamped
        out_p = np.asarray(prm.remap_bounded(img, dy, jnp.zeros_like(dy),
                                             max_disp=2))
        out_x = np.asarray(prm.remap_bounded_xla(img, dy, jnp.zeros_like(dy),
                                                 max_disp=2))
        np.testing.assert_allclose(out_p[2:-3], out_x[2:-3], atol=2e-5)

    def test_non_tile_aligned_height(self):
        rng = np.random.default_rng(4)
        img = jnp.asarray(rng.uniform(0, 1, (50, 128)).astype(np.float32))
        dy = jnp.asarray(_field((50, 128), 1.5, 5))
        dx = jnp.asarray(_field((50, 128), 1.5, 6))
        out_p = np.asarray(prm.remap_bounded(img, dy, dx, max_disp=2,
                                             tile_h=16))
        out_x = np.asarray(prm.remap_bounded_xla(img, dy, dx, max_disp=2))
        np.testing.assert_allclose(out_p[2:-3, 2:-3], out_x[2:-3, 2:-3],
                                   atol=2e-5)
