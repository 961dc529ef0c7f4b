"""Pallas pipeline/scan/pyramid primitives vs jnp references."""

import numpy as np
import jax.numpy as jnp

from opencv_contrib_tpu.ops.pallas import pipeline as pp


def test_grid_scan_matches_cumsum(rng):
    x = jnp.asarray(rng.normal(size=(64, 1000)).astype(np.float32))
    out = pp.grid_scan(x, tile=256)
    ref = jnp.cumsum(x, axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


def test_grid_scan_single_tile(rng):
    x = jnp.asarray(rng.normal(size=(16, 128)).astype(np.float32))
    out = pp.grid_scan(x, tile=512)
    np.testing.assert_allclose(np.asarray(out), np.asarray(jnp.cumsum(x, 1)),
                               rtol=1e-5, atol=1e-4)


def test_grid_pyrdown_matches_reference(rng):
    x = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32))
    out = pp.grid_pyrdown(x)
    assert out.shape == (32, 48)

    # reference: replicate-padded separable binomial blur + decimate
    xn = np.asarray(x)
    k = np.array([1, 4, 6, 4, 1], np.float64) / 16.0
    pad = np.pad(xn, 2, mode="edge")
    tmp = sum(k[i] * pad[i:i + 64, 2:-2] for i in range(5))
    ref = sum(k[i] * np.pad(tmp, ((0, 0), (2, 2)), mode="edge")[:, i:i + 96]
              for i in range(5))[::2, ::2]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_streamed_transform_elementwise(rng):
    x = jnp.asarray(rng.normal(size=(500, 256)).astype(np.float32))
    out = pp.streamed_transform(lambda a: jnp.tanh(a) * 2.0 + 0.25, x,
                                block=128)
    ref = jnp.tanh(x) * 2.0 + 0.25
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
