"""Parity tests for the Pallas grid-primitive library (cudev-layer twin):
each primitive vs its jnp reference, including non-divisible shapes."""

import numpy as np
import jax.numpy as jnp

from opencv_contrib_tpu.ops.pallas import grid as pg


def test_grid_transform_elementwise(rng):
    a = jnp.asarray(rng.normal(size=(300, 515)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(300, 515)).astype(np.float32))
    out = pg.grid_transform(lambda x, y: jnp.tanh(x) * y + 0.5, a, b,
                            tile=(128, 256))
    ref = jnp.tanh(a) * b + 0.5
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_grid_reduce_sum_min_max(rng):
    a = jnp.asarray(rng.normal(size=(200, 330)).astype(np.float32))
    s = pg.grid_reduce(lambda x: x * x, a, kind="sum", tile=(128, 128))
    np.testing.assert_allclose(float(s), float(jnp.sum(a * a)), rtol=1e-5)
    mn = pg.grid_reduce(lambda x: x, a, kind="min", tile=(64, 128))
    np.testing.assert_allclose(float(mn), float(jnp.min(a)), rtol=1e-6)
    mx = pg.grid_reduce(lambda x: x, a, kind="max", tile=(64, 128))
    np.testing.assert_allclose(float(mx), float(jnp.max(a)), rtol=1e-6)


def test_grid_reduce_vec_partial_sums(rng):
    a = jnp.asarray(rng.normal(size=(100, 257)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(100, 257)).astype(np.float32))

    def mapper(x, y, valid):
        x = jnp.where(valid, x, 0.0)
        y = jnp.where(valid, y, 0.0)
        return jnp.stack([jnp.sum(x * y), jnp.sum(x), jnp.sum(y * y)])

    out = pg.grid_reduce_vec(mapper, a, b, out_dim=3, tile=(64, 128))
    ref = np.array([float(jnp.sum(a * b)), float(jnp.sum(a)),
                    float(jnp.sum(b * b))])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=1e-4)


def test_grid_reduce_non_neutral_map(rng):
    """map_op whose value at the pad fill (0) is NOT the reduction-neutral
    element: padded cells must still not corrupt the result (ADVICE r3)."""
    a = jnp.asarray(rng.normal(size=(200, 330)).astype(np.float32))
    s = pg.grid_reduce(lambda x: jnp.exp(-x * x), a, kind="sum",
                       tile=(128, 128))
    np.testing.assert_allclose(float(s), float(jnp.sum(jnp.exp(-a * a))),
                               rtol=1e-5)
    mn = pg.grid_reduce(lambda x: x + 10.0, a, kind="min", tile=(64, 128))
    np.testing.assert_allclose(float(mn), float(jnp.min(a) + 10.0), rtol=1e-6)


def test_grid_reduce_vec_nonlinear_map(rng):
    """map_op with nonzero contribution at zero input: validity tile must
    gate padded cells out of the partial sums."""
    a = jnp.asarray(rng.normal(size=(100, 257)).astype(np.float32))

    def mapper(x, valid):
        v = jnp.where(valid, jnp.exp(-x * x), 0.0)
        return jnp.stack([jnp.sum(v), jnp.sum(jnp.where(valid, 1.0, 0.0))])

    out = pg.grid_reduce_vec(mapper, a, out_dim=2, tile=(64, 128))
    np.testing.assert_allclose(float(out[0]), float(jnp.sum(jnp.exp(-a * a))),
                               rtol=2e-5)
    assert int(out[1]) == 100 * 257


def test_grid_histogram(rng):
    a = jnp.asarray(rng.random((150, 210)).astype(np.float32))
    h = pg.grid_histogram(a, bins=16, vmin=0.0, vmax=1.0, tile=(64, 128))
    ref, _ = np.histogram(np.asarray(a), bins=16, range=(0.0, 1.0))
    np.testing.assert_array_equal(np.asarray(h).astype(np.int64), ref)


def test_integral_image_matches_cumsum(rng):
    a = jnp.asarray(rng.normal(size=(120, 300)).astype(np.float32))
    out = pg.integral_image(a, tile=(64, 128))
    ref = jnp.cumsum(jnp.cumsum(a.astype(jnp.float32), axis=1), axis=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)
