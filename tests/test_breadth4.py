"""Breadth batch 4: signal, alphamat, tracing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu import signal as sig, alphamat
from opencv_contrib_tpu.utils import tracing


class TestSignal:
    def test_resample_preserves_sine(self):
        t = np.linspace(0, 4 * np.pi, 200, endpoint=False).astype(np.float32)
        x = np.sin(t)
        y = np.asarray(sig.resample_signal(jnp.asarray(x), 400))
        t2 = np.linspace(0, 4 * np.pi, 400, endpoint=False)
        np.testing.assert_allclose(y[10:-10], np.sin(t2)[10:-10], atol=0.02)

    def test_downsample(self):
        x = jnp.asarray(np.arange(100, dtype=np.float32))
        y = sig.resample_signal(x, 50)
        assert y.shape == (50,)
        assert abs(float(y[25]) - 50.5) < 2.0


class TestAlphamat:
    def test_two_region_matting(self):
        # bright foreground square on dark background; trimap leaves a band
        # of unknowns around the boundary
        img = np.full((48, 48), 0.1, np.float32)
        img[12:36, 12:36] = 0.9
        trimap = np.full((48, 48), 0.5, np.float32)
        trimap[:6] = trimap[-6:] = trimap[:, :6] = trimap[:, -6:] = 0.0
        trimap[20:28, 20:28] = 1.0
        alpha = np.asarray(alphamat.info_flow(jnp.asarray(img), jnp.asarray(trimap)))
        assert alpha[24, 24] > 0.95
        assert alpha[2, 2] < 0.05
        # unknown pixels inside the bright square resolve to foreground
        assert alpha[14, 14] > 0.7
        # unknown dark pixels resolve to background
        assert alpha[8, 24] < 0.3

    def test_known_pixels_pinned(self):
        img = jnp.asarray(np.random.default_rng(0).uniform(size=(24, 24)).astype(np.float32))
        trimap = np.full((24, 24), 0.5, np.float32)
        trimap[0] = 1.0
        trimap[-1] = 0.0
        alpha = np.asarray(alphamat.info_flow(img, jnp.asarray(trimap)))
        assert alpha[0].min() > 0.9
        assert alpha[-1].max() < 0.1


class TestTracing:
    def test_span_collection(self):
        tracing.reset_spans()
        with tracing.trace_span("unit-test-span"):
            jnp.ones((8, 8)).block_until_ready()
        stats = tracing.span_stats()
        assert "unit-test-span" in stats
        assert stats["unit-test-span"]["count"] == 1
        assert stats["unit-test-span"]["total_s"] > 0
        tracing.reset_spans()
        assert tracing.span_stats() == {}
