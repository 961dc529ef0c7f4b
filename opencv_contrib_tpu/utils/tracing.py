"""Tracing / profiling helpers.

Parity with the reference's CV_TRACE_FUNCTION / CV_INSTRUMENT_REGION macros
(SURVEY §5.1 — sprinkled through every hot path, e.g. rgbd/src/kinfu.cpp:235):
here the spans map onto jax.profiler traces so they show up in TensorBoard /
Perfetto, plus a lightweight wall-clock span collector for quick numbers.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

_SPANS: dict[str, list[float]] = defaultdict(list)


@contextlib.contextmanager
def trace_span(name: str):
    """CV_TRACE_FUNCTION analog: times the span on the host AND annotates the
    device trace (jax.profiler.TraceAnnotation)."""
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    _SPANS[name].append(time.perf_counter() - t0)


def span_stats() -> dict[str, dict]:
    out = {}
    for name, ts in _SPANS.items():
        out[name] = {
            "count": len(ts),
            "total_s": sum(ts),
            "mean_ms": 1e3 * sum(ts) / max(len(ts), 1),
            "max_ms": 1e3 * max(ts),
        }
    return out


def reset_spans():
    _SPANS.clear()


@contextlib.contextmanager
def profile_to(logdir: str):
    """Capture a device profile (jax.profiler.start_trace) for the span."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
