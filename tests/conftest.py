"""Test configuration: run everything on an 8-device virtual CPU mesh.

Mirrors the reference's backend-parity test strategy (SURVEY.md §4 pattern 4):
every kernel runs on the CPU backend here; multi-chip sharding is validated on
the virtual 8-device mesh (the driver separately dry-runs the multichip path
and benches on real TPU).

Note: this environment pre-imports jax and registers the TPU ('axon') backend
via sitecustomize, so env-var-only selection is too late — we force the
platform through jax.config, which still works post-import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# OCV_TPU_SCALE=1 runs tests/test_scale_tpu.py against the real chip —
# everything else stays on the forced-CPU virtual mesh
if not os.environ.get("OCV_TPU_SCALE"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches():
    """Full-suite runs (~400 jit compilations in one process) have
    segfaulted inside XLA:CPU's backend_compile after enough accumulated
    executables; dropping compiled-program caches between modules keeps the
    compiler state bounded. Costs a little recompilation per module."""
    yield
    jax.clear_caches()
