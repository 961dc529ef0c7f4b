"""Persistent XLA compilation cache helper.

Remote-TPU (tunnel) compiles are slow (1-3 min for the fused KinFu tick);
the persistent cache makes second runs start in seconds. bench.py and the
samples call this at startup; override the location with OCV_TPU_CACHE or
disable with OCV_TPU_NO_CACHE=1.
"""

import os

import jax

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compile_cache(path: str | None = None):
    if os.environ.get("OCV_TPU_NO_CACHE"):
        return
    # TPU backends only: XLA:CPU AOT results bake in the compiling host's
    # machine features (avx512 sets, prefer-no-gather, ...), and reloading
    # them on a different host warns about — and can SIGILL on — the
    # mismatch. CPU compiles are fast anyway; cache only device programs.
    try:
        platform = jax.default_backend()
    except Exception:
        platform = "unknown"
    if platform == "cpu":
        return
    jax.config.update("jax_compilation_cache_dir",
                      path or os.environ.get("OCV_TPU_CACHE", _DEFAULT))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
