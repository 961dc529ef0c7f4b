"""Headline benchmark. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Benches the fused Pallas brute-force 2-NN matching kernel (the
"BF ratio-test matching at speed-of-light per chip" config from
BASELINE.md) on 8192x8192x128 descriptors. vs_baseline = speedup over the
naive XLA matmul + top_k formulation measured in the same run on the same
chip (the direct transcription of the reference's bf_knnmatch structure,
cudafeatures2d/src/cuda/bf_match.cu).
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

if not os.environ.get("OCV_TPU_NO_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("OCV_TPU_CACHE", "/root/repo/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# optional device profile capture (ROADMAP "jax.profiler trace capture in
# bench"): BENCH_PROFILE=/path/to/logdir wraps the timed section in a trace
_PROFILE_DIR = os.environ.get("BENCH_PROFILE")


def _bench(f, q, t, n=100, repeats=2):
    """lax.scan-chained timing: n serialized calls with a tiny non-zero
    feedback (so XLA can't collapse the chain), one compiled body, and a
    host transfer to force completion. n is large enough that the remote
    tunnel's fixed dispatch overhead (~25 ms) is negligible; min over
    repeats rejects tunnel jitter."""

    @jax.jit
    def chained(q, t):
        def body(qc, _):
            dist, idx = f(qc, t)
            return qc + 1e-12 * dist[:, :1], ()

        qf, _ = jax.lax.scan(body, q, None, length=n)
        return qf[0, 0]

    np.asarray(chained(q, t))  # compile + settle
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(chained(q, t))
        best = min(best, time.perf_counter() - t0)
    return best / n


def main():
    from opencv_contrib_tpu.ops.pallas import matching as pm
    from opencv_contrib_tpu.features import match as xm

    n_query, n_train, dim = 8192, 8192, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(n_query, dim)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(n_train, dim)).astype(np.float32))

    @jax.jit
    def xla_version(q, t):
        d = xm.l2_distance_matrix(q, t)
        neg, idx = jax.lax.top_k(-d, 2)
        return -neg, idx[:, 0]

    if _PROFILE_DIR:
        jax.profiler.start_trace(_PROFILE_DIR)
    t_pallas = _bench(pm.knn2, q, t)
    t_xla = _bench(xla_version, q, t)
    if _PROFILE_DIR:
        jax.profiler.stop_trace()

    pairs_per_s = n_query * n_train / t_pallas
    print(
        json.dumps(
            {
                "metric": "bf_knn_match_descriptor_pairs_per_s",
                "value": pairs_per_s,
                "unit": "pairs/s",
                "vs_baseline": t_xla / t_pallas,
            }
        )
    )


if __name__ == "__main__":
    main()
