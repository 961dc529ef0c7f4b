"""Headline benchmark. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Round-1 scaffold: benches the feature-matching kernel (big matmul + top-k),
the canonical "speed-of-light per chip" target from BASELINE.md.
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    n_query, n_train, dim = 8192, 8192, 128

    @jax.jit
    def match(q, t):
        # -2 q@t.T + |q|^2 + |t|^2, then top-2 for ratio test
        d = (
            -2.0 * jnp.dot(q, t.T, preferred_element_type=jnp.float32)
            + jnp.sum(q * q, axis=1, keepdims=True)
            + jnp.sum(t * t, axis=1)[None, :]
        )
        neg, idx = jax.lax.top_k(-d, 2)
        return neg, idx

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (n_query, dim), jnp.float32)
    t = jax.random.normal(key, (n_train, dim), jnp.float32)

    # warmup/compile
    match(q, t)[0].block_until_ready()

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = match(q, t)
    out[0].block_until_ready()
    dt = (time.perf_counter() - t0) / n_iter

    pairs_per_s = n_query * n_train / dt
    print(
        json.dumps(
            {
                "metric": "bf_knn_match_descriptor_pairs_per_s",
                "value": pairs_per_s,
                "unit": "pairs/s",
                "vs_baseline": 1.0,
            }
        )
    )


if __name__ == "__main__":
    main()
