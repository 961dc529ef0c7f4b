"""Stage-parallel (pipeline-parallel) execution over a device mesh.

The PP-analog of SURVEY §2.2 P9: a detect -> describe -> match style stage
chain where each mesh device OWNS one stage and items flow device k ->
k+1 through `ppermute` each step — software pipelining with the classic
(T + S - 1)-step schedule, so S devices overlap S different items once the
pipeline fills (the cuda Stream/double-buffer overlap pattern, lifted to
the mesh).

Constraints (TPU-first): every stage maps a common padded pytree to the
same pytree structure/shapes (static shapes are what make the rotation a
single compiled step); stage selection on-device is a `lax.switch` on the
pipeline-axis index.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pipeline_map(stages, items: jnp.ndarray, mesh: Mesh, axis: str = "pp"):
    """Run `items` (T, ...) through the stage chain with device k running
    stages[k]. Returns (T, ...) fully-processed items.

    len(stages) must equal the mesh extent along `axis`. Wall-clock is
    (T + S - 1) pipeline steps instead of T * S sequential stage calls.
    """
    S = mesh.shape[axis]
    assert len(stages) == S, (len(stages), S)
    T = items.shape[0]
    n_steps = T + S - 1
    item_shape = items.shape[1:]

    # pad the feed so step t's dynamic_index is always in range
    feed = jnp.concatenate(
        [items, jnp.zeros((S,) + item_shape, items.dtype)], axis=0)

    def apply_stage(x):
        idx = jax.lax.axis_index(axis)
        return jax.lax.switch(idx, list(stages), x)

    perm = [(k, k + 1) for k in range(S - 1)]  # k -> k+1 (no wraparound)

    def shard_fn(feed_l):
        # feed_l: (T + S, ...) replicated on every device
        buf = jnp.zeros(item_shape, items.dtype)  # device-local in-flight item
        outs = jnp.zeros((n_steps,) + item_shape, items.dtype)

        def step(carry, t):
            buf, outs = carry
            idx = jax.lax.axis_index(axis)
            # stage 0 ingests item t; later stages use what arrived
            fresh = jax.lax.dynamic_index_in_dim(feed_l, t, keepdims=False)
            x = jnp.where(idx == 0, fresh, buf)
            y = apply_stage(x)
            # last device emits its result at slot t (item t - (S-1))
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(idx == S - 1, y, outs[t]), t, axis=0)
            # hand off to the next stage's device
            buf_next = jax.lax.ppermute(y, axis, perm)
            return (buf_next, outs), ()

        (buf, outs), _ = jax.lax.scan(step, (buf, outs), jnp.arange(n_steps))
        # keep only the filled-pipeline outputs: item i completes at step
        # i + S - 1
        return jax.lax.psum(outs, axis) / 1.0  # replicate the last device's rows

    from jax.experimental.shard_map import shard_map

    fn = shard_map(shard_fn, mesh=mesh, in_specs=P(),
                   out_specs=P(), check_rep=False)
    with mesh:
        outs = fn(feed)
    return outs[S - 1: S - 1 + T]
