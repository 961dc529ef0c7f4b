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


def pipeline_map_sharded(stages, items: jnp.ndarray, mesh: Mesh,
                         axis: str = "pp"):
    """pipeline_map with the feed SHARDED over the pipeline axis instead of
    replicated: device d owns items t with t % S == d (O(T/S) feed memory
    per device); stage 0 ingests item t through a one-item psum from its
    owner each step. Same (T + S - 1)-step schedule and outputs."""
    S = mesh.shape[axis]
    assert len(stages) == S, (len(stages), S)
    T = items.shape[0]
    n_steps = T + S - 1
    item_shape = items.shape[1:]
    Tl = -(-(T + S) // S)  # per-device feed slots (padded)

    # interleave: feed_il[s, j] = items[j * S + s]
    pad = jnp.zeros((Tl * S - T,) + item_shape, items.dtype)
    feed_il = jnp.concatenate([items, pad]).reshape(Tl, S, *item_shape)
    feed_il = jnp.swapaxes(feed_il, 0, 1)  # (S, Tl, ...)

    def apply_stage(x):
        idx = jax.lax.axis_index(axis)
        return jax.lax.switch(idx, list(stages), x)

    perm = [(k, k + 1) for k in range(S - 1)]

    def shard_fn(feed_l):
        # feed_l: (1, Tl, ...) — THIS device's round-robin feed slice
        buf = jnp.zeros(item_shape, items.dtype)
        outs = jnp.zeros((n_steps,) + item_shape, items.dtype)

        def step(carry, t):
            buf, outs = carry
            idx = jax.lax.axis_index(axis)
            owner = t % S
            mine = jax.lax.dynamic_index_in_dim(feed_l[0], t // S,
                                                keepdims=False)
            fresh = jax.lax.psum(
                jnp.where(idx == owner, mine, jnp.zeros_like(mine)), axis)
            x = jnp.where(idx == 0, fresh, buf)
            y = apply_stage(x)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(idx == S - 1, y, outs[t]), t, axis=0)
            buf_next = jax.lax.ppermute(y, axis, perm)
            return (buf_next, outs), ()

        (buf, outs), _ = jax.lax.scan(step, (buf, outs), jnp.arange(n_steps))
        return jax.lax.psum(outs, axis) / 1.0

    from jax.experimental.shard_map import shard_map

    fn = shard_map(shard_fn, mesh=mesh, in_specs=P(axis),
                   out_specs=P(), check_rep=False)
    with mesh:
        outs = fn(feed_il)
    return outs[S - 1: S - 1 + T]


# ---------------------------------------------------------------------------
# the real workload: detect -> describe -> match as pipeline stages

def frontend_stages(ref_desc: jnp.ndarray, ref_valid: jnp.ndarray,
                    img_hw=(64, 64), n_kp: int = 16,
                    threshold: float = 1e-4):
    """The actual feature-frontend chain (SURF-class detect -> describe ->
    ratio-test match against a reference frame) as pipeline stages over a
    flat f32 carrier buffer — the chain P9's PP-analog was built to
    overlap (SURVEY §2.2). Returns (stages, pack_image, unpack_matches,
    carrier_len); pad `stages` with `identity_stage` to the mesh extent.

    Carrier layout: [image HW | keypoints 6K (y,x,scale,angle,resp,valid)
    | descriptors K*D | matches 2K (train_idx, distance)].
    """
    from opencv_contrib_tpu.features import describe as fdesc
    from opencv_contrib_tpu.features import detect as fdet
    from opencv_contrib_tpu.features import match as fmatch
    from opencv_contrib_tpu.features.keypoints import Keypoints

    H, W = img_hw
    D = int(ref_desc.shape[1])
    o_img, o_kp = 0, H * W
    o_desc = o_kp + 6 * n_kp
    o_match = o_desc + n_kp * D
    C = o_match + 2 * n_kp

    def stage_detect(buf):
        img = jax.lax.dynamic_slice(buf, (o_img,), (H * W,)).reshape(H, W)
        kp = fdet.fast_hessian(img, max_keypoints=n_kp, threshold=threshold)
        flat = jnp.concatenate([kp.y, kp.x, kp.scale, kp.angle, kp.response,
                                kp.valid.astype(jnp.float32)])
        return jax.lax.dynamic_update_slice(buf, flat, (o_kp,))

    def stage_describe(buf):
        img = jax.lax.dynamic_slice(buf, (o_img,), (H * W,)).reshape(H, W)
        f = jax.lax.dynamic_slice(buf, (o_kp,), (6 * n_kp,)).reshape(6, n_kp)
        kp = Keypoints(y=f[0], x=f[1], scale=f[2], angle=f[3],
                       response=f[4], valid=f[5] > 0.5)
        desc = fdesc.surf_describe(img, kp)
        return jax.lax.dynamic_update_slice(buf, desc.reshape(-1), (o_desc,))

    def stage_match(buf):
        desc = jax.lax.dynamic_slice(
            buf, (o_desc,), (n_kp * D,)).reshape(n_kp, D)
        valid = jax.lax.dynamic_slice(buf, (o_kp + 5 * n_kp,), (n_kp,)) > 0.5
        m = fmatch.ratio_test_match(desc, ref_desc, q_valid=valid,
                                    t_valid=ref_valid, ratio=0.9)
        out = jnp.concatenate([m.train_idx.astype(jnp.float32),
                               jnp.where(jnp.isfinite(m.distance),
                                         m.distance, -1.0)])
        return jax.lax.dynamic_update_slice(buf, out, (o_match,))

    def pack_image(img):
        buf = jnp.zeros(C, jnp.float32)
        return buf.at[:H * W].set(jnp.asarray(img, jnp.float32).reshape(-1))

    def unpack_matches(buf):
        m = buf[o_match:o_match + 2 * n_kp]
        return m[:n_kp].astype(jnp.int32), m[n_kp:]

    return ([stage_detect, stage_describe, stage_match], pack_image,
            unpack_matches, C)


def identity_stage(buf):
    return buf
