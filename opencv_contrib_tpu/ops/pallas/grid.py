"""Pallas grid-primitive library — the cudev layer of this framework.

Reference: modules/cudev is a header-only CUDA EDSL of reusable grid
primitives (cudev/include/opencv2/cudev/grid/{transform,reduce,integral,
histogram}.hpp plus block/warp reduce+scan in cudev/block/reduce.hpp,
cudev/warp/{reduce,scan}.hpp) that the cuda* op modules compose into
kernels. This module plays the same role for Pallas/TPU: tiled map /
reduce / histogram / two-pass integral over VMEM blocks, each taking a
plain jnp-traceable function and handling the grid/BlockSpec plumbing.

Design notes (pallas_guide): tiles default to (256, 256) — multiples of
the (8, 128) f32 VMEM layout; reductions accumulate in a VMEM scratch
accumulator across sequential grid steps (TPU grids execute in order, so
`when(first)`-init + `when(last)`-emit is the idiomatic cross-tile
reduction); the integral image is the classic two-pass separable scan
(row cumsum, then column cumsum) — each pass one kernel with a carried
prefix, mirroring how cudev's grid_integral stages rows then columns.

XLA already fuses elementwise chains well, so grid_transform exists mainly
to fuse *into* custom kernels and as the parity-tested building block; the
wins come from grid_reduce/grid_histogram avoiding HBM round-trips between
map and reduce stages.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _pad2(x, th, tw, fill=0.0):
    H, W = x.shape
    ph, pw = (-H) % th, (-W) % tw
    if ph or pw:
        x = jnp.pad(x, ((0, ph), (0, pw)), constant_values=fill)
    return x


# ---------------------------------------------------------------------------
# grid_transform (cudev/grid/transform.hpp)

def grid_transform(op: Callable, *arrays: jnp.ndarray,
                   tile=(256, 256), interpret=None) -> jnp.ndarray:
    """Tiled elementwise map: out[i,j] = op(a0[i,j], a1[i,j], ...).

    All inputs share one 2D shape; op is any jnp-traceable elementwise
    function (may broadcast internally). Output dtype follows op.
    """
    if interpret is None:
        interpret = not _on_tpu()
    H, W = arrays[0].shape
    th, tw = min(tile[0], H), min(tile[1], W)
    padded = [_pad2(a, th, tw) for a in arrays]
    Hp, Wp = padded[0].shape

    out_dtype = jax.eval_shape(op, *(jax.ShapeDtypeStruct((1, 1), a.dtype)
                                     for a in arrays)).dtype

    def kernel(*refs):
        ins, out = refs[:-1], refs[-1]
        out[:] = op(*(r[:] for r in ins))

    res = pl.pallas_call(
        kernel,
        grid=(Hp // th, Wp // tw),
        in_specs=[pl.BlockSpec((th, tw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM) for _ in padded],
        out_specs=pl.BlockSpec((th, tw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), out_dtype),
        interpret=interpret,
    )(*padded)
    return res[:H, :W]


# ---------------------------------------------------------------------------
# grid_reduce (cudev/grid/reduce.hpp: gridCalcSum/MinVal/MaxVal)

def grid_reduce(map_op: Callable, *arrays: jnp.ndarray, kind: str = "sum",
                tile=(256, 256), fill=None, interpret=None) -> jnp.ndarray:
    """Fused map+reduce to a scalar: reduce(map_op(a0, a1, ...)).

    kind: 'sum' | 'min' | 'max'. The map output never round-trips HBM —
    each grid step reduces its VMEM tile and folds into a scratch
    accumulator (sequential TPU grid), emitted on the last step.
    """
    if interpret is None:
        interpret = not _on_tpu()
    H, W = arrays[0].shape
    th, tw = min(tile[0], H), min(tile[1], W)
    neutral = {"sum": 0.0, "min": jnp.inf, "max": -jnp.inf}[kind]
    fold = {"sum": jnp.add, "min": jnp.minimum, "max": jnp.maximum}[kind]
    red = {"sum": jnp.sum, "min": jnp.min, "max": jnp.max}[kind]
    if fill is None:
        fill = neutral
    padded = [_pad2(a, th, tw, fill if k == 0 else 0.0)
              for k, a in enumerate(arrays)]
    Hp, Wp = padded[0].shape
    ni, nj = Hp // th, Wp // tw

    def kernel(*refs):
        ins, out, acc = refs[:-2], refs[-2], refs[-1]
        i, j = pl.program_id(0), pl.program_id(1)
        first = (i == 0) & (j == 0)
        last = (i == ni - 1) & (j == nj - 1)
        mapped = map_op(*(r[:] for r in ins))
        # mask padded cells with the neutral element: map_op(fill) need not
        # be neutral (e.g. exp(-x*x) with sum), so validity is derived from
        # the tile's absolute coordinates vs the unpadded extent
        rows = i * th + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
        cols = j * tw + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
        valid = (rows < H) & (cols < W)
        val = red(jnp.where(valid, mapped, jnp.asarray(neutral, mapped.dtype)))

        @pl.when(first)
        def _init():
            acc[0] = jnp.float32(neutral)

        acc[0] = fold(acc[0], val.astype(jnp.float32))

        @pl.when(last)
        def _emit():
            out[0] = acc[0]

    res = pl.pallas_call(
        kernel,
        grid=(ni, nj),
        in_specs=[pl.BlockSpec((th, tw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM) for _ in padded],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        interpret=interpret,
    )(*padded)
    return res[0]


# ---------------------------------------------------------------------------
# grid_reduce_vec: per-tile vector reductions folded across the grid —
# the building block the ICP getAb 6x7 system assembly uses (cudev's
# block-reduce -> atomic-add global pattern, fast_icp.cpp GetAbInvoker).

def grid_reduce_vec(map_op: Callable, *arrays: jnp.ndarray, out_dim: int,
                    tile=(256, 256), interpret=None) -> jnp.ndarray:
    """map_op maps tile -> (out_dim,) partial sums; returns their total.

    map_op receives each input tile (th, tw) PLUS a final (th, tw) bool
    validity tile (False on cells padded up to the tile multiple — the
    reduction happens inside map_op, so map_op itself must zero invalid
    cells' contributions), and must return a (out_dim,) f32 vector (e.g.
    the 27 upper-triangle entries of a 6x7 normal system summed over the
    tile's valid pixels).
    """
    if interpret is None:
        interpret = not _on_tpu()
    H, W = arrays[0].shape
    th, tw = min(tile[0], H), min(tile[1], W)
    padded = [_pad2(a, th, tw) for a in arrays]
    Hp, Wp = padded[0].shape
    ni, nj = Hp // th, Wp // tw

    def kernel(*refs):
        ins, out = refs[:-1], refs[-1]
        i, j = pl.program_id(0), pl.program_id(1)
        first = (i == 0) & (j == 0)
        rows = i * th + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
        cols = j * tw + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
        valid = (rows < H) & (cols < W)
        val = map_op(*(r[:] for r in ins), valid).astype(jnp.float32)

        @pl.when(first)
        def _init():
            out[:] = jnp.zeros_like(out)

        out[:] = out[:] + val.reshape(out.shape)

    res = pl.pallas_call(
        kernel,
        grid=(ni, nj),
        in_specs=[pl.BlockSpec((th, tw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM) for _ in padded],
        out_specs=pl.BlockSpec((1, out_dim), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, out_dim), jnp.float32),
        interpret=interpret,
    )(*padded)
    return res[0]


# ---------------------------------------------------------------------------
# grid_histogram (cudev/grid/histogram.hpp)

def grid_histogram(x: jnp.ndarray, bins: int, vmin: float, vmax: float,
                   tile=(256, 256), interpret=None) -> jnp.ndarray:
    """Fused histogram: per-tile one-hot accumulation into a VMEM-resident
    bin vector (the shared-memory histogram pattern of gridHistogram)."""
    if interpret is None:
        interpret = not _on_tpu()
    H, W = x.shape
    th, tw = min(tile[0], H), min(tile[1], W)
    xp = _pad2(x, th, tw, fill=jnp.nan)
    Hp, Wp = xp.shape
    ni, nj = Hp // th, Wp // tw
    scale = bins / (vmax - vmin)

    def kernel(x_ref, out_ref):
        i, j = pl.program_id(0), pl.program_id(1)
        first = (i == 0) & (j == 0)
        bin_ids = jax.lax.broadcasted_iota(jnp.int32, (1, bins), 1)
        v = x_ref[:]
        ok = ~jnp.isnan(v) & (v >= vmin) & (v < vmax)
        idx = jnp.clip((v - vmin) * scale, 0, bins - 1).astype(jnp.int32)
        idx = jnp.where(ok, idx, -1)

        # Mosaic has no lane-crossing reshape, so the one-hot walks bins:
        # each step counts one bin over the whole tile (VPU compare+reduce)
        # and deposits it through a (1,bins) one-hot — all 2D, loop-carried.
        def per_bin(b, acc):
            cnt = jnp.sum((idx == b).astype(jnp.float32))
            return acc + cnt * (bin_ids == b).astype(jnp.float32)

        counts = jax.lax.fori_loop(0, bins, per_bin,
                                   jnp.zeros((1, bins), jnp.float32))

        @pl.when(first)
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] = out_ref[:] + counts

    res = pl.pallas_call(
        kernel,
        grid=(ni, nj),
        in_specs=[pl.BlockSpec((th, tw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, bins), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, bins), jnp.float32),
        interpret=interpret,
    )(xp)
    return res[0]


# ---------------------------------------------------------------------------
# integral image (cudev/grid/integral.hpp): two-pass separable scan with a
# carried prefix per row-band / column-band.

def _scan_rows_kernel(x_ref, out_ref, carry_ref, *, nj: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    tile = x_ref[:].astype(jnp.float32)
    # in-tile inclusive row scan as an upper-triangular matmul: the MXU does
    # the O(t^2) work at matmul rate (cumsum has no Pallas TPU lowering, and
    # shift-add ladders are VPU-serial; tri-matmul is the TPU-native scan)
    tw = tile.shape[1]
    r = jax.lax.broadcasted_iota(jnp.int32, (tw, tw), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (tw, tw), 1)
    tri = (r <= c).astype(jnp.float32)
    cs = jax.lax.dot_general(tile, tri, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    cs = cs + carry_ref[:]
    out_ref[:] = cs
    carry_ref[:] = cs[:, -1:]


def integral_image(x: jnp.ndarray, tile=(256, 256), interpret=None) -> jnp.ndarray:
    """Inclusive 2D prefix sum (integral image) as two Pallas scan passes.

    Pass 1 cumsums rows with a per-row carry across column tiles; pass 2
    does the same on the transpose. Matches jnp.cumsum(cumsum) to f32
    accuracy; used by the integral-image consumers (SURF boxes, BEBLID,
    feature fronts) when fused variants are needed.
    """
    if interpret is None:
        interpret = not _on_tpu()
    H, W = x.shape
    th, tw = min(tile[0], H), min(tile[1], W)

    def one_pass(a):
        Hh, Ww = a.shape
        pa = _pad2(a, th, tw)
        Hp, Wp = pa.shape
        ni, nj = Hp // th, Wp // tw
        res = pl.pallas_call(
            functools.partial(_scan_rows_kernel, nj=nj),
            grid=(ni, nj),
            in_specs=[pl.BlockSpec((th, tw), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((th, tw), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
            scratch_shapes=[pltpu.VMEM((th, 1), jnp.float32)],
            interpret=interpret,
        )(pa)
        return res[:Hh, :Ww]

    rows = one_pass(x)
    return one_pass(rows.T).T
