"""Pallas pipeline/scan/pyramid primitives (cudev breadth, round 4).

Fills the remaining cudev-layer roles (SURVEY P3/P4):
- grid_scan: tiled row prefix-sums with a cross-tile carry
  (cudev/warp/scan.hpp + block scan role);
- grid_pyrdown: fused 5-tap binomial blur + 2x decimation
  (cudev/grid/pyramids.hpp role);
- streamed_transform: elementwise map over an HBM-resident array with an
  EXPLICIT double-buffered DMA pipeline (pltpu.emit_pipeline) — the
  cuda::Stream / *Async overlap pattern (SURVEY P4): the grid input lives
  in ANY/HBM memory space and emit_pipeline stages block copies into VMEM
  while the previous block computes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# grid_scan: row prefix sums, tiled along the row with a carry

def grid_scan(x: jnp.ndarray, tile: int = 512, interpret=None) -> jnp.ndarray:
    """Inclusive prefix sum along the last axis of (H, W).

    The W axis is processed in tiles; a scratch carry column accumulates
    the running row totals across grid steps (TPU grids execute
    sequentially, so the carry is race-free) — the cudev block/warp scan
    composed over tiles. In-tile scan is a cumsum over the VMEM block.
    """
    if interpret is None:
        interpret = not _on_tpu()
    H, W = x.shape
    tw = min(tile, W)
    pad = (-W) % tw
    xp = jnp.pad(x, ((0, 0), (0, pad)))
    Wp = W + pad
    nt = Wp // tw

    def kernel(xr, out, carry):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _init():
            carry[:, :] = jnp.zeros((H, 1), xr.dtype)

        # in-tile scan as an upper-triangular matmul (MXU; cumsum has no
        # Pallas TPU lowering) — the integral-image tri-matmul trick.
        # All ref reads/writes stay 2-D (1-D forms lower poorly on TPU).
        tri = jnp.triu(jnp.ones((tw, tw), xr.dtype))
        cs = jnp.dot(xr[:, :], tri, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        cs = cs.astype(xr.dtype)
        c = carry[:, :]  # (H, 1)
        out[:, :] = cs + c
        carry[:, :] = c + cs[:, tw - 1:tw]

    res = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[pl.BlockSpec((H, tw), lambda j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((H, tw), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, Wp), x.dtype),
        scratch_shapes=[pltpu.VMEM((H, 1), x.dtype)],
        interpret=interpret,
    )(xp)
    return res[:, :W]


# ---------------------------------------------------------------------------
# grid_pyrdown: fused binomial blur + decimate

def grid_pyrdown(x: jnp.ndarray, interpret=None) -> jnp.ndarray:
    """One pyramid level: separable [1 4 6 4 1]/16 blur + 2x decimation in
    a single kernel (cudev/grid/pyramids.hpp gridPyrDown role). H and W
    must be even; borders replicate."""
    if interpret is None:
        interpret = not _on_tpu()
    H, W = x.shape

    def kernel(xr, out):
        img = xr[:, :]

        def blur(a, axis):
            n = a.shape[axis]
            idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, axis)

            def sh(k):
                # replicate borders instead of wrapping (no scatter: the
                # rolled-in rows are overwritten via iota masks)
                r = jnp.roll(a, k, axis)
                if k > 0:
                    edge = a[:1, :] if axis == 0 else a[:, :1]
                    return jnp.where(idx < k, edge, r)
                if k < 0:
                    edge = a[-1:, :] if axis == 0 else a[:, -1:]
                    return jnp.where(idx >= n + k, edge, r)
                return r

            return (sh(2) + 4 * sh(1) + 6 * a + 4 * sh(-1) + sh(-2)) / 16.0

        sm = blur(blur(img, 0), 1)
        # 2x decimation via one-hot selection matmuls (strided slices have
        # no TPU Pallas lowering; selection rides the MXU)
        rsel = (jax.lax.broadcasted_iota(jnp.int32, (H // 2, H), 0) * 2
                == jax.lax.broadcasted_iota(jnp.int32, (H // 2, H), 1)
                ).astype(sm.dtype)
        csel = (jax.lax.broadcasted_iota(jnp.int32, (W, W // 2), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (W, W // 2), 1) * 2
                ).astype(sm.dtype)
        hp = jax.lax.Precision.HIGHEST
        out[:, :] = jnp.dot(jnp.dot(rsel, sm, preferred_element_type=jnp.float32,
                                    precision=hp),
                            csel, preferred_element_type=jnp.float32,
                            precision=hp).astype(sm.dtype)

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H // 2, W // 2), x.dtype),
        interpret=interpret,
    )(x)


# ---------------------------------------------------------------------------
# streamed_transform: explicit double-buffered DMA pipeline

def streamed_transform(op, x: jnp.ndarray, block: int = 256,
                       interpret=None) -> jnp.ndarray:
    """Elementwise map over (H, W) with the input left in HBM (ANY memory
    space) and an emit_pipeline-managed double-buffered DMA: block i+1
    streams into VMEM while block i computes (the cuda Stream/Async
    overlap pattern, SURVEY P4)."""
    if interpret is None:
        interpret = not _on_tpu()
    H, W = x.shape
    bh = min(block, H)
    pad = (-H) % bh
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    Hp = H + pad

    def inner(xr, out):
        out[:, :] = op(xr[:, :])

    if interpret:
        # emit_pipeline has no CPU interpreter; same block semantics
        # through the automatic (compiler-managed) pipeline instead
        res = pl.pallas_call(
            inner,
            grid=(Hp // bh,),
            in_specs=[pl.BlockSpec((bh, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bh, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Hp, W), x.dtype),
            interpret=True,
        )(xp)
        return res[:H]

    def kernel(x_hbm, out_hbm):
        pipeline = pltpu.emit_pipeline(
            inner,
            grid=(Hp // bh,),
            in_specs=[pl.BlockSpec((bh, W), lambda i: (i, 0))],
            out_specs=[pl.BlockSpec((bh, W), lambda i: (i, 0))],
        )
        pipeline(x_hbm, out_hbm)

    res = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((Hp, W), x.dtype),
        interpret=interpret,
    )(xp)
    return res[:H]
