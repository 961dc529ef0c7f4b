"""VMEM-tiled bilinear remap — the cudev ptr2d texture/remap role
(cudev/include/opencv2/cudev/ptr2d/{remap,texture}.hpp).

TPU has no per-lane vector gather, so the classic remap-by-gather is
row-op bound (~4-13 ns/sample, fusion-dependent — see PERF.md). For the
BOUNDED-displacement case (flow warps: per-level increments are a few
pixels; rectification residuals) this kernel removes gathers entirely:

    out(y, x) = sum_{sy, sx} relu(1-|dy-sy|) * relu(1-|dx-sx|)
                              * img[y+sy, x+sx]

— a SHIFT-STACK: every term is a STATIC slice of an edge-padded VMEM
slab times an elementwise bilinear weight, so the whole remap is VPU
FMAs over (2R+2)^2 statically-shifted copies, no scatter/gather at all.
The input row slab for each output tile is one tile-constant dynamic
row slice (pl.ds); column shifts are static slices of the padded width.

Cost is (2R+2)^2 * 10 ops/pixel: R=4 -> ~1 kFLOP/pixel, far under the
VPU roofline, vs one 4-13 ns gather per pixel for the XLA formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("max_disp", "tile_h",
                                             "interpret"))
def remap_bounded(img: jnp.ndarray, dy: jnp.ndarray, dx: jnp.ndarray,
                  max_disp: int = 4, tile_h: int = 64,
                  interpret: bool | None = None) -> jnp.ndarray:
    """Bilinear remap out(y,x) = img(y + dy, x + dx) for displacement
    fields with |dy|,|dx| <= max_disp (larger values are clamped).
    Edge-clamped sampling (cv::BORDER_REPLICATE semantics)."""
    if interpret is None:
        interpret = not _on_tpu()
    H, W = img.shape
    R = int(max_disp)
    TH = min(tile_h, H)
    ph = (-H) % TH
    Hp = H + ph
    n_tiles = Hp // TH

    lim = jnp.float32(R)
    dyc = jnp.clip(dy, -lim, lim)
    dxc = jnp.clip(dx, -lim, lim)
    if ph:
        dyc = jnp.pad(dyc, ((0, ph), (0, 0)))
        dxc = jnp.pad(dxc, ((0, ph), (0, 0)))
    # edge-replicate pad: rows by R (+1 upper bilinear corner, + tile pad),
    # cols by R + 1
    imgp = jnp.pad(img, ((R, R + 1 + ph), (R, R + 1)), mode="edge")
    Wp = W + 2 * R + 1

    shifts = range(-R, R + 2)

    def kernel(img_ref, dy_ref, dx_ref, out_ref):
        i = pl.program_id(0)
        dyt = dy_ref[:]  # (TH, W)
        dxt = dx_ref[:]
        # rows [i*TH - R, i*TH + TH + R + 1) of the original image =
        # rows [i*TH, ...) of the R-padded one — tile-constant slice
        slab = img_ref[pl.ds(i * TH, TH + 2 * R + 1), :]  # (TH+2R+1, Wp)
        acc = jnp.zeros_like(dyt)
        for sy in shifts:
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(dyt - sy))
            rows = slab[sy + R: sy + R + TH, :]
            for sx in shifts:
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(dxt - sx))
                acc = acc + wy * wx * rows[:, sx + R: sx + R + W]
        out_ref[:] = acc

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((Hp + 2 * R + 1, Wp), lambda i: (0, 0)),
            pl.BlockSpec((TH, W), lambda i: (i, 0)),
            pl.BlockSpec((TH, W), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((TH, W), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Hp, W), jnp.float32),
        interpret=interpret,
    )(imgp.astype(jnp.float32), dyc.astype(jnp.float32),
      dxc.astype(jnp.float32))
    return out[:H]


def remap_bounded_xla(img, dy, dx, max_disp: int = 4):
    """The XLA gather formulation of the same op (ops.image sampler) —
    the baseline remap_bounded is benchmarked against."""
    from opencv_contrib_tpu.ops.image import sample_bilinear

    H, W = img.shape
    lim = jnp.float32(int(max_disp))
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    return sample_bilinear(img, yy + jnp.clip(dy, -lim, lim),
                           xx + jnp.clip(dx, -lim, lim))
