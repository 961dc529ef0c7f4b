"""Remaining contrib optflow algorithms: DeepFlow, SimpleFlow,
SparseToDense, and RLOF-class robust local flow with illumination model.

Parity targets:
- DeepFlow (optflow/src/deepflow.cpp:50-159): a coarse-to-fine pyramid
  driver whose per-level solve is cv::VariationalRefinement with
  fixedPointIterations=5 — the driver itself adds nothing else, so here it
  is a thin loop over flow.dis.variational_refine.
- SimpleFlow (optflow/src/simpleflow.cpp): local-window probabilistic flow —
  per pixel, a (2r+1)^2 displacement cost volume from color distance,
  cross-bilateral smoothed, winner picked with sub-pixel refinement.
- SparseToDense (optflow/src/sparsetodenseflow.cpp): grid-seeded sparse LK
  matches densified by ximgproc's EdgeAwareInterpolator.
- RLOF (optflow/src/rlofflow.cpp:73,320 + rlof/rlof_invoker.hpp): local
  window solve augmented with a linear illumination model (gain/bias, the
  Senst et al. model) and robust (shrunk-residual) weighting; dense variant =
  grid seeds + interpolation + variational post-pass (rlofflow.cpp:258).

TPU-first notes: SimpleFlow's displacement search is expressed as a stack of
STATIC image shifts (no gathers) so XLA vectorizes the whole cost volume;
the RLOF 4x4 system is solved in closed form via a batched Cholesky-free
cofactor inverse (jnp.linalg.solve on (N,4,4) is fine on MXU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import pyramid
from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.ops.image import resize, sample_bilinear
from opencv_contrib_tpu.flow import dis, lk


# ---------------------------------------------------------------------------
# DeepFlow


def deepflow(I0, I1, levels: int = 5, alpha: float = 8.0, fixed_point_iters: int = 5,
             sor_iters: int = 25):
    """DeepFlow contract (deepflow.cpp:83 defaults, :155-159 delegation):
    coarse-to-fine, each level solved by the variational engine alone."""
    I0 = jnp.asarray(I0, jnp.float32)
    I1 = jnp.asarray(I1, jnp.float32)
    p0 = pyramid.build_pyramid(I0, levels)
    p1 = pyramid.build_pyramid(I1, levels)
    flow = jnp.zeros(p0[-1].shape + (2,))
    for l in reversed(range(levels)):
        if flow.shape[:2] != p0[l].shape:
            flow = resize(flow, p0[l].shape) * 2.0
        flow = dis.variational_refine(p0[l], p1[l], flow, alpha=alpha,
                                      outer=fixed_point_iters, iters=sor_iters)
    return flow


# ---------------------------------------------------------------------------
# SimpleFlow


def _shift(img, dy: int, dx: int):
    return jnp.roll(img, (dy, dx), axis=(0, 1))


@partial(jax.jit, static_argnames=("search_radius", "window_radius"))
def _simpleflow_level(I0, I1, flow_init, search_radius: int, window_radius: int,
                      sigma_color: float):
    """One SimpleFlow level: cost volume over static shifts of the warped
    target, bilateral-smoothed, soft sub-pixel argmin around the winner."""
    H, W = I0.shape
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    # warp I1 by the upscaled coarse flow so the residual search is centered
    Iw = sample_bilinear(I1, yy + flow_init[..., 0], xx + flow_init[..., 1])

    offs = []
    costs = []
    for dy in range(-search_radius, search_radius + 1):
        for dx in range(-search_radius, search_radius + 1):
            d = (Iw if (dy == 0 and dx == 0) else _shift(Iw, -dy, -dx)) - I0
            # windowed color distance (box aggregation = the local window)
            c = filters.box_filter(d * d, window_radius)
            offs.append((dy, dx))
            costs.append(c)
    S = 2 * search_radius + 1
    C = jnp.stack(costs, axis=-1).reshape(H, W, S, S)  # (H, W, Sy, Sx)
    offs = jnp.asarray(offs, jnp.float32)  # (K, 2)

    # probabilistic (softmin) winner — simpleflow.cpp weights shifts by
    # exp(-cost/(2 sigma^2)); at image contrast that is near-hard argmin
    Cf = C.reshape(H, W, S * S)
    wgt = jax.nn.softmax(-Cf / (2 * sigma_color * sigma_color), axis=-1)
    k = jnp.argmin(Cf, axis=-1)
    iy, ix = k // S, k % S
    # sub-pixel: 1D parabola fit through the winner and its axis neighbors
    iy_c = jnp.clip(iy, 1, S - 2)
    ix_c = jnp.clip(ix, 1, S - 2)
    row = jnp.take_along_axis(C, iy_c[..., None, None].astype(jnp.int32),
                              axis=2)[:, :, 0, :]          # (H, W, Sx)
    col = jnp.take_along_axis(C, ix_c[..., None, None].astype(jnp.int32),
                              axis=3)[:, :, :, 0]          # (H, W, Sy)

    def _parab(line, i):
        cm = jnp.take_along_axis(line, (i - 1)[..., None], axis=-1)[..., 0]
        c0 = jnp.take_along_axis(line, i[..., None], axis=-1)[..., 0]
        cp = jnp.take_along_axis(line, (i + 1)[..., None], axis=-1)[..., 0]
        den = cm - 2 * c0 + cp
        return jnp.where(jnp.abs(den) > 1e-9,
                         jnp.clip(0.5 * (cm - cp) / jnp.maximum(den, 1e-9),
                                  -0.5, 0.5), 0.0)

    sub_y = jnp.where(iy == iy_c, _parab(col, iy_c), 0.0)
    sub_x = jnp.where(ix == ix_c, _parab(row, ix_c), 0.0)
    dflow = jnp.stack([iy.astype(jnp.float32) - search_radius + sub_y,
                       ix.astype(jnp.float32) - search_radius + sub_x], axis=-1)
    flow = flow_init + dflow
    # occlusion-style confidence: sharpness of the distribution
    conf = 1.0 - jnp.sum(wgt * wgt, axis=-1)
    return flow, conf


def simpleflow(I0, I1, levels: int = 3, search_radius: int = 4,
               window_radius: int = 2, sigma_color: float = 25.0 / 255.0):
    """SimpleFlow dense field. Inputs (H, W) grayscale in [0,1]."""
    I0 = jnp.asarray(I0, jnp.float32)
    I1 = jnp.asarray(I1, jnp.float32)
    p0 = pyramid.build_pyramid(I0, levels)
    p1 = pyramid.build_pyramid(I1, levels)
    flow = jnp.zeros(p0[-1].shape + (2,))
    for l in reversed(range(levels)):
        if flow.shape[:2] != p0[l].shape:
            flow = resize(flow, p0[l].shape) * 2.0
        flow, _ = _simpleflow_level(p0[l], p1[l], flow,
                                    search_radius=search_radius,
                                    window_radius=window_radius,
                                    sigma_color=sigma_color)
        # edge-preserving cleanup of the per-level field
        flow = jnp.stack([
            filters.guided_filter(p0[l], flow[..., 0], 4, 1e-3),
            filters.guided_filter(p0[l], flow[..., 1], 4, 1e-3),
        ], axis=-1)
    return flow


# ---------------------------------------------------------------------------
# SparseToDense


def sparse_to_dense(I0, I1, grid_step: int = 8, levels: int = 3,
                    radius: int = 7, iters: int = 10,
                    fb_threshold: float = 1.5):
    """calcOpticalFlowSparseToDense contract (sparsetodenseflow.cpp): grid
    LK matches, forward-backward pruned, densified edge-aware."""
    from opencv_contrib_tpu.ximgproc.interp import edge_aware_interpolate

    I0 = jnp.asarray(I0, jnp.float32)
    I1 = jnp.asarray(I1, jnp.float32)
    H, W = I0.shape
    ys = jnp.arange(grid_step // 2, H, grid_step, dtype=jnp.float32)
    xs = jnp.arange(grid_step // 2, W, grid_step, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    pts = jnp.stack([gy.reshape(-1), gx.reshape(-1)], axis=1)

    fwd_pts, fwd, v_f = lk.track(I0, I1, pts, levels=levels, radius=radius, iters=iters)
    bwd_pts, bwd, v_b = lk.track(I1, I0, fwd_pts, levels=levels, radius=radius, iters=iters)
    fb = jnp.linalg.norm(bwd_pts - pts, axis=1)
    valid = v_f & v_b & (fb < fb_threshold)

    dense = edge_aware_interpolate(I0, pts, fwd, seed_valid=valid)
    return dense


# ---------------------------------------------------------------------------
# RLOF


@partial(jax.jit, static_argnames=("radius", "iters"))
def rlof_level(I0, I1, pts_yx, flow0, radius: int = 7, iters: int = 12,
               huber: float = 0.04):
    """One-level RLOF: per-window GN over (dy, dx, gain, bias) with robust
    residual weights — the illumination-augmented system of
    rlof/rlof_invoker.hpp (model I1(x+d) ~= (1+g) I0(x) + b)."""
    gy, gx = filters.gradients(I0)
    dy, dx = lk._window_offsets(radius)
    wy = pts_yx[:, 0][:, None] + dy[None]
    wx = pts_yx[:, 1][:, None] + dx[None]
    T = sample_bilinear(I0, wy, wx)      # (N, M)
    Gy = sample_bilinear(gy, wy, wx)
    Gx = sample_bilinear(gx, wy, wx)

    # Jacobian columns: [Gy, Gx, -T, -1] for params (dy, dx, gain, bias)
    ones = jnp.ones_like(T)
    J = jnp.stack([Gy, Gx, -T, -ones], axis=-1)  # (N, M, 4)

    def body(state, _):
        params = state  # (N, 4)
        sy = wy + params[:, 0][:, None]
        sx = wx + params[:, 1][:, None]
        Iw = sample_bilinear(I1, sy, sx)
        r = Iw - (1.0 + params[:, 2][:, None]) * T - params[:, 3][:, None]
        w = jnp.minimum(1.0, huber / (jnp.abs(r) + 1e-9))  # Huber IRLS weight
        Jw = J * w[..., None]
        A = jnp.einsum("nmi,nmj->nij", Jw, J)
        A = A + 1e-6 * jnp.eye(4)
        b = jnp.einsum("nmi,nm->ni", Jw, r)
        step = jnp.linalg.solve(A, b[..., None])[..., 0]
        return params - step, None

    params0 = jnp.concatenate([flow0, jnp.zeros((flow0.shape[0], 2))], axis=1)
    params, _ = jax.lax.scan(body, params0, None, length=iters)
    flow = params[:, :2]
    H, W = I0.shape
    ty = pts_yx[:, 0] + flow[:, 0]
    tx = pts_yx[:, 1] + flow[:, 1]
    valid = (ty >= 0) & (ty <= H - 1) & (tx >= 0) & (tx <= W - 1)
    # quality gate: residual after illumination correction must be small
    # relative to the window contrast (textureless / diverged windows fail)
    Iw = sample_bilinear(I1, wy + params[:, 0][:, None], wx + params[:, 1][:, None])
    r = Iw - (1.0 + params[:, 2][:, None]) * T - params[:, 3][:, None]
    contrast = jnp.std(T, axis=1) + 1e-6
    valid = valid & (jnp.sqrt(jnp.mean(r * r, axis=1)) < 0.5 * contrast)
    return flow, valid


def rlof_track(I0, I1, pts_yx, levels: int = 3, radius: int = 7, iters: int = 12):
    """Pyramidal sparse RLOF (SparseRLOFOpticalFlow contract)."""
    p0 = pyramid.build_pyramid(jnp.asarray(I0, jnp.float32), levels)
    p1 = pyramid.build_pyramid(jnp.asarray(I1, jnp.float32), levels)
    N = pts_yx.shape[0]
    flow = jnp.zeros((N, 2))
    valid = jnp.ones(N, bool)
    for l in reversed(range(levels)):
        s = 0.5**l
        flow, v = rlof_level(p0[l], p1[l], pts_yx * s, flow, radius=radius, iters=iters)
        valid = valid & v
        if l > 0:
            flow = flow * 2.0
    return pts_yx + flow, flow, valid


def rlof_dense(I0, I1, grid_step: int = 6, levels: int = 3, radius: int = 7,
               iters: int = 12, use_variational: bool = True):
    """DenseRLOFOpticalFlow contract (rlofflow.cpp:320): grid-seeded sparse
    RLOF + edge-aware densification + variational post-pass (:258)."""
    from opencv_contrib_tpu.ximgproc.interp import edge_aware_interpolate

    I0 = jnp.asarray(I0, jnp.float32)
    I1 = jnp.asarray(I1, jnp.float32)
    H, W = I0.shape
    ys = jnp.arange(grid_step // 2, H, grid_step, dtype=jnp.float32)
    xs = jnp.arange(grid_step // 2, W, grid_step, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    pts = jnp.stack([gy.reshape(-1), gx.reshape(-1)], axis=1)
    _, flow_s, valid = rlof_track(I0, I1, pts, levels=levels, radius=radius, iters=iters)
    dense = edge_aware_interpolate(I0, pts, flow_s, seed_valid=valid)
    if use_variational:
        dense = dis.variational_refine(I0, I1, dense)
    return dense
