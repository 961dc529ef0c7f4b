"""BTV super-resolution: conjugate-gradient solve of the multi-frame
reconstruction normal equations with a smoothness prior.

Parity: superres BTV-L1 (superres/src/btv_l1.cpp,
createSuperResolution_BTVL1): optical-flow-aligned multi-frame fusion with a
bilateral-TV-class regularizer and pluggable dense flow (flow.dis plays
DenseOpticalFlowExt's role).

TPU-first solver choice: the data term sum_f |D W_f x - lr_f|^2 is linear
least squares (W = bilinear warp, D = area downsample are linear operators),
so instead of the reference's ~100 gradient sweeps we run conjugate
gradient on the normal equations; the operator transpose comes from
jax.linear_transpose — exact adjoints, no hand-rolled scatter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ops.image import resize, sample_bilinear, grid_coords
from opencv_contrib_tpu.flow import dis


def btv_l1(
    frames,
    scale: int = 2,
    n_iters: int = 30,
    tau: float = None,  # kept for API compatibility; unused by the CG solver
    lam: float = 2e-3,
    ref_index: int | None = None,
    flows=None,
    mu: float = 1e-4,
    outer_iters: int = 1,
):
    """Fuse low-res frames (list of (H, W)) into a (scale*H, scale*W) frame.

    n_iters = CG iterations; lam = smoothness weight. `flows` optionally
    supplies per-frame f->ref flow fields (LR px) — the pluggable-flow
    contract of the reference's SuperResolution::setOpticalFlow; when None,
    flow.dis estimates them. Sub-0.05px flow accuracy is what makes the LS
    fusion beat plain upsampling; supply exact motions when you have them.
    """
    frames = [jnp.asarray(f, jnp.float32) for f in frames]
    if ref_index is None:
        ref_index = len(frames) // 2
    H, W = frames[0].shape
    Hh, Wh = H * scale, W * scale

    # flows f->ref (LR px): frame-f pixel q matches ref location q + flow(q)
    if flows is None:
        flows = []
        for i, f in enumerate(frames):
            if i == ref_index:
                flows.append(jnp.zeros((H, W, 2)))
            else:
                flows.append(dis.compute(f, frames[ref_index], levels=3, use_variational=True))
    else:
        flows = [jnp.asarray(fl, jnp.float32) for fl in flows]

    y, x = grid_coords(Hh, Wh)
    coords = []
    for fl in flows:
        fl_hr = resize(fl, (Hh, Wh)) * scale
        coords.append((y + fl_hr[..., 0], x + fl_hr[..., 1]))

    def fwd_one(hr, sy, sx):
        """Linear forward model for one frame: warp then area-downsample."""
        warped = sample_bilinear(hr, sy, sx)
        return warped.reshape(H, scale, W, scale).mean(axis=(1, 3))

    def smooth_grad(hr):
        """Gradient operator of the quadratic smoothness prior |grad x|^2:
        the (negated) 5-point laplacian."""
        lap = (
            jnp.roll(hr, 1, 0) + jnp.roll(hr, -1, 0) + jnp.roll(hr, 1, 1) + jnp.roll(hr, -1, 1)
            - 4.0 * hr
        )
        return -lap

    # exact adjoints of the linear forward maps
    zeros_hr = jnp.zeros((Hh, Wh), jnp.float32)
    adjoints = [
        jax.linear_transpose(lambda v, sy=sy, sx=sx: fwd_one(v, sy, sx), zeros_hr)
        for (sy, sx) in coords
    ]

    def A(hr):
        """Normal operator: sum_f W'D'DW + lam*(-lap) + mu*I. The ridge mu
        pins the box-downsample kernel's null space (HR frequencies that
        alias to identical LR pixels) — the "spectral regularization"
        closing the estimated-flow gap."""
        out = lam * smooth_grad(hr) + mu * hr
        for (sy, sx), adj in zip(coords, adjoints):
            (back,) = adj(fwd_one(hr, sy, sx))
            out = out + back
        return out

    b = zeros_hr
    for f, adj in zip(frames, adjoints):
        (back,) = adj(f)
        b = b + back

    x0 = resize(frames[ref_index], (Hh, Wh))

    @jax.jit
    def cg(x0, b):
        def body(carry, _):
            xk, r, p, rs = carry
            Ap = A(p)
            alpha = rs / jnp.maximum(jnp.vdot(p, Ap), 1e-12)
            xk = xk + alpha * p
            r = r - alpha * Ap
            rs_new = jnp.vdot(r, r)
            beta = rs_new / jnp.maximum(rs, 1e-12)
            p = r + beta * p
            return (xk, r, p, rs_new), None

        r0 = b - A(x0)
        (xk, _, _, _), _ = jax.lax.scan(body, (x0, r0, r0, jnp.vdot(r0, r0)), None, length=n_iters)
        return xk

    out = jnp.clip(cg(x0, b), 0.0, 1.0)
    # joint flow refinement (the reference's iterative BTV loop re-runs
    # flow against the improving estimate): re-estimate each frame's flow
    # against the SHARPER reconstruction projected to LR, then re-solve
    for _ in range(max(outer_iters - 1, 0)):
        ref_lr = out.reshape(H, scale, W, scale).mean(axis=(1, 3))
        new_flows = []
        for i, f in enumerate(frames):
            if i == ref_index:
                new_flows.append(jnp.zeros((H, W, 2)))
            else:
                new_flows.append(dis.compute(f, ref_lr, levels=3, use_variational=True))
        out = btv_l1(frames, scale=scale, n_iters=n_iters, lam=lam,
                     ref_index=ref_index, flows=new_flows, mu=mu, outer_iters=1)
    return out
