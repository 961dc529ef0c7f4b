"""Information-flow-class alpha matting via an affinity-Laplacian CG solve.

alpha minimizes  sum_edges w_ij (a_i - a_j)^2 + lam * |a - trimap|^2 on
known pixels, with color-based edge affinities — the graph structure of the
reference's info-flow formulation on the 8-neighborhood.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


_SHIFTS = [(-1, -1), (-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1)]


@partial(jax.jit, static_argnames=("n_iters",))
def info_flow(img: jnp.ndarray, trimap: jnp.ndarray, sigma_color: float = 0.1, lam: float = 100.0, n_iters: int = 150) -> jnp.ndarray:
    """img (H, W[, 3]) in [0,1]; trimap (H, W): 1 = foreground, 0 =
    background, 0.5 (or anything else) = unknown. Returns alpha (H, W)."""
    if img.ndim == 2:
        feat = img[..., None]
    else:
        feat = img
    known_fg = trimap > 0.99
    known_bg = trimap < 0.01
    known = known_fg | known_bg
    target = known_fg.astype(jnp.float32)

    # 8-neighbor color affinities
    ws = []
    for dy, dx in _SHIFTS:
        d2 = jnp.sum((jnp.roll(feat, (dy, dx), (0, 1)) - feat) ** 2, axis=-1)
        ws.append(jnp.exp(-d2 / (2 * sigma_color * sigma_color)))

    lam_map = lam * known.astype(jnp.float32)

    def A(a):
        out = lam_map * a
        for (dy, dx), w in zip(_SHIFTS, ws):
            out = out + w * (a - jnp.roll(a, (dy, dx), (0, 1)))
        return out

    b = lam_map * target
    a0 = jnp.where(known, target, 0.5)

    def body(carry, _):
        a, r, p, rs = carry
        Ap = A(p)
        alpha_step = rs / jnp.maximum(jnp.vdot(p, Ap), 1e-12)
        a = a + alpha_step * p
        r = r - alpha_step * Ap
        rs_new = jnp.vdot(r, r)
        p = r + (rs_new / jnp.maximum(rs, 1e-12)) * p
        return (a, r, p, rs_new), None

    r0 = b - A(a0)
    (a, _, _, _), _ = jax.lax.scan(body, (a0, r0, r0, jnp.vdot(r0, r0)), None, length=n_iters)
    return jnp.clip(a, 0.0, 1.0)


@partial(jax.jit, static_argnames=("k", "n_samples", "n_iters"))
def info_flow_nonlocal(img: jnp.ndarray, trimap: jnp.ndarray, sigma_color: float = 0.1,
                       lam: float = 100.0, k: int = 5, n_samples: int = 2048,
                       w_nonlocal: float = 1.0, n_iters: int = 150) -> jnp.ndarray:
    """Info-flow matting with the reference's NON-LOCAL K-to-U flow
    (alphamat/src/trimming.cpp + KToU term): every unknown pixel is softly
    tied to its k nearest KNOWN (fg/bg) samples in color space — long-range
    alpha propagation across disconnected regions of similar color, which
    the 8-neighborhood Laplacian alone cannot provide.

    TPU-first: the unknown->known kNN is one (HW, S) distance matmul +
    top_k over a static sample of known pixels; the flow enters the CG
    system as a diagonal + rhs term (no scatter needed).
    """
    if img.ndim == 2:
        feat = img[..., None]
    else:
        feat = img
    H, W = trimap.shape
    known_fg = trimap > 0.99
    known_bg = trimap < 0.01
    known = known_fg | known_bg
    target = known_fg.astype(jnp.float32)

    # local 8-neighbor affinities (as info_flow)
    ws = []
    for dy, dx in _SHIFTS:
        d2 = jnp.sum((jnp.roll(feat, (dy, dx), (0, 1)) - feat) ** 2, axis=-1)
        ws.append(jnp.exp(-d2 / (2 * sigma_color * sigma_color)))

    # static sample of KNOWN pixels: sort so known come first, take S
    F = feat.reshape(H * W, -1)
    kflat = known.reshape(-1)
    order = jnp.argsort(~kflat)  # known first
    samp_idx = order[:n_samples]
    samp_ok = kflat[samp_idx]
    Fs = F[samp_idx]
    ts = target.reshape(-1)[samp_idx]

    d2 = (F * F).sum(-1)[:, None] + (Fs * Fs).sum(-1)[None] - 2.0 * F @ Fs.T
    d2 = jnp.where(samp_ok[None], d2, jnp.inf)
    neg, nn = jax.lax.top_k(-d2, k)  # (HW, k) nearest KNOWN samples
    wd = jnp.exp(jnp.clip(neg, -50.0, 0.0) / (2 * sigma_color * sigma_color))
    wd = wd * jnp.isfinite(neg)
    # only unknown pixels receive the flow
    wd = wd * (~kflat)[:, None]
    ku_diag = (w_nonlocal * wd.sum(-1)).reshape(H, W)
    ku_rhs = (w_nonlocal * (wd * ts[nn]).sum(-1)).reshape(H, W)

    lam_map = lam * known.astype(jnp.float32)

    def A(a):
        out = (lam_map + ku_diag) * a
        for (dy, dx), w in zip(_SHIFTS, ws):
            out = out + w * (a - jnp.roll(a, (dy, dx), (0, 1)))
        return out

    b = lam_map * target + ku_rhs
    a0 = jnp.where(known, target, 0.5)

    def body(carry, _):
        a, r, p, rs = carry
        Ap = A(p)
        alpha_step = rs / jnp.maximum(jnp.vdot(p, Ap), 1e-12)
        a = a + alpha_step * p
        r = r - alpha_step * Ap
        rs_new = jnp.vdot(r, r)
        p = r + (rs_new / jnp.maximum(rs, 1e-12)) * p
        return (a, r, p, rs_new), None

    r0 = b - A(a0)
    (a, _, _, _), _ = jax.lax.scan(body, (a0, r0, r0, jnp.vdot(r0, r0)), None, length=n_iters)
    return jnp.clip(a, 0.0, 1.0)
