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
