"""BM3D image denoising (two-step profile: hard threshold + Wiener).

Reference anchor: xphoto/src/bm3d_image_denoising.cpp:94 (+ bm3d_denoising_
invoker_step1.hpp / bm3d_denoising_invoker_step2.hpp): block matching into
groups of similar patches, 3D transform (2D DCT per patch + 1D Haar across
the group); step 1 hard-thresholds, step 2 Wiener-filters the NOISY groups
with coefficients derived from the step-1 basic estimate's spectra, each
followed by weighted aggregation.

TPU-first: the reference's per-reference-block sequential search becomes a
single batched computation — ALL reference patches (on a stride grid)
compute distances to ALL candidates in their search window via one
(R, C, p, p) tensor expression, top_k picks the group, and the 3D
transform/threshold/inverse is one einsum chain. Aggregation is a
scatter-add of weighted patches (the reference's numerator/denominator
buffers).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _dct_matrix(n: int) -> jnp.ndarray:
    k = jnp.arange(n)
    M = jnp.cos(jnp.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    M = M * jnp.sqrt(2.0 / n)
    return M.at[0].mul(1.0 / jnp.sqrt(2.0))


def _haar_matrix(n: int) -> jnp.ndarray:
    """Orthonormal Haar transform for power-of-two n."""
    M = np.array([[1.0]])
    while M.shape[0] < n:
        m = M.shape[0]
        top = np.kron(M, [1.0, 1.0])
        bot = np.kron(np.eye(m), [1.0, -1.0])
        M = np.vstack([top, bot]) / np.sqrt(2.0)
    return jnp.asarray(M, jnp.float32)


@partial(jax.jit, static_argnames=("patch", "stride", "search", "group"))
def bm3d_denoise(img, sigma: float = 0.1, patch: int = 8, stride: int = 4,
                 search: int = 8, group: int = 8):
    """BM3D step-1 on a grayscale image in [0, 1]. `search` is the window
    half-size in stride units; `group` the (power-of-two) patches per group."""
    H, W = img.shape
    P = patch
    gy = jnp.arange(0, H - P + 1, stride)
    gx = jnp.arange(0, W - P + 1, stride)
    Ry, Rx = gy.shape[0], gx.shape[0]

    # all candidate patches on the stride grid: (Ry, Rx, P, P)
    def patch_at(y, x):
        return jax.lax.dynamic_slice(img, (y, x), (P, P))

    patches = jax.vmap(lambda y: jax.vmap(lambda x: patch_at(y, x))(gx))(gy)

    D = _dct_matrix(P)
    tp = jnp.einsum("ij,ryjk,lk->ryil", D, patches, D)  # DCT of every patch

    # block matching in DCT space (distances are preserved; matches the
    # reference's d-distance on transformed patches)
    flat = tp.reshape(Ry, Rx, P * P)
    offs = jnp.arange(-search, search + 1)

    def group_for(iy, ix):
        ref = flat[iy, ix]
        cy = jnp.clip(iy + offs, 0, Ry - 1)
        cx = jnp.clip(ix + offs, 0, Rx - 1)
        cand = flat[cy[:, None], cx[None, :]].reshape(-1, P * P)  # (S^2, PP)
        d = ((cand - ref[None]) ** 2).sum(-1)
        _, sel = jax.lax.top_k(-d, group)
        iy_sel = cy[sel // offs.shape[0]]
        ix_sel = cx[sel % offs.shape[0]]
        return iy_sel, ix_sel

    iy_g, ix_g = jax.vmap(lambda iy: jax.vmap(lambda ix: group_for(iy, ix))(jnp.arange(Rx)))(jnp.arange(Ry))
    # gather group DCT patches: (Ry, Rx, G, P, P)
    grp = tp[iy_g, ix_g]

    # 1D Haar across the group axis, hard threshold, inverse
    Hm = _haar_matrix(group)
    t3 = jnp.einsum("gh,ryhil->rygil", Hm, grp)
    lam = 2.7 * sigma
    kept = jnp.abs(t3) > lam
    t3 = jnp.where(kept, t3, 0.0)
    n_kept = kept.sum((-3, -2, -1)).astype(jnp.float32)  # per group
    grp_d = jnp.einsum("hg,rygil->ryhil", Hm.T, t3)
    spat = jnp.einsum("ij,ryhik,kl->ryhjl", D, grp_d, D)  # D^T X D inverse DCT

    # aggregation: weight = 1/(1 + n_kept) per group (reference uses
    # 1/(sigma^2 N_kept); the constant cancels in num/den)
    wgt = 1.0 / (1.0 + n_kept)  # (Ry, Rx)
    y0 = gy[iy_g]  # (Ry, Rx, G)
    x0 = gx[ix_g]
    py = y0[..., None, None] + jnp.arange(P)[None, None, None, :, None]
    px = x0[..., None, None] + jnp.arange(P)[None, None, None, None, :]
    lin = (py * W + px).reshape(-1)
    vals = (spat * wgt[..., None, None, None]).reshape(-1)
    wrep = jnp.broadcast_to(wgt[..., None, None, None], spat.shape).reshape(-1)
    num = jnp.zeros(H * W).at[lin].add(vals)
    den = jnp.zeros(H * W).at[lin].add(wrep)
    out = num / jnp.maximum(den, 1e-8)
    return jnp.where(den.reshape(H, W) > 0, out.reshape(H, W), img)


@partial(jax.jit, static_argnames=("patch", "stride", "search", "group"))
def bm3d_denoise_step2(img, basic, sigma: float = 0.1, patch: int = 8,
                       stride: int = 4, search: int = 8, group: int = 8):
    """BM3D step-2 Wiener collaborative filtering
    (bm3d_denoising_invoker_step2.hpp): block-match on the BASIC estimate,
    transform both the basic and the noisy groups, apply Wiener shrinkage
    w = |T_basic|^2 / (|T_basic|^2 + sigma^2) to the NOISY spectra,
    aggregate with weight 1 / sum(w^2)."""
    H, W = img.shape
    P = patch
    gy = jnp.arange(0, H - P + 1, stride)
    gx = jnp.arange(0, W - P + 1, stride)
    Ry, Rx = gy.shape[0], gx.shape[0]

    def patches_of(src):
        def patch_at(y, x):
            return jax.lax.dynamic_slice(src, (y, x), (P, P))
        return jax.vmap(lambda y: jax.vmap(lambda x: patch_at(y, x))(gx))(gy)

    D = _dct_matrix(P)
    tp_basic = jnp.einsum("ij,ryjk,lk->ryil", D, patches_of(basic), D)
    tp_noisy = jnp.einsum("ij,ryjk,lk->ryil", D, patches_of(img), D)

    # block matching on the basic estimate (less noise -> better groups)
    flat = tp_basic.reshape(Ry, Rx, P * P)
    offs = jnp.arange(-search, search + 1)

    def group_for(iy, ix):
        ref = flat[iy, ix]
        cy = jnp.clip(iy + offs, 0, Ry - 1)
        cx = jnp.clip(ix + offs, 0, Rx - 1)
        cand = flat[cy[:, None], cx[None, :]].reshape(-1, P * P)
        d = ((cand - ref[None]) ** 2).sum(-1)
        _, sel = jax.lax.top_k(-d, group)
        return cy[sel // offs.shape[0]], cx[sel % offs.shape[0]]

    iy_g, ix_g = jax.vmap(lambda iy: jax.vmap(
        lambda ix: group_for(iy, ix))(jnp.arange(Rx)))(jnp.arange(Ry))

    Hm = _haar_matrix(group)
    t3_basic = jnp.einsum("gh,ryhil->rygil", Hm, tp_basic[iy_g, ix_g])
    t3_noisy = jnp.einsum("gh,ryhil->rygil", Hm, tp_noisy[iy_g, ix_g])

    # Wiener shrinkage from the basic spectra, applied to the noisy spectra
    wien = t3_basic ** 2 / (t3_basic ** 2 + sigma ** 2)
    t3 = wien * t3_noisy
    w_energy = (wien ** 2).sum((-3, -2, -1))  # (Ry, Rx)

    grp_d = jnp.einsum("hg,rygil->ryhil", Hm.T, t3)
    spat = jnp.einsum("ij,ryhik,kl->ryhjl", D, grp_d, D)

    wgt = 1.0 / (1e-6 + w_energy)  # reference: 1/(sigma^2 sum w^2)
    y0 = gy[iy_g]
    x0 = gx[ix_g]
    py = y0[..., None, None] + jnp.arange(P)[None, None, None, :, None]
    px = x0[..., None, None] + jnp.arange(P)[None, None, None, None, :]
    lin = (py * W + px).reshape(-1)
    vals = (spat * wgt[..., None, None, None]).reshape(-1)
    wrep = jnp.broadcast_to(wgt[..., None, None, None], spat.shape).reshape(-1)
    num = jnp.zeros(H * W).at[lin].add(vals)
    den = jnp.zeros(H * W).at[lin].add(wrep)
    out = num / jnp.maximum(den, 1e-8)
    return jnp.where(den.reshape(H, W) > 0, out.reshape(H, W), basic)


def bm3d(img, sigma: float = 0.1, patch: int = 8, stride: int = 4,
         search: int = 8, group: int = 8):
    """Full two-step BM3D (BM3D_STEPALL, bm3d_image_denoising.cpp:94):
    hard-threshold basic estimate, then Wiener refinement."""
    basic = bm3d_denoise(img, sigma, patch, stride, search, group)
    return bm3d_denoise_step2(img, basic, sigma, patch, stride, search, group)
