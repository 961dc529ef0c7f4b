"""Edge-aware filter family."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ops import filters


@partial(jax.jit, static_argnames=("n_iters",))
def anisotropic_diffusion(img: jnp.ndarray, alpha: float = 0.15, K: float = 0.1, n_iters: int = 20) -> jnp.ndarray:
    """Perona-Malik diffusion (parity: cv::ximgproc::anisotropicDiffusion)."""

    def body(x, _):
        n = jnp.roll(x, -1, 0) - x
        s = jnp.roll(x, 1, 0) - x
        e = jnp.roll(x, -1, 1) - x
        w = jnp.roll(x, 1, 1) - x

        def g(d):
            return jnp.exp(-((d / K) ** 2))

        return x + alpha * (g(n) * n + g(s) * s + g(e) * e + g(w) * w), None

    out, _ = jax.lax.scan(body, img, None, length=n_iters)
    return out


def rolling_guidance_filter(img: jnp.ndarray, sigma_s: float = 3.0, sigma_r: float = 0.1, n_iters: int = 4) -> jnp.ndarray:
    """Rolling guidance filter (parity: cv::ximgproc::rollingGuidanceFilter):
    iterated joint-bilateral with the evolving guide."""
    guide = filters.gaussian_blur(img, sigma_s)
    for _ in range(n_iters):
        guide = _joint_bilateral(guide, img, sigma_s, sigma_r)
    return guide


def _joint_bilateral(guide, src, sigma_s, sigma_r, radius: int = 4):
    num = jnp.zeros_like(src)
    den = jnp.zeros_like(src)
    inv2ss = 1.0 / (2 * sigma_s * sigma_s)
    inv2sr = 1.0 / (2 * sigma_r * sigma_r)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            gs = jnp.exp(-(dy * dy + dx * dx) * inv2ss)
            g_shift = jnp.roll(guide, (dy, dx), (0, 1))
            s_shift = jnp.roll(src, (dy, dx), (0, 1))
            w = gs * jnp.exp(-((g_shift - guide) ** 2) * inv2sr)
            num = num + w * s_shift
            den = den + w
    return num / jnp.maximum(den, 1e-9)


def dt_filter(guide: jnp.ndarray, src: jnp.ndarray, sigma_s: float = 8.0, sigma_r: float = 0.2, n_iters: int = 3) -> jnp.ndarray:
    """Domain-transform recursive filter (parity: cv::ximgproc::dtFilter,
    DTF_RF mode): the 1D recursive smoothing alternates rows/columns in the
    transformed domain; lax.scan over the scanline axis."""
    gy, gx = filters.gradients(guide)

    def pass_1d(x, dct, sigma_h):
        a = jnp.exp(-jnp.sqrt(2.0) / sigma_h)
        w = a ** dct  # (H, W) feedback coefficient per step

        def fwd(carry, inp):
            v, wk = inp
            carry = v + wk * (carry - v)
            return carry, carry

        # forward along axis 1
        xT = x.T
        wT = w.T
        _, out = jax.lax.scan(fwd, xT[0], (xT, wT))
        out = out.T
        # backward
        xb = out[:, ::-1]
        wb = w[:, ::-1]
        _, out2 = jax.lax.scan(fwd, xb.T[0], (xb.T, wb.T))
        return out2.T[:, ::-1]

    out = src
    H, W = src.shape
    for i in range(n_iters):
        sigma_h = sigma_s * jnp.sqrt(3.0) * (2.0 ** (n_iters - i - 1)) / jnp.sqrt(4.0 ** n_iters - 1.0)
        dctx = 1.0 + sigma_s / sigma_r * jnp.abs(gx)
        out = pass_1d(out, dctx, sigma_h)
        dcty = 1.0 + sigma_s / sigma_r * jnp.abs(gy)
        out = pass_1d(out.T, dcty.T, sigma_h).T
    return out


def niblack_threshold(img: jnp.ndarray, block_radius: int = 7, k: float = -0.2) -> jnp.ndarray:
    """Niblack local threshold (parity: cv::ximgproc::niBlackThreshold):
    T = mean + k * stddev over the window; returns binary mask."""
    mu = filters.box_filter(img, block_radius)
    var = filters.box_filter(img * img, block_radius) - mu * mu
    T = mu + k * jnp.sqrt(jnp.maximum(var, 0.0))
    return img > T


def ridge_filter(img: jnp.ndarray, sigma: float = 2.0) -> jnp.ndarray:
    """Ridge detection via Hessian eigenvalues (parity:
    cv::ximgproc::RidgeDetectionFilter)."""
    g = filters.gaussian_blur(img, sigma)
    gy, gx = filters.gradients(g)
    gyy, gyx = filters.gradients(gy)
    gxy, gxx = filters.gradients(gx)
    # larger |eigenvalue| of [[gxx, gxy], [gxy, gyy]]
    tr = gxx + gyy
    det = gxx * gyy - gxy * gxy
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    l1 = tr / 2.0 + disc
    l2 = tr / 2.0 - disc
    return jnp.where(jnp.abs(l1) > jnp.abs(l2), l1, l2)
