"""BRISQUE natural-scene statistics (quality/src/quality_brisque.cpp
feature-extraction stage): MSCN coefficients + AGGD fits over 4 pairwise
products at 2 scales -> 36-dim feature vector."""

from __future__ import annotations

import jax.numpy as jnp

from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.ops.image import resize


def mscn_coefficients(img: jnp.ndarray, sigma: float = 7.0 / 6.0) -> jnp.ndarray:
    """Mean-subtracted contrast-normalized coefficients."""
    mu = filters.gaussian_blur(img, sigma)
    var = filters.gaussian_blur(img * img, sigma) - mu * mu
    return (img - mu) / (jnp.sqrt(jnp.maximum(var, 0.0)) + 1.0)


def _ggd_params(x: jnp.ndarray):
    """Moment-matched generalized-gaussian (alpha, sigma) estimate."""
    sigma2 = jnp.mean(x * x)
    E = jnp.mean(jnp.abs(x))
    rho = sigma2 / jnp.maximum(E * E, 1e-12)
    # gamma-ratio lookup solved by moment matching on a dense grid
    gam = jnp.arange(0.2, 10.0, 0.01)
    import jax.scipy.special as sps

    r_gam = jnp.exp(sps.gammaln(1.0 / gam) + sps.gammaln(3.0 / gam) - 2.0 * sps.gammaln(2.0 / gam))
    alpha = gam[jnp.argmin(jnp.abs(r_gam - rho))]
    return alpha, jnp.sqrt(sigma2)


def _aggd_params(x: jnp.ndarray):
    """Asymmetric GGD fit -> (alpha, mean, sigma_l, sigma_r)."""
    left = x * (x < 0)
    right = x * (x > 0)
    nl = jnp.maximum(jnp.sum(x < 0), 1)
    nr = jnp.maximum(jnp.sum(x > 0), 1)
    sigma_l = jnp.sqrt(jnp.sum(left * left) / nl)
    sigma_r = jnp.sqrt(jnp.sum(right * right) / nr)
    gamma_hat = sigma_l / jnp.maximum(sigma_r, 1e-12)
    E = jnp.mean(jnp.abs(x))
    rho = jnp.mean(x * x) / jnp.maximum(E * E, 1e-12)
    rhat = rho * (gamma_hat**3 + 1) * (gamma_hat + 1) / jnp.maximum((gamma_hat**2 + 1) ** 2, 1e-12)
    gam = jnp.arange(0.2, 10.0, 0.01)
    import jax.scipy.special as sps

    r_gam = jnp.exp(sps.gammaln(2.0 / gam) * 2 - sps.gammaln(1.0 / gam) - sps.gammaln(3.0 / gam))
    rr = 1.0 / jnp.maximum(r_gam, 1e-12)
    alpha = gam[jnp.argmin(jnp.abs(rr - rhat))]
    const = jnp.exp(sps.gammaln(1.0 / alpha) - sps.gammaln(2.0 / alpha))
    mean = (sigma_r - sigma_l) * const
    return alpha, mean, sigma_l, sigma_r


def brisque_features(img: jnp.ndarray) -> jnp.ndarray:
    """36-dim BRISQUE feature vector (18 per scale x 2 scales)."""
    feats = []
    x = img
    for scale in range(2):
        m = mscn_coefficients(x)
        a, s = _ggd_params(m)
        feats += [a, s * s]
        for shift in ((0, 1), (1, 0), (1, 1), (1, -1)):
            prod = m * jnp.roll(m, shift, axis=(0, 1))
            al, mu, sl, sr = _aggd_params(prod)
            feats += [al, mu, sl * sl, sr * sr]
        x = resize(x, (x.shape[0] // 2, x.shape[1] // 2))
    return jnp.stack(feats)


def no_reference_score(img: jnp.ndarray, sigma_ref: float = 0.04) -> jnp.ndarray:
    """Simple no-reference quality proxy in [0, 100] (higher = worse) —
    stands in for the reference's trained SVM head. Uses the MSCN energy:
    natural sharp images sit near sigma_ref; blur collapses MSCN energy,
    noise inflates it, both raising |log(sigma/sigma_ref)|."""
    m = mscn_coefficients(img)
    _, s = _ggd_params(m)
    dev = jnp.abs(jnp.log(jnp.maximum(s, 1e-5) / sigma_ref))
    return jnp.clip(25.0 * dev, 0.0, 100.0)
