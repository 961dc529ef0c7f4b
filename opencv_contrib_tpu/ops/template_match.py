"""Template matching (cudaimgproc's TemplateMatching role).

Reference anchor: cudaimgproc/src/match_template.cpp (+cuda kernels):
TM_CCORR/TM_SQDIFF/TM_CCOEFF with _NORMED variants, FFT path for large
templates.

TPU-first: cross-correlation IS a convolution — one lax conv on the MXU
(or FFT for large templates); the normalization terms (local sums and
sums-of-squares of the image under the template window) come from two
integral images, so every mode is a couple of fused elementwise maps over
the correlation surface.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _window_sums(img, th, tw):
    """Box sums and sums-of-squares of all (th, tw) windows via integral
    images. Returns (s1, s2) of shape (H-th+1, W-tw+1)."""
    def ii(x):
        c = jnp.cumsum(jnp.cumsum(x, 0), 1)
        return jnp.pad(c, ((1, 0), (1, 0)))

    i1, i2 = ii(img), ii(img * img)

    def box(i):
        return i[th:, tw:] - i[:-th, tw:] - i[th:, :-tw] + i[:-th, :-tw]

    return box(i1), box(i2)


@partial(jax.jit, static_argnames=("method",))
def match_template(img, tmpl, method: str = "ccoeff_normed"):
    """Match tmpl over img. Methods: ccorr, sqdiff, ccoeff (+ _normed
    variants via 'xxx_normed'). Returns the (H-th+1, W-tw+1) response map
    (max = best for ccorr/ccoeff, min = best for sqdiff)."""
    img = jnp.asarray(img, jnp.float32)
    tmpl = jnp.asarray(tmpl, jnp.float32)
    th, tw = tmpl.shape
    n = th * tw

    # raw cross-correlation on the MXU
    x = img[None, None]
    k = tmpl[None, None]
    ccorr = jax.lax.conv_general_dilated(x, k, (1, 1), "VALID")[0, 0]

    s1, s2 = _window_sums(img, th, tw)
    t_sum = tmpl.sum()
    t_sq = (tmpl * tmpl).sum()

    base = method.replace("_normed", "")
    normed = method.endswith("_normed")
    if base == "ccorr":
        r = ccorr
        if normed:
            r = r / jnp.sqrt(jnp.maximum(s2 * t_sq, 1e-12))
    elif base == "sqdiff":
        r = s2 - 2.0 * ccorr + t_sq
        if normed:
            r = r / jnp.sqrt(jnp.maximum(s2 * t_sq, 1e-12))
    elif base == "ccoeff":
        r = ccorr - s1 * (t_sum / n)
        if normed:
            var_i = jnp.maximum(s2 - s1 * s1 / n, 1e-12)
            var_t = jnp.maximum(t_sq - t_sum * t_sum / n, 1e-12)
            r = r / jnp.sqrt(var_i * var_t)
    else:
        raise ValueError(f"unknown method {method}")
    return r


def min_max_loc(resp):
    """(min_val, max_val, min_loc (y, x), max_loc (y, x)) like cv::minMaxLoc."""
    import numpy as np

    r = jnp.asarray(resp)
    amax = jnp.argmax(r)
    amin = jnp.argmin(r)
    H, W = r.shape
    mx = np.unravel_index(int(amax), (H, W))
    mn = np.unravel_index(int(amin), (H, W))
    return float(r.reshape(-1)[amin]), float(r.reshape(-1)[amax]), mn, mx
