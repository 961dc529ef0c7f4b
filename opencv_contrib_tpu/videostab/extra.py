"""videostab completion: RANSAC keypoint motion, L1-optimal trajectory,
deblurring, inpainting, wobble suppression.

Reference anchors (videostab):
- global_motion.cpp — MotionEstimatorRansacL2 (::estimate), KeypointBased-
  MotionEstimator; outlier_rejection.cpp TranslationBasedLocalOutlierRejector
- motion_stabilizing.cpp — LpMotionStabilizer (L1-optimal camera path via LP;
  here solved by ADMM on |D1|+|D2|+|D3| with a projected crop constraint —
  same objective, TPU-friendly solver), GaussianMotionFilter (stabilizer.py)
- deblurring.cpp — calcBlurriness, WeightingDeblurer::deblur
- inpainting.cpp — ColorAverageInpainter, ConsistentMosaicInpainter
- wobble_suppression.cpp — MoreAccurateMotionWobbleSuppressor::suppress
  (period-anchored left/right map blending)

All per-frame kernels are jitted; host code only sequences frames.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.ops.image import remap, warp_perspective


# ---------------------------------------------------------------------------
# Keypoint RANSAC global motion (MotionEstimatorRansacL2)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("model", "n_hyps"))
def ransac_motion(pts0: jnp.ndarray, pts1: jnp.ndarray, key,
                  model: str = "similarity", thresh: float = 2.0,
                  n_hyps: int = 256):
    """Global motion from correspondences with vectorized RANSAC (parity:
    MotionEstimatorRansacL2::estimate, global_motion.cpp). All n_hyps
    hypotheses are fit and scored in one vmapped batch. Returns (3, 3)
    homogeneous motion and the inlier mask."""
    N = pts0.shape[0]
    msize = {"translation": 1, "similarity": 2, "affine": 3}[model]
    idx = jax.random.randint(key, (n_hyps, msize), 0, N)

    def fit_minimal(ii):
        a = pts0[ii]
        b = pts1[ii]
        if model == "translation":
            t = (b - a).reshape(2)
            return jnp.array([[1.0, 0.0, t[0]], [0.0, 1.0, t[1]]])
        if model == "similarity":
            # two points determine scale+rotation+translation
            da = a[1] - a[0]
            db = b[1] - b[0]
            den = jnp.maximum(da[0] ** 2 + da[1] ** 2, 1e-9)
            p = (da[0] * db[0] + da[1] * db[1]) / den
            q = (da[0] * db[1] - da[1] * db[0]) / den
            R = jnp.array([[p, -q], [q, p]])
            t = b[0] - R @ a[0]
            return jnp.concatenate([R, t[:, None]], 1)
        # affine: three points
        A = jnp.concatenate([a, jnp.ones((3, 1))], 1)
        sol = jnp.linalg.solve(A + 1e-9 * jnp.eye(3), b)
        return sol.T

    Ms = jax.vmap(fit_minimal)(idx)  # (n_hyps, 2, 3)

    def score(M):
        pred = pts0 @ M[:, :2].T + M[:, 2]
        err = jnp.linalg.norm(pred - pts1, axis=1)
        return (err < thresh).sum()

    scores = jax.vmap(score)(Ms)
    best = Ms[jnp.argmax(scores)]

    # refit on inliers (weighted least squares, weights = inlier mask)
    pred = pts0 @ best[:, :2].T + best[:, 2]
    w = (jnp.linalg.norm(pred - pts1, axis=1) < thresh).astype(jnp.float32)
    ones = jnp.ones((N, 1))
    A = jnp.concatenate([pts0, ones], 1) * w[:, None]
    B = pts1 * w[:, None]
    sol = jnp.linalg.lstsq(A, B)[0].T  # (2, 3)
    M3 = jnp.concatenate([sol, jnp.array([[0.0, 0.0, 1.0]])], 0)
    return M3, w > 0


# ---------------------------------------------------------------------------
# L1-optimal trajectory (LpMotionStabilizer)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_iters",))
def lp_stabilize_trajectory(traj: jnp.ndarray, bound: float = 0.1,
                            w1: float = 1.0, w2: float = 10.0, w3: float = 100.0,
                            rho: float = 50.0, n_iters: int = 150):
    """L1-optimal smoothed camera path (parity: LpMotionStabilizer,
    motion_stabilizing.cpp / Grundmann et al. 2011): minimize
    w1|D1 S| + w2|D2 S| + w3|D3 S| + rho * hinge(|S - C| - bound) over the
    smoothed path S given the original path C (N, P). The reference ships
    this to a CLP linear program; here ADMM with soft-thresholded difference
    variables and a projected crop constraint (CG on the constant SPD inner
    system) reaches the same piecewise-constant/linear/parabolic segments.
    Returns S."""
    C = traj.astype(jnp.float32)
    del rho  # constraint handled by projection
    tau = 1e-2  # tie to the original path (pins the null space)
    pen = 1.0  # ADMM penalty

    def D1(S):
        return S[1:] - S[:-1]

    def D2(S):
        return S[2:] - 2 * S[1:-1] + S[:-2]

    def D3(S):
        return S[3:] - 3 * S[2:-1] + 3 * S[1:-2] - S[:-3]

    def D1t(r, S):
        return jnp.zeros_like(S).at[1:].add(r).at[:-1].add(-r)

    def D2t(r, S):
        return jnp.zeros_like(S).at[2:].add(r).at[1:-1].add(-2 * r).at[:-2].add(r)

    def D3t(r, S):
        return (jnp.zeros_like(S).at[3:].add(r).at[2:-1].add(-3 * r)
                .at[1:-2].add(3 * r).at[:-3].add(-r))

    def A(S):  # tau*I + pen * sum_k D_k^T D_k  (constant SPD operator)
        return tau * S + pen * (D1t(D1(S), S) + D2t(D2(S), S) + D3t(D3(S), S))

    def cg(b, x0, iters=25):
        def body(carry, _):
            x, r, p, rs = carry
            Ap = A(p)
            alpha = rs / jnp.maximum((p * Ap).sum(), 1e-12)
            x = x + alpha * p
            r = r - alpha * Ap
            rs2 = (r * r).sum()
            p = r + (rs2 / jnp.maximum(rs, 1e-12)) * p
            return (x, r, p, rs2), None

        r0 = b - A(x0)
        (x, _, _, _), _ = jax.lax.scan(body, (x0, r0, r0, (r0 * r0).sum()),
                                       None, length=iters)
        return x

    def soft(x, t):
        return jnp.sign(x) * jnp.maximum(jnp.abs(x) - t, 0.0)

    def admm_body(carry, _):
        S, z1, z2, z3, u1, u2, u3 = carry
        b = tau * C + pen * (D1t(z1 - u1, S) + D2t(z2 - u2, S) + D3t(z3 - u3, S))
        S = cg(b, S)
        S = jnp.clip(S, C - bound, C + bound)  # crop-window projection
        d1, d2, d3 = D1(S), D2(S), D3(S)
        z1 = soft(d1 + u1, w1 / pen)
        z2 = soft(d2 + u2, w2 / pen)
        z3 = soft(d3 + u3, w3 / pen)
        u1 = u1 + d1 - z1
        u2 = u2 + d2 - z2
        u3 = u3 + d3 - z3
        return (S, z1, z2, z3, u1, u2, u3), None

    S0 = C
    init = (S0, D1(S0), D2(S0), D3(S0),
            jnp.zeros_like(D1(S0)), jnp.zeros_like(D2(S0)), jnp.zeros_like(D3(S0)))
    out, _ = jax.lax.scan(admm_body, init, None, length=n_iters)
    return out[0]


# ---------------------------------------------------------------------------
# Deblurring
# ---------------------------------------------------------------------------


@jax.jit
def calc_blurriness(frame: jnp.ndarray) -> jnp.ndarray:
    """Inverse gradient energy (parity: cv::videostab::calcBlurriness,
    deblurring.cpp): smaller = sharper."""
    gy, gx = filters.gradients(frame.astype(jnp.float32))
    H, W = frame.shape[:2]
    return 1.0 / jnp.maximum((gx * gx + gy * gy).sum() / (H * W), 1e-12)


def weighting_deblur(frames, motions, idx: int, radius: int = 2,
                     sensitivity: float = 0.1):
    """Deblur frame idx by accumulating sharper neighbors warped into its
    coordinates (parity: WeightingDeblurer::deblur, deblurring.cpp).
    motions[i] is the (3, 3) map from frame i to frame i+1 coordinates."""
    frames = [jnp.asarray(f, jnp.float32) for f in frames]
    n = len(frames)
    b = jnp.stack([calc_blurriness(f) for f in frames])
    acc = frames[idx]
    wsum = jnp.ones(())
    for j in range(max(0, idx - radius), min(n, idx + radius + 1)):
        if j == idx:
            continue
        # weight grows when neighbor j is sharper than idx
        w = jnp.clip(b[idx] / jnp.maximum(b[j], 1e-12) - 1.0, 0.0, 2.0)
        w = jnp.where(w > sensitivity, w, 0.0)
        M = _chain_motion(motions, j, idx)  # j -> idx coordinates
        warped = warp_perspective(frames[j], jnp.linalg.inv(M))
        acc = acc + w * warped
        wsum = wsum + w
    return acc / wsum


def _chain_motion(motions, src: int, dst: int):
    """Compose the (3, 3) chain mapping frame src coords -> frame dst coords
    (getMotion semantics, global_motion.cpp)."""
    M = jnp.eye(3)
    if src < dst:
        for k in range(src, dst):
            M = jnp.asarray(motions[k], jnp.float32) @ M
    else:
        for k in range(dst, src):
            M = jnp.asarray(motions[k], jnp.float32) @ M
        M = jnp.linalg.inv(M)
    return M


# ---------------------------------------------------------------------------
# Inpainting
# ---------------------------------------------------------------------------


def color_average_inpaint(frame: jnp.ndarray, mask: jnp.ndarray,
                          n_iters: int = 50) -> jnp.ndarray:
    """Fill masked pixels by iterative neighbor averaging (parity:
    ColorAverageInpainter, inpainting.cpp — the reference pushes FMM-ordered
    averages; fixed-point diffusion converges to the same harmonic fill)."""
    f = jnp.asarray(frame, jnp.float32)
    m = jnp.asarray(mask, bool)

    def body(x, _):
        avg = (jnp.roll(x, 1, 0) + jnp.roll(x, -1, 0)
               + jnp.roll(x, 1, 1) + jnp.roll(x, -1, 1)) / 4.0
        return jnp.where(m, avg, f), None

    out, _ = jax.lax.scan(body, jnp.where(m, f.mean(), f), None, length=n_iters)
    return out


def consistent_mosaic_inpaint(frames, motions, idx: int, mask,
                              radius: int = 2, stdev_thresh: float = 20.0):
    """Fill frame idx's masked pixels with the per-pixel median of the
    neighboring frames warped into its coordinates (parity:
    ConsistentMosaicInpainter, inpainting.cpp)."""
    f = jnp.asarray(frames[idx], jnp.float32)
    n = len(frames)
    stack = []
    for j in range(max(0, idx - radius), min(n, idx + radius + 1)):
        M = _chain_motion(motions, j, idx)
        stack.append(warp_perspective(jnp.asarray(frames[j], jnp.float32),
                                      jnp.linalg.inv(M)))
    S = jnp.stack(stack)  # (K, H, W)
    med = jnp.median(S, axis=0)
    std = S.std(axis=0)
    fill = jnp.where(std < stdev_thresh, med, f)
    return jnp.where(jnp.asarray(mask, bool), fill, f)


# ---------------------------------------------------------------------------
# Wobble suppression
# ---------------------------------------------------------------------------


def wobble_suppress(frame, idx: int, period: int, motions, motions2,
                    stab_motion):
    """Suppress rolling-shutter wobble for frame idx (parity:
    MoreAccurateMotionWobbleSuppressor::suppress, wobble_suppression.cpp):
    anchor frames every `period`; warp maps from the pass-1 (motions) vs
    pass-2 (motions2) chains at the left/right anchors, blended by temporal
    distance."""
    n = len(motions) + 1
    if idx % period == 0:
        return jnp.asarray(frame, jnp.float32)
    k1 = idx // period * period
    k2 = min(k1 + period, n - 1)
    S1 = jnp.asarray(stab_motion, jnp.float32)
    S1i = jnp.linalg.inv(S1)
    ML = S1 @ _chain_motion(motions2, k1, idx) @ jnp.linalg.inv(
        _chain_motion(motions, k1, idx)) @ S1i
    MR = S1 @ jnp.linalg.inv(_chain_motion(motions2, idx, k2)) @ _chain_motion(
        motions, idx, k2) @ S1i
    return _wobble_remap(jnp.asarray(frame, jnp.float32), ML, MR,
                         float(idx - k1), float(k2 - idx))


@jax.jit
def _wobble_remap(frame, ML, MR, wl, wr):
    H, W = frame.shape[:2]
    ys, xs = jnp.mgrid[0:H, 0:W].astype(jnp.float32)

    def apply(M):
        z = M[2, 0] * xs + M[2, 1] * ys + M[2, 2]
        z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        return ((M[1, 0] * xs + M[1, 1] * ys + M[1, 2]) / z,
                (M[0, 0] * xs + M[0, 1] * ys + M[0, 2]) / z)

    yl, xl = apply(ML)
    yr, xr = apply(MR)
    tot = jnp.maximum(wl + wr, 1e-9)
    my = (wl * yl + wr * yr) / tot
    mx = (wl * xl + wr * xr) / tot
    return remap(frame, my, mx)
