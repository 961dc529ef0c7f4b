"""Sparse-observation bundle adjustment (the 5k-image-scale layout).

The dense (C, P) observation grid of ba.bundle is memory-infeasible at the
BASELINE 5k-camera / 10^5-track configuration (the Jacobian grid alone is
C*P*2*6 floats). Ceres works off CRS sparsity (reference:
sfm/src/libmv/simple_pipeline/bundle.cc:283-299 builds a compressed
residual block list); the TPU-native analog here is a FLAT observation
list with static capacity plus a dual BUCKETED view:

  obs_cam (N,) int32    camera id per observation
  obs_pt  (N,) int32    point id per observation
  obs_uv  (2, N) f32    pixel measurement (channels-first, see below)
  obs_ok  (N,) bool     validity (padding rows are False)

  buckets.idx_a (Kc, C) obs row per camera-bucket slot (argsorted by cam)
  buckets.idx_b (Kp, P) obs row per point-bucket slot

TWO TPU-specific design rules drive the layouts:

1. No scatters. TPU scatter-adds over random indices are sort-bound
   (measured 0.5 LM iters/s at 2M obs via jax.ops.segment_sum); with the
   pre-sorted buckets every Hessian-block "segment-sum" becomes gather +
   DENSE einsum reduction.

2. Channels first, owner axis LAST. XLA tiles the two minor dims of every
   f32 buffer to (8, 128); an (N, 2, 6) Jacobian therefore pads 28x
   (21 GB at 2M obs — observed OOM). All big per-observation tensors here
   are (components..., K, N_owner): the padded dims are the big ones, so
   physical = logical size.

The camera system S = U - W V^-1 W^T is never materialized: PCG with the
SCHUR_JACOBI block-diagonal preconditioner (the ITERATIVE_SCHUR choice of
bundle.cc:617-623), each matvec two bucketed gather+einsum sweeps.
Memory is O(N + C + P); the obs axis shards over the mesh and GSPMD turns
the bucket reductions into per-shard partials + psum.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import se3
from opencv_contrib_tpu.utils.precision import f32_matmuls


class SparseBAProblem(NamedTuple):
    cameras: jnp.ndarray  # (C, 6) [rvec | tvec]
    points: jnp.ndarray  # (P, 3)
    intr: jnp.ndarray  # (9,)
    obs_cam: jnp.ndarray  # (N,) int32
    obs_pt: jnp.ndarray  # (N,) int32
    obs_uv: jnp.ndarray  # (2, N) channels-first pixels
    obs_ok: jnp.ndarray  # (N,) bool


class SparseBAResult(NamedTuple):
    cameras: jnp.ndarray
    points: jnp.ndarray
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray


class ObsBuckets(NamedTuple):
    """Camera-bucketed view of the flat observation list (transposed:
    bucket-slot axis first, camera axis last — layout rule 2 above).

    Only the camera side is bucketed: camera-block sums become dense
    reductions over the Kc axis and the camera update x broadcasts into
    the buckets with NO gather. Point-block sums go through ONE sorted
    segment-scatter per use (point ids within the flattened bucket order
    are what they are — measured ~21 ms per 2M-row scatter vs ~25 ms per
    gather on v5e, and the A-side needs zero row ops)."""

    idx_a: jnp.ndarray  # (Kc, C) int32 obs row per camera-bucket slot
    ok_a: jnp.ndarray  # (Kc, C) bool


def build_buckets(obs_cam, obs_pt, obs_ok, C: int, P: int,
                  pad_to: int = 8) -> ObsBuckets:
    """Host-side bucket construction (argsort by camera id)."""
    import numpy as np

    obs_cam = np.asarray(obs_cam)
    obs_ok = np.asarray(obs_ok)

    owner = np.where(obs_ok, obs_cam, C)  # padding rows last
    order = np.argsort(owner, kind="stable")
    owner_s = owner[order]
    counts = np.bincount(owner_s, minlength=C + 1)[:C]
    K = max(pad_to, int(-(-max(1, counts.max()) // pad_to) * pad_to))
    idx = np.zeros((C, K), np.int32)
    ok = np.zeros((C, K), bool)
    starts = np.concatenate([[0], np.cumsum(counts)])
    pos = np.arange(len(order))
    valid = owner_s < C
    slot = pos - starts[np.clip(owner_s, 0, C - 1)]
    idx[owner_s[valid], slot[valid]] = order[valid]
    ok[owner_s[valid], slot[valid]] = True
    return ObsBuckets(jnp.asarray(idx.T), jnp.asarray(ok.T))


def from_dense(problem) -> SparseBAProblem:
    """Convert a dense-grid BAProblem (ba.bundle) to the flat layout.

    Host-side helper (data-dependent size); capacity = #valid entries
    rounded up to a multiple of 1024 for shape reuse across calls.
    """
    import numpy as np

    mask = np.asarray(problem.mask)
    c_idx, p_idx = np.nonzero(mask)
    n = len(c_idx)
    cap = max(1024, int(np.ceil(n / 1024)) * 1024)
    obs_cam = np.zeros(cap, np.int32)
    obs_pt = np.zeros(cap, np.int32)
    obs_uv = np.zeros((2, cap), np.float32)
    obs_ok = np.zeros(cap, bool)
    obs_cam[:n] = c_idx
    obs_pt[:n] = p_idx
    obs_uv[:, :n] = np.asarray(problem.obs)[c_idx, p_idx].T
    obs_ok[:n] = True
    return SparseBAProblem(
        cameras=problem.cameras, points=problem.points, intr=problem.intr,
        obs_cam=jnp.asarray(obs_cam), obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(obs_uv), obs_ok=jnp.asarray(obs_ok),
    )


# ---------------------------------------------------------------------------
# channels-first forward model + Jacobians

def _project_cf(cam_cf: jnp.ndarray, X_cf: jnp.ndarray,
                intr: jnp.ndarray) -> jnp.ndarray:
    """Projection over columns: cam_cf (6, N), X_cf (3, N) -> pixels (2, N).

    Same model as ba.bundle._project_obs (OpenCVReprojectionError,
    bundle.cc:90-160): Rodrigues rotate + translate, normalize, polynomial
    distort, to pixels — written channels-first so no (N, small) buffer is
    ever materialized.
    """
    w, t = cam_cf[:3], cam_cf[3:]
    theta2 = jnp.sum(w * w, axis=0)
    small = theta2 < 1e-8
    theta = jnp.sqrt(theta2 + 1e-24)
    t2s = jnp.where(small, 1.0, theta2)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / t2s)

    def cross(a, b):
        return jnp.stack([a[1] * b[2] - a[2] * b[1],
                          a[2] * b[0] - a[0] * b[2],
                          a[0] * b[1] - a[1] * b[0]])

    wx = cross(w, X_cf)
    wwx = cross(w, wx)
    Xc = X_cf + A * wx + B * wwx + t  # R X + t via Rodrigues
    z = jnp.where(jnp.abs(Xc[2]) < 1e-9, 1e-9, Xc[2])
    x, y = Xc[0] / z, Xc[1] / z
    fx, fy, cx, cy, k1, k2, k3, p1, p2 = (intr[i] for i in range(9))
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([fx * xd + cx, fy * yd + cy])


def _obs_residual_jac_cf(cameras, points, intr, obs_cam, obs_pt, obs_uv,
                         obs_ok):
    """Per-observation residual + Jacobians, channels-first.

    Returns r (2, N), Jc (2, 6, N), Jp (2, 3, N); padding rows zeroed.
    Jacobians by 9 forward-mode JVPs over the column-vectorized projection
    (XLA CSE dedupes the shared primal work).
    """
    cam_cf = cameras.T[:, obs_cam]  # (6, N)
    X_cf = points.T[:, obs_pt]  # (3, N)

    def f(c, X):
        return _project_cf(c, X, intr)

    pred = f(cam_cf, X_cf)
    w = obs_ok.astype(pred.dtype)
    r = (pred - obs_uv) * w

    zc = jnp.zeros_like(cam_cf)
    zx = jnp.zeros_like(X_cf)
    jc_cols = []
    for i in range(6):
        tang = jnp.zeros_like(cam_cf).at[i].set(1.0)
        _, jv = jax.jvp(f, (cam_cf, X_cf), (tang, zx))
        jc_cols.append(jv)
    Jc = jnp.stack(jc_cols, axis=1) * w  # (2, 6, N)
    jp_cols = []
    for i in range(3):
        tang = jnp.zeros_like(X_cf).at[i].set(1.0)
        _, jv = jax.jvp(f, (cam_cf, X_cf), (zc, tang))
        jp_cols.append(jv)
    Jp = jnp.stack(jp_cols, axis=1) * w  # (2, 3, N)
    return r, Jc, Jp


def sparse_cost(cameras, points, intr, obs_cam, obs_pt, obs_uv, obs_ok):
    cam_cf = cameras.T[:, obs_cam]
    X_cf = points.T[:, obs_pt]
    pred = _project_cf(cam_cf, X_cf, intr)
    r = (pred - obs_uv) * obs_ok.astype(pred.dtype)
    return 0.5 * jnp.sum(r * r)


def rms_reprojection_error(problem: SparseBAProblem) -> jnp.ndarray:
    c = sparse_cost(problem.cameras, problem.points, problem.intr,
                    problem.obs_cam, problem.obs_pt, problem.obs_uv,
                    problem.obs_ok)
    n = jnp.maximum(jnp.sum(problem.obs_ok), 1)
    return jnp.sqrt(2.0 * c / n)


# ---------------------------------------------------------------------------
# channels-first 3x3 helpers (V blocks live as (3, 3, P))

def _inv3x3_cf(V: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse of (3, 3, P) via the adjugate (no lapack batch,
    owner axis stays last)."""
    a, b, c = V[0, 0], V[0, 1], V[0, 2]
    d, e, f = V[1, 0], V[1, 1], V[1, 2]
    g, h, i = V[2, 0], V[2, 1], V[2, 2]
    A = e * i - f * h
    B = c * h - b * i
    Cc = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    return jnp.stack([jnp.stack([A, B, Cc]), jnp.stack([D, E, F]),
                      jnp.stack([G, H, I])]) / det


# ---------------------------------------------------------------------------
# implicit-Schur PCG over buckets

def _solve_sparse_pcg(r, Jc, Jp, obs_cam, obs_pt, buckets, lam, cam_free,
                      pt_free, C: int, P: int, n_cg: int):
    """Implicit-Schur PCG over camera buckets.

    Row-op budget (the scarce resource — ~20-25 ms per 2M-row
    gather/scatter on v5e vs ~3 ms for the equivalent dense reduce):
    one packed row-gather + one Vinv gather + two scatters per LM
    iteration, then exactly one scatter (point sums) and one gather
    (vz into buckets) per CG iteration. Everything else is dense
    einsum/elementwise over the (.., Kc, C) bucket layout.
    """
    ia, oka = buckets
    wa = oka.astype(r.dtype)  # (Kc, C)
    N = r.shape[-1]
    Kc, C_ = ia.shape
    M = Kc * C_

    # Pack per-obs values into ONE row-major (N, 20) buffer and gather
    # ROWS. A direct minor-axis gather of the (2, 6, N) channels-first
    # arrays makes XLA materialize a transposed (N, 2, 6) operand copy —
    # 28x tile padding, 8+ GB at 2M obs. Row gathers of the packed buffer
    # need no operand relayout; the (M, 20) output pads only 20->128.
    pack = jnp.concatenate([r.reshape(2, N), Jc.reshape(12, N),
                            Jp.reshape(6, N)], axis=0).T  # (N, 20)
    packA = pack[ia.reshape(-1)].reshape(Kc, C_, 20)
    q = jnp.moveaxis(packA, -1, 0)  # (20, Kc, C)
    rA = q[:2] * wa  # (2, Kc, C)
    JcA = q[2:14].reshape(2, 6, Kc, C_) * wa
    JpA = q[14:20].reshape(2, 3, Kc, C_) * wa
    ptA = obs_pt[ia]  # (Kc, C); invalid slots -> segment P (dropped)
    ptA_seg = jnp.where(oka, ptA, P).reshape(-1)  # (M,)

    def point_sums(vals_cf):
        """Per-point sums of per-obs values: (D, Kc, C) -> (D, P).
        One sorted segment-scatter over the flattened buckets."""
        D = vals_cf.shape[0]
        rows = vals_cf.reshape(D, M).T  # (M, D)
        out = jax.ops.segment_sum(rows, ptA_seg, num_segments=P + 1)
        return out[:P].T  # (D, P)

    # camera blocks: dense reductions over the bucket axis
    U = jnp.einsum("rikc,rjkc->cij", JcA, JcA)  # (C, 6, 6)
    bc = -jnp.einsum("rikc,rkc->ci", JcA, rA)  # (C, 6)

    # point blocks: V (6 unique entries), bp — one fused scatter
    Vu = jnp.stack([jnp.sum(JpA[:, j] * JpA[:, l], axis=0)
                    for j, l in ((0, 0), (0, 1), (0, 2),
                                 (1, 1), (1, 2), (2, 2))])  # (6, Kc, C)
    bpo = -jnp.einsum("rjkc,rkc->jkc", JpA, rA)  # (3, Kc, C)
    sums = point_sums(jnp.concatenate([Vu, bpo], axis=0))  # (9, P)
    V = jnp.stack([jnp.stack([sums[0], sums[1], sums[2]]),
                   jnp.stack([sums[1], sums[3], sums[4]]),
                   jnp.stack([sums[2], sums[4], sums[5]])])  # (3, 3, P)
    bp = sums[6:9]  # (3, P)

    # LM damping (multiplicative) + freeze fixed points
    dU = jnp.maximum(jnp.diagonal(U, axis1=1, axis2=2), 1e-6)
    U = U + jax.vmap(jnp.diag)(lam * dU)
    i3 = jnp.arange(3)
    dV = jnp.maximum(V[i3, i3], 1e-6)  # (3, P)
    V = V.at[i3, i3].add(lam * dV + (~pt_free)[None, :] * 1e12)
    Vinv = _inv3x3_cf(V)  # (3, 3, P)

    free = cam_free.astype(r.dtype)

    def halfdown(x):
        """x (C, 6) -> wx (3, P) = sum_obs Jp^T (Jc x): camera update
        BROADCASTS into the buckets (no gather), point sums scatter."""
        a = jnp.einsum("rikc,ci->rkc", JcA, x)  # (2, Kc, C) per-obs Jc x
        t = jnp.einsum("rjkc,rkc->jkc", JpA, a)  # (3, Kc, C) per-obs Jp^T a
        return point_sums(t)  # (3, P)

    def halfup(vz):
        """vz (3, P) -> (C, 6) = sum_obs Jc^T (Jp vz[pt]): one gather of
        vz into the buckets, then dense reductions."""
        vzA = vz[:, ptA]  # (3, Kc, C)
        t = jnp.einsum("rjkc,jkc->rkc", JpA, vzA)  # (2, Kc, C)
        return jnp.einsum("rikc,rkc->ci", JcA, t)  # (C, 6)

    def matvec(x):  # x (C, 6)
        x = x * free[:, None]
        wx = halfdown(x)
        vz = jnp.einsum("ijp,jp->ip", Vinv, wx)  # (3, P)
        sx = jnp.einsum("cij,cj->ci", U, x) - halfup(vz)
        return sx * free[:, None] + x * (1.0 - free)[:, None]

    # rhs = bc - W V^-1 bp
    vbp = jnp.einsum("ijp,jp->ip", Vinv, bp)  # (3, P)
    rhs = (bc - halfup(vbp)) * free[:, None]

    # SCHUR_JACOBI preconditioner: diag blocks of S. All contractions are
    # elementwise over the buckets (a (k,c)-batched dot_general would
    # relayout its operands into (Kc, C, small, small) padded form).
    VinvA = Vinv[:, :, ptA]  # (3, 3, Kc, C)
    G = jnp.sum(JpA[:, :, None] * VinvA[None], axis=1)  # (2, 3, Kc, C) JpVinv
    H = jnp.sum(G[:, None] * JpA[None], axis=2)  # (2, 2, Kc, C) JpVinvJp^T
    T = jnp.sum(H[:, :, None] * JcA[:, None], axis=0)  # (2, 6, Kc, C)
    WVW = jnp.einsum("sikc,smkc->cim", T, JcA)  # (C, 6, 6)
    Minv = jnp.linalg.inv(U - WVW + 1e-9 * jnp.eye(6)[None])

    def prec(x):
        return jnp.einsum("cij,cj->ci", Minv, x) * free[:, None] + x * (1.0 - free)[:, None]

    x = jnp.zeros_like(rhs)
    res = rhs - matvec(x)
    z = prec(res)
    p = z
    rz = jnp.sum(res * z)

    def cg_body(carry, _):
        x, res, p, rz = carry
        Ap = matvec(p)
        denom = jnp.sum(p * Ap)
        alpha = jnp.where(jnp.abs(denom) > 1e-20, rz / denom, 0.0)
        x = x + alpha * p
        res = res - alpha * Ap
        z = prec(res)
        rz_new = jnp.sum(res * z)
        beta = jnp.where(jnp.abs(rz) > 1e-20, rz_new / rz, 0.0)
        p = z + beta * p
        return (x, res, p, rz_new), None

    (x, _, _, _), _ = jax.lax.scan(cg_body, (x, res, p, rz), None, length=n_cg)
    dcam = x * free[:, None]
    # back-substitute points: dp = V^-1 (bp - W^T dcam)
    wdc = halfdown(dcam)  # (3, P)
    dpt = jnp.einsum("ijp,jp->ip", Vinv, bp - wdc).T * pt_free[:, None]
    return dcam, dpt


def bundle_adjust_sparse(
    problem: SparseBAProblem,
    n_iters: int = 20,
    fix_first_cam: bool = True,
    cam_free: jnp.ndarray | None = None,
    pt_free: jnp.ndarray | None = None,
    lam0: float = 1e-4,
    n_cg: int = 30,
    buckets: ObsBuckets | None = None,
) -> SparseBAResult:
    """LM over the flat observation list; matches ba.bundle.bundle_adjust
    on equivalent problems (see tests/test_ba_sparse.py) while scaling to
    the 5k-camera BASELINE config.

    Buckets are built host-side on first call (pass precomputed ones when
    re-solving the same sparsity pattern)."""
    C = problem.cameras.shape[0]
    P = problem.points.shape[0]
    if buckets is None:
        buckets = build_buckets(problem.obs_cam, problem.obs_pt,
                                problem.obs_ok, C, P)
    return _bundle_adjust_sparse_jit(problem, buckets, n_iters,
                                     fix_first_cam, cam_free, pt_free,
                                     lam0, n_cg)


@f32_matmuls
@partial(jax.jit, static_argnames=("n_iters", "fix_first_cam", "n_cg"))
def _bundle_adjust_sparse_jit(
    problem: SparseBAProblem,
    buckets: ObsBuckets,
    n_iters: int = 20,
    fix_first_cam: bool = True,
    cam_free: jnp.ndarray | None = None,
    pt_free: jnp.ndarray | None = None,
    lam0: float = 1e-4,
    n_cg: int = 30,
) -> SparseBAResult:
    C = problem.cameras.shape[0]
    P = problem.points.shape[0]
    if cam_free is None:
        cam_free = jnp.ones(C, bool)
    if fix_first_cam:
        cam_free = cam_free.at[0].set(False)
    if pt_free is None:
        pt_free = jnp.ones(P, bool)
    # points with no valid observation must not move
    seg = jnp.where(buckets.ok_a, problem.obs_pt[buckets.idx_a], P).reshape(-1)
    pt_nobs = jax.ops.segment_sum(
        jnp.ones_like(seg, jnp.float32), seg, num_segments=P + 1)[:P]
    pt_free = pt_free & (pt_nobs > 0)

    oc, op, uv, ok = problem.obs_cam, problem.obs_pt, problem.obs_uv, problem.obs_ok
    intr = problem.intr

    def total_cost(cams, pts):
        return sparse_cost(cams, pts, intr, oc, op, uv, ok)

    def lm_step(carry, _):
        cams, pts, lam = carry
        r, Jc, Jp = _obs_residual_jac_cf(cams, pts, intr, oc, op, uv, ok)
        dcam, dpt = _solve_sparse_pcg(r, Jc, Jp, oc, op, buckets, lam,
                                      cam_free, pt_free, C, P, n_cg)
        new_cams = cams + dcam
        new_pts = pts + dpt
        c_old = total_cost(cams, pts)
        c_new = total_cost(new_cams, new_pts)
        accept = c_new < c_old
        cams = jnp.where(accept, new_cams, cams)
        pts = jnp.where(accept, new_pts, pts)
        lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-9),
                        jnp.minimum(lam * 4.0, 1e6))
        return (cams, pts, lam), None

    c0 = total_cost(problem.cameras, problem.points)
    (cams, pts, _), _ = jax.lax.scan(
        lm_step, (problem.cameras, problem.points, jnp.asarray(lam0)),
        None, length=n_iters)
    c1 = total_cost(cams, pts)
    return SparseBAResult(cams, pts, c0, c1)


def make_sparse_problem(Rs, ts, points3d, intr, obs_cam, obs_pt, obs_uv,
                        obs_ok) -> SparseBAProblem:
    """Pack (R, t) pose arrays into the angle-axis flat-obs layout.

    obs_uv accepted as (N, 2) or (2, N); stored channels-first.
    """
    rvecs = se3.log_so3(jnp.asarray(Rs))
    cams = jnp.concatenate([rvecs, jnp.asarray(ts)], axis=-1)
    uv = jnp.asarray(obs_uv)
    if uv.ndim == 2 and uv.shape[0] != 2:
        uv = uv.T
    return SparseBAProblem(
        cams, jnp.asarray(points3d), jnp.asarray(intr),
        jnp.asarray(obs_cam, jnp.int32), jnp.asarray(obs_pt, jnp.int32),
        uv, jnp.asarray(obs_ok),
    )
