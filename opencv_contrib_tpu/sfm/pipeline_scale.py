"""Incremental SfM at the 5k-image scale (sparse tracks, windowed BA).

The dense-grid driver (sfm/pipeline.py) mirrors libmv's fixpoint loop
(pipeline.cc:138-264) on a (V, T) observation tensor — memory-infeasible
past a few hundred views. This module is the scalable twin for sequential
captures: the BASELINE "distributed SfM, 5k images" configuration.

Reference parity:
- incremental resect -> intersect -> bundle structure:
  sfm/src/libmv/simple_pipeline/pipeline.cc:138-264
- two-frame init: initialize_reconstruction.cc:53-94
- bundle: bundle.cc:450 (here ba.sparse — the ITERATIVE_SCHUR analog)

TPU-first redesign (not a translation):
- SparseTracks stores observations in (V, K) SLOT form: K static
  observation slots per view — simultaneously (a) the frontend's natural
  output shape (top-K keypoints per image), (b) the flat observation list
  of ba.sparse after one reshape, and (c) already camera-bucketed.
- the ENTIRE map state (poses, points, first-sighting table) is
  device-resident (`MapState`); views are registered in CHUNKED
  `lax.scan` programs — one dispatch per `ba_every` views, so the host
  <-> device round-trip count is O(V / ba_every), not O(V). (Per-view
  dispatch through the TPU tunnel costs ~80 ms sync + ~500 ms per scalar
  readback; at 5k views the chunked driver is ~100x fewer round-trips.)
- per-view work inside the scan: masked robust PnP (vmapped-hypothesis
  RANSAC) + motion-model fallback, closed-form pairwise midpoint
  triangulation, first-sighting bookkeeping — all branchless with
  `mode="drop"` scatters.
- BA schedule: windowed local BA (device-side, uncompacted (T,) point
  axis, slot-trivial buckets) after every chunk + periodic/final global
  sparse BA — the schedule answer to O(V) full Ceres solves; the global
  solve shards over a mesh via parallel.dist_ba when one is given.
- tracking loss re-initializes a NEW SEGMENT with a fresh scale gauge
  (the KinFu update()->false + reset analog); views/points of different
  segments never share a BA problem.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ba import sparse as sba
from opencv_contrib_tpu.core import camera as cam
from opencv_contrib_tpu.core import se3
from opencv_contrib_tpu.mvg import fundamental, resection, robust, triangulation
from opencv_contrib_tpu.utils.precision import f32_matmuls
from opencv_contrib_tpu.utils.tracing import trace_span


class SparseTracks(NamedTuple):
    """Per-view observation slots (see module docstring)."""

    tid: np.ndarray  # (V, K) int32
    uv: np.ndarray  # (V, K, 2) float32 pixels
    ok: np.ndarray  # (V, K) bool
    n_tracks: int

    @property
    def n_views(self) -> int:
        return self.tid.shape[0]

    @property
    def slots(self) -> int:
        return self.tid.shape[1]


def from_sequence_scene(scene) -> SparseTracks:
    return SparseTracks(tid=scene.tid, uv=scene.uv, ok=scene.ok,
                        n_tracks=scene.n_tracks)


class MapState(NamedTuple):
    """Device-resident reconstruction state."""

    Rs: jnp.ndarray  # (V, 3, 3)
    ts: jnp.ndarray  # (V, 3)
    registered: jnp.ndarray  # (V,) bool
    seg_of_view: jnp.ndarray  # (V,) int32, -1 = unregistered
    points: jnp.ndarray  # (T, 3)
    has_point: jnp.ndarray  # (T,) bool
    seg_of_point: jnp.ndarray  # (T,) int32
    first_view: jnp.ndarray  # (T,) int32, -1 = unseen
    first_uv: jnp.ndarray  # (T, 2)


@dataclass
class SequentialReconstruction:
    """Host-side result of the scalable driver (EuclideanReconstruction
    store role, reconstruction.h:39-100)."""

    Rs: np.ndarray  # (V, 3, 3)
    ts: np.ndarray  # (V, 3)
    registered: np.ndarray  # (V,) bool
    points: np.ndarray  # (T, 3)
    has_point: np.ndarray  # (T,) bool
    intr: np.ndarray  # (9,)
    seg_of_view: np.ndarray = None  # (V,) int32
    seg_of_point: np.ndarray = None  # (T,) int32
    n_segments: int = 0
    reg_order: list = field(default_factory=list)
    log: list = field(default_factory=list)

    def reprojection_mean_px(self, tracks: SparseTracks) -> float:
        """Mean per-marker reprojection error over registered views and
        same-segment reconstructed points (the libmv error metric,
        pipeline.cc:266-318). One batched device call."""
        s, n = _reproj_sums_jit(
            jnp.asarray(self.Rs), jnp.asarray(self.ts),
            jnp.asarray(self.registered), jnp.asarray(self.seg_of_view),
            jnp.asarray(self.points), jnp.asarray(self.has_point),
            jnp.asarray(self.seg_of_point), jnp.asarray(tracks.tid),
            jnp.asarray(tracks.uv), jnp.asarray(tracks.ok),
            jnp.asarray(self.intr))
        # block BEFORE converting: np.asarray on a not-yet-ready tunnel
        # array takes a pathologically slow path (seconds vs ~50 ms)
        out = jnp.stack([s, n])
        jax.block_until_ready(out)
        out = np.asarray(out)
        return float(out[0]) / max(float(out[1]), 1.0)


@f32_matmuls
@jax.jit
def _slot_err_jit(st: MapState, tid, uv, ok, intr):
    """Per-slot reprojection error in px ((V, K); +inf where not a valid
    same-segment reconstructed observation). Feeds outlier pruning before
    the final bundle (the reference drops such markers through its
    intersect gates, intersect.cc:131-149)."""
    X = st.points[tid]
    Xc = jnp.einsum("vij,vkj->vki", st.Rs, X) + st.ts[:, None, :]
    z = jnp.where(jnp.abs(Xc[..., 2]) < 1e-9, 1e-9, Xc[..., 2])
    xn = Xc[..., :2] / z[..., None]
    px = cam.denormalize_points(intr, cam.distort(intr, xn))
    m = (ok & st.registered[:, None] & st.has_point[tid]
         & (st.seg_of_point[tid] == st.seg_of_view[:, None]) & (z > 1e-3))
    e = jnp.linalg.norm(px - uv, axis=-1)
    return jnp.where(m, e, jnp.inf)


@f32_matmuls
@jax.jit
def _reproj_sums_jit(Rs, ts, registered, seg_of_view, points, has_point,
                     seg_of_point, tid, uv, ok, intr):
    X = points[tid]  # (V, K, 3)
    Xc = jnp.einsum("vij,vkj->vki", Rs, X) + ts[:, None, :]
    z = jnp.where(jnp.abs(Xc[..., 2]) < 1e-9, 1e-9, Xc[..., 2])
    xn = Xc[..., :2] / z[..., None]
    px = cam.denormalize_points(intr, cam.distort(intr, xn))
    m = (ok & registered[:, None] & has_point[tid]
         & (seg_of_point[tid] == seg_of_view[:, None]) & (z > 1e-3))
    e = jnp.linalg.norm(px - uv, axis=-1)
    return jnp.sum(jnp.where(m, e, 0.0)), jnp.sum(m)


# ---------------------------------------------------------------------------
# traced cores (shared by the chunked scan)


def _register_core(key, X, uvv, have, intr, R_prior, t_prior):
    """Robust PnP + GN refine with a motion-model fallback (EuclideanResect
    role, resect.cc:94-157; the prior path is the frame-to-frame odometry
    analog for smooth sequences). Returns (R, t, n_inliers)."""
    xn = cam.undistort(intr, cam.normalize_points(intr, uvv))
    res = robust.pnp_robust(key, X, xn, threshold=0.01, mask=have)
    R1, t1, _ = resection.refine_pose(
        res.model[:, :3], res.model[:, 3], X, xn, res.inliers & have, iters=8)

    def inl_count(R, t):
        r = resection.reprojection_residuals(R, t, X, xn, have)
        return jnp.sum(have & (jnp.sum(r * r, axis=-1) < 0.01**2))

    # fallback: refine from the prior pose with widening-then-tightening
    # inlier gates (pure device work, so always computed; `where`-selected)
    def body(carry, thr):
        R, t = carry
        r = resection.reprojection_residuals(R, t, X, xn, have)
        inl = have & (jnp.sum(r * r, axis=-1) < thr * thr)
        R, t, _ = resection.refine_pose(R, t, X, xn, inl, iters=4)
        return (R, t), None

    (R2, t2), _ = jax.lax.scan(body, (R_prior, t_prior),
                               jnp.asarray([0.05, 0.02, 0.01], jnp.float32))
    n1, n2 = inl_count(R1, t1), inl_count(R2, t2)
    better2 = n2 > n1
    R = jnp.where(better2, R2, R1)
    t = jnp.where(better2, t2, t1)
    return R, t, jnp.maximum(n1, n2)


def _triangulate_core(uva, uvb, Ra, ta, Rb, tb, cand, intr, max_err_n,
                      min_par_cos):
    """Midpoint triangulation of K tracks from per-slot first-view poses
    (Ra, ta) and the current view (Rb, tb) — the batched EuclideanIntersect
    (intersect.cc:69-149) in closed form."""
    xa = cam.undistort(intr, cam.normalize_points(intr, uva))
    xb = cam.undistort(intr, cam.normalize_points(intr, uvb))
    ha = jnp.concatenate([xa, jnp.ones_like(xa[:, :1])], axis=-1)
    hb = jnp.concatenate([xb, jnp.ones_like(xb[:, :1])], axis=-1)
    da = jnp.einsum("kji,kj->ki", Ra, ha)  # world rays
    oa = -jnp.einsum("kji,kj->ki", Ra, ta)
    db = jnp.einsum("ji,kj->ki", Rb, hb)
    ob = jnp.broadcast_to(-Rb.T @ tb, da.shape)

    a = jnp.sum(da * da, axis=-1)
    b = -jnp.sum(da * db, axis=-1)
    c = jnp.sum(db * db, axis=-1)
    d = ob - oa
    e1 = jnp.sum(da * d, axis=-1)
    e2 = -jnp.sum(db * d, axis=-1)
    det = a * c - b * b
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    s = (c * e1 - b * e2) / det
    u = (a * e2 - b * e1) / det
    X = 0.5 * (oa + da * s[:, None] + ob + db * u[:, None])

    Xa = jnp.einsum("kij,kj->ki", Ra, X) + ta
    Xb = X @ Rb.T + tb
    za, zb = Xa[:, 2], Xb[:, 2]
    ea = jnp.sum((Xa[:, :2] / jnp.where(jnp.abs(za) < 1e-9, 1e-9, za)[:, None] - xa) ** 2, axis=-1)
    eb = jnp.sum((Xb[:, :2] / jnp.where(jnp.abs(zb) < 1e-9, 1e-9, zb)[:, None] - xb) ** 2, axis=-1)
    na = da / jnp.maximum(jnp.linalg.norm(da, axis=-1, keepdims=True), 1e-12)
    nb = db / jnp.maximum(jnp.linalg.norm(db, axis=-1, keepdims=True), 1e-12)
    cosang = jnp.sum(na * nb, axis=-1)
    accept = (cand & (za > 1e-3) & (zb > 1e-3)
              & (ea < max_err_n**2) & (eb < max_err_n**2)
              & (cosang < min_par_cos))
    return X, accept


# ---------------------------------------------------------------------------
# the chunked registration program: n_steps views per dispatch


@f32_matmuls
@partial(jax.jit, static_argnames=("n_steps", "min_inliers", "min_gap"))
def _chunk_register_jit(st: MapState, tid, uv, ok, v0, seg, prev, key, intr,
                        max_err_n, min_par_cos, n_steps: int,
                        min_inliers: int, min_gap: int):
    """Register views v0..v0+n_steps-1 into the device-resident map.

    Per view: robust PnP (+ prior fallback) -> pose update -> first-
    sighting bookkeeping -> pairwise midpoint triangulation. Branchless;
    failed views leave the state untouched. Returns per-view flags
    (newly_registered, n_inliers, n_have) for the host scheduler.
    """
    V = tid.shape[0]
    T = st.points.shape[0]
    min_have = max(min_inliers, 6)

    def step(carry, i):
        st, prev = carry
        v = v0 + i
        valid = v < V
        vc = jnp.minimum(v, V - 1)
        tidv = tid[vc]
        okv = ok[vc] & valid
        uvv = uv[vc]
        have = okv & st.has_point[tidv] & (st.seg_of_point[tidv] == seg)
        n_have = jnp.sum(have)
        X = st.points[tidv]
        kv = jax.random.fold_in(key, v)
        R, t, n_inl = _register_core(kv, X, uvv, have, intr,
                                     st.Rs[prev], st.ts[prev])
        already = st.registered[vc]
        ok_reg = (valid & (~already) & (n_have >= min_have)
                  & (n_inl >= min_inliers))

        Rv = jnp.where(ok_reg, R, st.Rs[vc])
        tv = jnp.where(ok_reg, t, st.ts[vc])
        st = st._replace(
            Rs=st.Rs.at[vc].set(Rv),
            ts=st.ts.at[vc].set(tv),
            registered=st.registered.at[vc].set(ok_reg | already),
            seg_of_view=st.seg_of_view.at[vc].set(
                jnp.where(ok_reg, seg, st.seg_of_view[vc])),
        )
        prev = jnp.where(ok_reg, vc, prev)

        # first-sighting bookkeeping: claim when unseen, when the anchor
        # is from another segment, or when THIS view is earlier than the
        # recorded sighting (the init pair's later view pre-claims tracks
        # the views between the pair see first — earliest wins)
        fv_t = st.first_view[tidv]
        fv_safe = jnp.maximum(fv_t, 0)
        stale = ((fv_t < 0) | (st.seg_of_view[fv_safe] != seg)
                 | (v < fv_t))
        upd = okv & ok_reg & stale
        upd_idx = jnp.where(upd, tidv, T)
        st = st._replace(
            first_view=st.first_view.at[upd_idx].set(v, mode="drop"),
            first_uv=st.first_uv.at[upd_idx].set(uvv, mode="drop"),
        )

        # triangulate tracks first seen >= min_gap views ago in-segment
        fv_t = st.first_view[tidv]
        fv_safe = jnp.maximum(fv_t, 0)
        cand = (okv & ok_reg
                & ~(st.has_point[tidv] & (st.seg_of_point[tidv] == seg))
                & (fv_t >= 0) & (fv_t <= v - min_gap)
                & (st.seg_of_view[fv_safe] == seg)
                & st.registered[fv_safe])
        Xn, acc = _triangulate_core(
            st.first_uv[tidv], uvv, st.Rs[fv_safe], st.ts[fv_safe],
            Rv, tv, cand, intr, max_err_n, min_par_cos)
        acc_idx = jnp.where(acc, tidv, T)
        st = st._replace(
            points=st.points.at[acc_idx].set(Xn, mode="drop"),
            has_point=st.has_point.at[acc_idx].set(True, mode="drop"),
            seg_of_point=st.seg_of_point.at[acc_idx].set(seg, mode="drop"),
        )
        flags = jnp.stack([ok_reg.astype(jnp.int32), n_inl.astype(jnp.int32),
                           n_have.astype(jnp.int32),
                           already.astype(jnp.int32)])
        return (st, prev), flags

    (st, prev), flags = jax.lax.scan(
        step, (st, prev), jnp.arange(n_steps, dtype=jnp.int32))
    return st, prev, flags


# ---------------------------------------------------------------------------
# device-side BA wrappers (uncompacted (T,) point axis; slot buckets)


@f32_matmuls
@partial(jax.jit, static_argnames=("W", "n_iters", "n_cg"))
def _windowed_ba_jit(st: MapState, tid, uv, ok, vids, cam_free, live, seg,
                     intr, W: int, n_iters: int, n_cg: int):
    """Local BA over the window views `vids` (W,) — device-side assembly,
    full (T,) point axis (the solver freezes unobserved points itself),
    slot-trivial buckets. Gauge: cam_free already anchors two views; `live`
    masks padding rows (short windows repeat the last vid)."""
    K = tid.shape[1]
    V = st.Rs.shape[0]
    tidw = tid[vids]  # (W, K)
    okw = (ok[vids] & cam_free_obs_mask(st, tidw, seg)
           & st.registered[vids][:, None] & live[:, None])
    cams = jnp.concatenate([se3.log_so3(st.Rs[vids]), st.ts[vids]], axis=-1)
    prob = sba.SparseBAProblem(
        cameras=cams, points=st.points, intr=intr,
        obs_cam=jnp.repeat(jnp.arange(W, dtype=jnp.int32), K),
        obs_pt=tidw.reshape(-1),
        obs_uv=uv[vids].reshape(-1, 2).T,
        obs_ok=okw.reshape(-1),
    )
    buckets = sba.ObsBuckets(
        jnp.arange(W * K, dtype=jnp.int32).reshape(W, K).T, okw.T)
    res = sba._bundle_adjust_sparse_jit(
        prob, buckets, n_iters, False, cam_free,
        st.has_point & (st.seg_of_point == seg), 1e-4, n_cg)
    widx = jnp.where(cam_free, vids, V)
    return st._replace(
        Rs=st.Rs.at[widx].set(se3.exp_so3(res.cameras[:, :3]), mode="drop"),
        ts=st.ts.at[widx].set(res.cameras[:, 3:], mode="drop"),
        points=res.points,
    )


def cam_free_obs_mask(st: MapState, tidw, seg):
    return st.has_point[tidw] & (st.seg_of_point[tidw] == seg)


def build_track_major(tracks: SparseTracks):
    """Host-side transpose of the (V, K) slot table into track-major form:
    per track, the views observing it and the pixel there. Built once;
    feeds the global re-intersection pass."""
    V, K = tracks.tid.shape
    T = tracks.n_tracks
    vv, kk = np.nonzero(tracks.ok)
    tt = tracks.tid[vv, kk]
    order = np.argsort(tt, kind="stable")
    tt_s, vv_s, kk_s = tt[order], vv[order], kk[order]
    counts = np.bincount(tt_s, minlength=T)
    S = max(int(counts.max()), 2)
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    pos = np.arange(len(tt_s)) - starts[tt_s]
    tm_view = np.zeros((T, S), np.int32)
    tm_uv = np.zeros((T, S, 2), np.float32)
    tm_ok = np.zeros((T, S), bool)
    tm_view[tt_s, pos] = vv_s
    tm_uv[tt_s, pos] = tracks.uv[vv_s, kk_s]
    tm_ok[tt_s, pos] = True
    return tm_view, tm_uv, tm_ok


@f32_matmuls
@partial(jax.jit, static_argnames=("iters",))
def _retriangulate_slice_jit(st: MapState, tm_view, tm_uv, tm_ok, t0, intr,
                             iters: int = 6):
    """Global re-intersection (the libmv fixpoint's intersect step,
    pipeline.cc:151-181) over the track slice [t0, t0+Tc): re-initialize
    every reconstructed point by closed-form midpoint triangulation from
    its WIDEST-baseline pair of same-segment registered observations under
    the CURRENT poses, then Gauss-Newton refine against all of them.
    (A pure GN refine cannot recover points that ran away through a
    near-parallel triangulation earlier in the sequence. Sliced because a
    monolithic (200k, S) program exceeds the tunnel compiler's limits.)"""
    T, S = tm_view.shape
    seg_pt = jax.lax.dynamic_slice(st.seg_of_point, (t0,), (T,))
    has_pt = jax.lax.dynamic_slice(st.has_point, (t0,), (T,))
    pts0 = jax.lax.dynamic_slice(st.points, (t0, 0), (T, 3))
    m = (tm_ok & st.registered[tm_view]
         & (st.seg_of_view[tm_view] == seg_pt[:, None])
         & has_pt[:, None])
    xn = cam.undistort(intr, cam.normalize_points(intr, tm_uv))  # (T, S, 2)
    Rv = st.Rs[tm_view]  # (T, S, 3, 3)
    tv = st.ts[tm_view]  # (T, S, 3)

    # widest observation pair per track (first/last valid slot; slots are
    # in view order from the host-side build)
    first = jnp.argmax(m, axis=1)  # (T,)
    last = S - 1 - jnp.argmax(m[:, ::-1], axis=1)
    take = jax.vmap(lambda a, i: a[i])
    xa, xb = take(xn, first), take(xn, last)  # (T, 2)
    Ra, ta_ = take(Rv, first), take(tv, first)
    Rb, tb_ = take(Rv, last), take(tv, last)
    ha = jnp.concatenate([xa, jnp.ones_like(xa[:, :1])], axis=-1)
    hb = jnp.concatenate([xb, jnp.ones_like(xb[:, :1])], axis=-1)
    da = jnp.einsum("kji,kj->ki", Ra, ha)
    oa = -jnp.einsum("kji,kj->ki", Ra, ta_)
    db = jnp.einsum("kji,kj->ki", Rb, hb)
    ob = -jnp.einsum("kji,kj->ki", Rb, tb_)
    a_ = jnp.sum(da * da, -1)
    b_ = -jnp.sum(da * db, -1)
    c_ = jnp.sum(db * db, -1)
    d_ = ob - oa
    det = a_ * c_ - b_ * b_
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    e1 = jnp.sum(da * d_, -1)
    e2 = -jnp.sum(db * d_, -1)
    s_ = (c_ * e1 - b_ * e2) / det
    u_ = (a_ * e2 - b_ * e1) / det
    Xinit = 0.5 * (oa + da * s_[:, None] + ob + db * u_[:, None])
    # only adopt the re-init when the pair has usable parallax
    na = da / jnp.maximum(jnp.linalg.norm(da, axis=-1, keepdims=True), 1e-12)
    nb = db / jnp.maximum(jnp.linalg.norm(db, axis=-1, keepdims=True), 1e-12)
    par_ok = jnp.sum(na * nb, -1) < jnp.cos(jnp.radians(1.0))
    X0 = jnp.where((par_ok & (last > first))[:, None], Xinit, pts0)

    def gn_step(X, _):
        # residuals + 3x3 normal equations, fully batched
        Xc = jnp.einsum("tsij,tj->tsi", Rv, X) + tv  # (T, S, 3)
        z = jnp.where(jnp.abs(Xc[..., 2]) < 1e-9, 1e-9, Xc[..., 2])
        pred = Xc[..., :2] / z[..., None]
        r = (pred - xn) * m[..., None]  # (T, S, 2)
        invz = 1.0 / z
        # d pred / d Xc
        zero = jnp.zeros_like(z)
        Jp = jnp.stack([
            jnp.stack([invz, zero, -Xc[..., 0] * invz * invz], axis=-1),
            jnp.stack([zero, invz, -Xc[..., 1] * invz * invz], axis=-1),
        ], axis=-2)  # (T, S, 2, 3)
        J = jnp.einsum("tsij,tsjk->tsik", Jp, Rv) * m[..., None, None]
        H = jnp.einsum("tsik,tsil->tkl", J, J) + 1e-8 * jnp.eye(3)
        g = jnp.einsum("tsik,tsi->tk", J, r)
        dX = jnp.linalg.solve(H, g[..., None])[..., 0]
        return X - dX, None

    X, _ = jax.lax.scan(gn_step, X0, None, length=iters)
    n_obs = jnp.sum(m, axis=1)
    keep = (n_obs >= 2) & has_pt & jnp.all(jnp.isfinite(X), axis=-1)
    new_pts = jnp.where(keep[:, None], X, pts0)
    return st._replace(
        points=jax.lax.dynamic_update_slice(st.points, new_pts, (t0, 0)))


def _retriangulate(st: MapState, tmv, tmu, tmo, intr,
                   chunk: int = 32768) -> MapState:
    """Host loop over track slices (one compiled program; the final slice
    overlaps the previous one rather than clamping, which is idempotent)."""
    T = tmv.shape[0]
    Tc = min(chunk, T)
    t0s = list(range(0, T - Tc + 1, Tc))
    if not t0s or t0s[-1] + Tc < T:
        t0s.append(T - Tc)
    for t0 in t0s:
        st = _retriangulate_slice_jit(
            st, tmv[t0:t0 + Tc], tmu[t0:t0 + Tc], tmo[t0:t0 + Tc],
            jnp.asarray(t0, jnp.int32), intr)
    return st


@f32_matmuls
@partial(jax.jit, static_argnames=("n_iters", "n_cg"))
def _global_ba_jit(st: MapState, tid, uv, ok, cam_free, intr,
                   n_iters: int, n_cg: int):
    """Global sparse BA over all registered views (EuclideanBundle role,
    bundle.cc:450) — segment-consistent obs only."""
    V, K = tid.shape
    okg = (ok & st.registered[:, None] & st.has_point[tid]
           & (st.seg_of_point[tid] == st.seg_of_view[:, None]))
    cams = jnp.concatenate([se3.log_so3(st.Rs), st.ts], axis=-1)
    prob = sba.SparseBAProblem(
        cameras=cams, points=st.points, intr=intr,
        obs_cam=jnp.repeat(jnp.arange(V, dtype=jnp.int32), K),
        obs_pt=tid.reshape(-1),
        obs_uv=uv.reshape(-1, 2).T,
        obs_ok=okg.reshape(-1),
    )
    buckets = sba.ObsBuckets(
        jnp.arange(V * K, dtype=jnp.int32).reshape(V, K).T, okg.T)
    res = sba._bundle_adjust_sparse_jit(
        prob, buckets, n_iters, False, cam_free, st.has_point, 1e-4, n_cg)
    widx = jnp.where(cam_free, jnp.arange(V), V)
    return st._replace(
        Rs=st.Rs.at[widx].set(se3.exp_so3(res.cameras[:, :3]), mode="drop"),
        ts=st.ts.at[widx].set(res.cameras[:, 3:], mode="drop"),
        points=res.points,
    )


# ---------------------------------------------------------------------------
# host-side init + state shuttling (rare paths)


@f32_matmuls
def _init_two_view(tracks: SparseTracks, rec: SequentialReconstruction,
                   first_view, first_uv, i: int, j: int, key,
                   base_R=None, base_t=None, seg: int = 0) -> int:
    """Two-frame init (initialize_reconstruction.cc:53-94) on the shared
    tracks of slot-views i and j; returns #triangulated points.

    base_R/base_t place view i (segment re-initialization keeps the new
    segment near the old trajectory; scale is a fresh gauge)."""
    K = tracks.slots
    ti, tj = tracks.tid[i], tracks.tid[j]
    oki, okj = tracks.ok[i], tracks.ok[j]
    common, ia, ja = np.intersect1d(
        np.where(oki, ti, -1), np.where(okj, tj, -2), return_indices=True)
    sel = common >= 0
    ia, ja = ia[sel], ja[sel]
    n = ia.size
    if n < 12:
        return 0
    x1 = np.zeros((K, 2), np.float32)
    x2 = np.zeros((K, 2), np.float32)
    m = np.zeros(K, bool)
    x1[:n] = tracks.uv[i, ia]
    x2[:n] = tracks.uv[j, ja]
    m[:n] = True

    intr_j = jnp.asarray(rec.intr)
    res = robust.fundamental_8pt_robust(
        key, jnp.asarray(x1), jnp.asarray(x2), threshold_px=1.5,
        mask=jnp.asarray(m))
    Kmat = cam.intrinsics_to_K(intr_j)
    E = fundamental.project_to_essential(
        fundamental.essential_from_fundamental(res.model, Kmat, Kmat))
    Rs4, ts4 = fundamental.motions_from_essential(E)
    x1n = cam.undistort(intr_j, cam.normalize_points(intr_j, jnp.asarray(x1)))
    x2n = cam.undistort(intr_j, cam.normalize_points(intr_j, jnp.asarray(x2)))
    inl = res.inliers & jnp.asarray(m)
    R, t, _ = fundamental.choose_motion_cheirality(Rs4, ts4, x1n, x2n, inl)
    X = triangulation.triangulate_midpoint_two_view(x1n, x2n, R, t)
    z1 = np.asarray(X[:, 2])
    Xc2 = np.asarray(se3.rotate_points(R, X) + t)
    good = np.asarray(inl) & (z1 > 1e-3) & (Xc2[:, 2] > 1e-3)
    if int(good.sum()) < 12:
        return int(good.sum())  # commit nothing on a failed attempt

    if base_R is None:
        base_R = np.eye(3, dtype=np.float32)
        base_t = np.zeros(3, np.float32)
    X_np = np.asarray(X)
    X_world = (X_np - base_t) @ base_R  # base_R^T (X - base_t) rowwise
    rec.Rs[i] = base_R
    rec.ts[i] = base_t
    rec.Rs[j] = np.asarray(R) @ base_R
    rec.ts[j] = np.asarray(R) @ base_t + np.asarray(t)
    rec.registered[i] = rec.registered[j] = True
    rec.seg_of_view[i] = rec.seg_of_view[j] = seg
    rec.reg_order += [i, j]
    tids = tracks.tid[i, ia[good[:n]]]
    rec.points[tids] = X_world[:n][good[:n]]
    rec.has_point[tids] = True
    rec.seg_of_point[tids] = seg
    for v in (i, j):
        mm = tracks.ok[v]
        t_ids = tracks.tid[v][mm]
        fv = first_view[t_ids]
        fv_safe = np.maximum(fv, 0)
        fresh = (fv < 0) | (rec.seg_of_view[fv_safe] != seg) | (v < fv)
        first_view[t_ids[fresh]] = v
        first_uv[t_ids[fresh]] = tracks.uv[v][mm][fresh]
    rec.log.append(("init", i, j, int(good.sum())))
    return int(good.sum())


def _pull_state(st: MapState, rec: SequentialReconstruction):
    """Device -> host (rare: re-init, mesh BA, final)."""
    jax.block_until_ready(st)
    host = jax.device_get(st)
    rec.Rs = np.asarray(host.Rs).copy()
    rec.ts = np.asarray(host.ts).copy()
    rec.registered = np.asarray(host.registered).copy()
    rec.seg_of_view = np.asarray(host.seg_of_view).copy()
    rec.points = np.asarray(host.points).copy()
    rec.has_point = np.asarray(host.has_point).copy()
    rec.seg_of_point = np.asarray(host.seg_of_point).copy()
    return (np.asarray(host.first_view).copy(),
            np.asarray(host.first_uv).copy())


def _push_state(rec: SequentialReconstruction, first_view, first_uv) -> MapState:
    return MapState(
        Rs=jnp.asarray(rec.Rs), ts=jnp.asarray(rec.ts),
        registered=jnp.asarray(rec.registered),
        seg_of_view=jnp.asarray(rec.seg_of_view),
        points=jnp.asarray(rec.points),
        has_point=jnp.asarray(rec.has_point),
        seg_of_point=jnp.asarray(rec.seg_of_point),
        first_view=jnp.asarray(first_view),
        first_uv=jnp.asarray(first_uv),
    )


@f32_matmuls
def global_ba(rec: SequentialReconstruction, tracks: SparseTracks,
              n_iters: int = 15, n_cg: int = 15, mesh=None) -> None:
    """Host-facing global sparse BA over ALL registered views; shards over
    `mesh` through parallel.dist_ba when given."""
    V, K = tracks.tid.shape
    reg = rec.registered
    ok = (tracks.ok & reg[:, None] & rec.has_point[tracks.tid]
          & (rec.seg_of_point[tracks.tid] == rec.seg_of_view[:, None]))
    cam_free = _global_cam_free(rec)
    cams = np.concatenate(
        [np.asarray(se3.log_so3(jnp.asarray(rec.Rs))), rec.ts],
        axis=1).astype(np.float32)
    prob = sba.SparseBAProblem(
        cameras=jnp.asarray(cams), points=jnp.asarray(rec.points),
        intr=jnp.asarray(rec.intr),
        obs_cam=jnp.asarray(np.repeat(np.arange(V, dtype=np.int32), K)),
        obs_pt=jnp.asarray(tracks.tid.reshape(-1)),
        obs_uv=jnp.asarray(tracks.uv.reshape(-1, 2).T),
        obs_ok=jnp.asarray(ok.reshape(-1)),
    )
    buckets = sba.ObsBuckets(
        jnp.asarray(np.arange(V * K, dtype=np.int32).reshape(V, K).T),
        jnp.asarray(ok.T))
    kwargs = dict(n_iters=n_iters, fix_first_cam=False,
                  cam_free=jnp.asarray(cam_free),
                  pt_free=jnp.asarray(rec.has_point), n_cg=n_cg,
                  buckets=buckets)
    if mesh is not None:
        from opencv_contrib_tpu.parallel import dist_ba
        res = dist_ba.bundle_adjust_sparse(prob, mesh, **kwargs)
    else:
        res = sba.bundle_adjust_sparse(prob, **kwargs)
    out_c = np.asarray(res.cameras)
    upd = np.flatnonzero(cam_free)
    rec.Rs[upd] = np.asarray(se3.exp_so3(jnp.asarray(out_c[upd, :3])))
    rec.ts[upd] = out_c[upd, 3:]
    rec.points[rec.has_point] = np.asarray(res.points)[rec.has_point]


def _global_cam_free(rec: SequentialReconstruction) -> np.ndarray:
    cam_free = rec.registered.copy()
    for s in range(rec.n_segments):
        sviews = [v for v in rec.reg_order if rec.seg_of_view[v] == s]
        for v in sviews[:2]:  # per-segment gauge anchor
            cam_free[v] = False
    return cam_free


# ---------------------------------------------------------------------------
# driver


def reconstruct_sequential(
    tracks: SparseTracks,
    intr: np.ndarray,
    window: int = 16,
    ba_every: int = 3,
    global_every: int = 0,
    min_gap: int = 3,
    min_inliers: int = 8,
    max_err_px: float = 4.0,
    min_parallax_deg: float = 1.0,
    prune_px: float = 20.0,
    window_iters: int = 6,
    window_cg: int = 8,
    global_growth: float = 1.4,
    final_global_iters: int = 15,
    mesh=None,
    seed: int = 0,
    progress_every: int = 0,
) -> SequentialReconstruction:
    """Sequential incremental reconstruction over sparse tracks.

    The cv::sfm::reconstruct contract (reconstruct.cpp:236) restructured
    for sequential captures at scale: chunked device-side registration
    (`ba_every` views per dispatch), windowed BA after every chunk, global
    sparse BA at the end (plus every `global_every` registrations if
    nonzero). See module docstring for the round-trip arithmetic.
    """
    V, K = tracks.tid.shape
    T = tracks.n_tracks
    intr = np.asarray(intr, np.float32)
    rec = SequentialReconstruction(
        Rs=np.tile(np.eye(3, dtype=np.float32), (V, 1, 1)),
        ts=np.zeros((V, 3), np.float32),
        registered=np.zeros(V, bool),
        points=np.zeros((T, 3), np.float32),
        has_point=np.zeros(T, bool),
        intr=intr,
        seg_of_view=np.full(V, -1, np.int32),
        seg_of_point=np.full(T, -1, np.int32),
    )
    first_view = np.full(T, -1, np.int32)
    first_uv = np.zeros((T, 2), np.float32)
    key = jax.random.PRNGKey(seed)

    def try_init(i, base_R=None, base_t=None):
        """Two-view init at view i: widest-baseline overlapping later view
        first (the GRIC pair-selection intent, keyframe_selection.cc:133 —
        adjacent pairs triangulate degenerately)."""
        js = list(range(min(i + 2 * min_gap, V - 1), i + min_gap - 1, -1))
        js += list(range(i + min_gap - 1, i, -1))  # desperate fallback
        for j in js:
            if j <= i:
                continue
            k_ij = jax.random.fold_in(key, i * V + j)
            npts = _init_two_view(tracks, rec, first_view, first_uv, i, j,
                                  k_ij, base_R=base_R, base_t=base_t,
                                  seg=rec.n_segments)
            if npts >= 12:
                rec.n_segments += 1
                return True
        return False

    if not try_init(0):
        raise ValueError("two-view initialization failed")

    # device-resident state + tracks
    st = _push_state(rec, first_view, first_uv)
    tid_d = jnp.asarray(tracks.tid)
    uv_d = jnp.asarray(tracks.uv)
    ok_d = jnp.asarray(tracks.ok)
    intr_j = jnp.asarray(intr)
    max_err_n = jnp.float32(max_err_px / float(intr[0]))
    min_par_cos = jnp.float32(np.cos(np.radians(min_parallax_deg)))

    fail_streak = 0
    reinit_after = 4
    regs_since_global = 0
    next_global_mark = max(16, 4 * ba_every)
    tmv, tmu, tmo = map(jnp.asarray, build_track_major(tracks))
    prev = jnp.asarray(rec.reg_order[-1], jnp.int32)
    seg_j = jnp.asarray(rec.n_segments - 1, jnp.int32)

    def window_vids():
        seg = rec.n_segments - 1
        seg_views = [v for v in rec.reg_order if rec.seg_of_view[v] == seg]
        W_live = min(window, len(seg_views))
        if W_live < 3:
            return None, None
        vids = np.asarray(
            seg_views[-W_live:] + [seg_views[-1]] * (window - W_live),
            np.int32)
        live = np.arange(window) < W_live
        cam_free = (np.arange(window) >= 2) & live  # two oldest = gauge
        return jnp.asarray(vids), jnp.asarray(cam_free), jnp.asarray(live)

    with trace_span("sfm_scale.sequential"):
        v0 = 1
        while v0 < V:
            st, prev, flags = _chunk_register_jit(
                st, tid_d, uv_d, ok_d, jnp.asarray(v0, jnp.int32), seg_j,
                prev, key, intr_j, max_err_n, min_par_cos,
                n_steps=ba_every, min_inliers=min_inliers, min_gap=min_gap)
            jax.block_until_ready(flags)  # see _reproj_sums fetch note
            flags = np.asarray(flags)  # (n_steps, 4)
            new_regs = 0
            reinit_at = -1
            for i in range(flags.shape[0]):
                v = v0 + i
                if v >= V:
                    break
                newly, n_inl, n_have, already = flags[i]
                if already:
                    continue
                if newly:
                    rec.reg_order.append(v)
                    rec.seg_of_view[v] = rec.n_segments - 1
                    rec.registered[v] = True
                    new_regs += 1
                    fail_streak = 0
                else:
                    rec.log.append(("fail", v, int(n_inl), int(n_have)))
                    fail_streak += 1
                    if fail_streak >= reinit_after and reinit_at < 0:
                        reinit_at = v
            if new_regs:
                vids, cfree, live = window_vids()
                if vids is not None:
                    st = _windowed_ba_jit(
                        st, tid_d, uv_d, ok_d, vids, cfree, live, seg_j,
                        intr_j, W=window, n_iters=window_iters,
                        n_cg=window_cg)
                regs_since_global += new_regs
            if reinit_at >= 0 and reinit_at + min_gap < V:
                # tracking lost: pull state, re-init a fresh segment
                # anchored near the last registered pose, push back
                fv_h, fu_h = _pull_state(st, rec)
                first_view, first_uv = fv_h, fu_h
                pv = rec.reg_order[-1]
                if try_init(reinit_at, base_R=rec.Rs[pv].copy(),
                            base_t=rec.ts[pv].copy()):
                    rec.log.append(("reinit", reinit_at, rec.n_segments - 1))
                    fail_streak = 0
                    seg_j = jnp.asarray(rec.n_segments - 1, jnp.int32)
                    prev = jnp.asarray(rec.reg_order[-1], jnp.int32)
                    st = _push_state(rec, first_view, first_uv)
                    v0 = reinit_at + 1
                    continue
                # failed re-init: back off before trying again
                fail_streak = 0
                st = _push_state(rec, first_view, first_uv)
            trigger = (global_every and regs_since_global >= global_every)
            if global_growth and len(rec.reg_order) >= next_global_mark:
                trigger = True
                next_global_mark = int(
                    max(next_global_mark * global_growth,
                        next_global_mark + 2 * ba_every))
            if trigger:
                # COLMAP-style growth-triggered global refinement: the
                # model is re-bundled every ~global_growth x growth, so
                # drift never accumulates past what LM can pull back (a
                # drifted full loop is a local minimum plain BA cannot
                # escape; frequent re-bundling prevents ever entering it)
                cam_free = jnp.asarray(_global_cam_free(rec))
                st = _retriangulate(st, tmv, tmu, tmo, intr_j)
                err = _slot_err_jit(st, tid_d, uv_d, ok_d, intr_j)
                st = _global_ba_jit(st, tid_d, uv_d,
                                    ok_d & (err < prune_px), cam_free,
                                    intr_j, n_iters=10, n_cg=15)
                regs_since_global = 0
            if progress_every and len(rec.reg_order) % progress_every < ba_every:
                print(f"[sfm_scale] v0={v0} registered "
                      f"{len(rec.reg_order)}/{V}", flush=True)
            v0 += ba_every

    with trace_span("sfm_scale.global_ba"):
        if final_global_iters and mesh is None:
            # the libmv fixpoint at global scale: re-intersect <-> bundle
            # (pipeline.cc:138-264's alternation, batched over everything),
            # with outlier observations pruned before each bundle
            cam_free = jnp.asarray(_global_cam_free(rec))
            st = _retriangulate(st, tmv, tmu, tmo, intr_j)
            for _ in range(2):
                err = _slot_err_jit(st, tid_d, uv_d, ok_d, intr_j)
                ok_p = ok_d & (err < prune_px)
                st = _global_ba_jit(st, tid_d, uv_d, ok_p, cam_free, intr_j,
                                    n_iters=final_global_iters, n_cg=15)
                st = _retriangulate(st, tmv, tmu, tmo, intr_j)
            err = _slot_err_jit(st, tid_d, uv_d, ok_d, intr_j)
            ok_p = ok_d & (err < prune_px)
            st = _global_ba_jit(st, tid_d, uv_d, ok_p, cam_free, intr_j,
                                n_iters=final_global_iters, n_cg=15)
        first_view, first_uv = _pull_state(st, rec)
        if final_global_iters and mesh is not None:
            global_ba(rec, tracks, n_iters=final_global_iters, mesh=mesh)
    return rec
