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
  observation slots per view. This is simultaneously (a) the frontend's
  natural output shape (top-K keypoints per image), (b) the flat
  observation list of ba.sparse after one reshape, and (c) already
  camera-bucketed — `ObsBuckets.idx_a` is just arange(V*K) reshaped, no
  argsort. No dense (V, T) grid, no host-side multimap.
- every per-view step (robust PnP registration, pairwise midpoint
  triangulation) is ONE jitted static-(K,)-shape program, compiled once
  and reused for all 5k views.
- BA schedule: windowed local BA (last `window` keyframes, gauge held by
  freezing the two oldest) every `ba_every` views + periodic/final global
  sparse BA — the schedule answer to O(V) full Ceres solves; the global
  solve shards over a mesh via parallel.dist_ba when one is given.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ba import sparse as sba
from opencv_contrib_tpu.core import camera as cam
from opencv_contrib_tpu.core import se3
from opencv_contrib_tpu.mvg import fundamental, resection, robust, triangulation
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


@dataclass
class SequentialReconstruction:
    """Cameras + points of the scalable driver (EuclideanReconstruction
    store role, reconstruction.h:39-100)."""

    Rs: np.ndarray  # (V, 3, 3)
    ts: np.ndarray  # (V, 3)
    registered: np.ndarray  # (V,) bool
    points: np.ndarray  # (T, 3)
    has_point: np.ndarray  # (T,) bool
    intr: np.ndarray  # (9,)
    # tracking-loss recovery re-initializes a NEW SEGMENT with a fresh scale
    # gauge (the reference analog: KinFu update()->false + reset,
    # kinfu.cpp:262-264); views/points of different segments never share a
    # BA problem (their scales are unrelated)
    seg_of_view: np.ndarray = None  # (V,) int32, -1 = unregistered
    seg_of_point: np.ndarray = None  # (T,) int32, -1 = none
    n_segments: int = 0
    reg_order: list = field(default_factory=list)
    log: list = field(default_factory=list)

    def reprojection_mean_px(self, tracks: SparseTracks) -> float:
        """Mean per-marker reprojection error over registered views and
        reconstructed points of the same segment (the libmv error metric,
        pipeline.cc:266-318)."""
        tot, n = 0.0, 0
        intr_j = jnp.asarray(self.intr)
        for v in np.flatnonzero(self.registered):
            m = (tracks.ok[v] & self.has_point[tracks.tid[v]]
                 & (self.seg_of_point[tracks.tid[v]] == self.seg_of_view[v]))
            if not m.any():
                continue
            X = jnp.asarray(self.points[tracks.tid[v]])
            px, _ = cam.project(intr_j, jnp.asarray(self.Rs[v]),
                                jnp.asarray(self.ts[v]), X)
            e = np.linalg.norm(np.asarray(px) - tracks.uv[v], axis=-1)
            tot += float(e[m].sum())
            n += int(m.sum())
        return tot / max(n, 1)


# ---------------------------------------------------------------------------
# jitted per-view programs (compiled once, reused for every view)


@jax.jit
def _pnp_register_jit(key, X, uv, ok, intr):
    """Robust PnP + GN refine on the view's K slots (EuclideanResect role,
    resect.cc:94-157). X (K, 3), uv (K, 2) pixels, ok (K,)."""
    xn = cam.undistort(intr, cam.normalize_points(intr, uv))
    res = robust.pnp_robust(key, X, xn, threshold=0.01, mask=ok)
    R, t, _ = resection.refine_pose(
        res.model[:, :3], res.model[:, 3], X, xn, res.inliers & ok, iters=8)
    r = resection.reprojection_residuals(R, t, X, xn, ok)
    err2 = jnp.sum(r * r, axis=-1)
    inl = ok & (err2 < 0.01**2)
    return R, t, jnp.sum(inl)


@jax.jit
def _refine_from_prior_jit(R0, t0, X, uv, ok, intr):
    """Motion-model registration fallback: start from the previous view's
    pose and alternately re-gate inliers / refine. Sequences are smooth, so
    the prior is within the GN basin even when RANSAC draws unluckily (the
    'tracking' analog of the reference's frame-to-frame odometry)."""
    xn = cam.undistort(intr, cam.normalize_points(intr, uv))

    def body(carry, thr):
        R, t = carry
        r = resection.reprojection_residuals(R, t, X, xn, ok)
        err2 = jnp.sum(r * r, axis=-1)
        inl = ok & (err2 < thr * thr)
        R, t, _ = resection.refine_pose(R, t, X, xn, inl, iters=4)
        return (R, t), None

    thrs = jnp.asarray([0.05, 0.02, 0.01], jnp.float32)
    (R, t), _ = jax.lax.scan(body, (R0, t0), thrs)
    r = resection.reprojection_residuals(R, t, X, xn, ok)
    err2 = jnp.sum(r * r, axis=-1)
    inl = ok & (err2 < 0.01**2)
    return R, t, jnp.sum(inl)


@jax.jit
def _triangulate_pairs_jit(uva, uvb, Ra, ta, Rb, tb, cand, intr,
                           max_err_n, min_parallax_cos):
    """Midpoint triangulation of K tracks from per-slot first-view poses
    (Ra, ta) and the current view (Rb, tb) — the batched EuclideanIntersect
    (intersect.cc:69-149) in closed form.

    uva/uvb (K, 2) pixels; Ra (K, 3, 3), ta (K, 3); Rb (3, 3), tb (3,).
    Acceptance: positive depth in both views, reprojection error below
    max_err_n (normalized coords), parallax angle above threshold.
    """
    xa = cam.undistort(intr, cam.normalize_points(intr, uva))
    xb = cam.undistort(intr, cam.normalize_points(intr, uvb))
    ha = jnp.concatenate([xa, jnp.ones_like(xa[:, :1])], axis=-1)
    hb = jnp.concatenate([xb, jnp.ones_like(xb[:, :1])], axis=-1)
    da = jnp.einsum("kji,kj->ki", Ra, ha)  # world rays
    oa = -jnp.einsum("kji,kj->ki", Ra, ta)
    db = jnp.einsum("ji,kj->ki", Rb, hb)
    ob = jnp.broadcast_to(-Rb.T @ tb, da.shape)

    # closest point between rays oa + s da and ob + u db
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
    za = Xa[:, 2]
    zb = Xb[:, 2]
    ea = jnp.sum((Xa[:, :2] / jnp.where(jnp.abs(za) < 1e-9, 1e-9, za)[:, None] - xa) ** 2, axis=-1)
    eb = jnp.sum((Xb[:, :2] / jnp.where(jnp.abs(zb) < 1e-9, 1e-9, zb)[:, None] - xb) ** 2, axis=-1)
    na = da / jnp.maximum(jnp.linalg.norm(da, axis=-1, keepdims=True), 1e-12)
    nb = db / jnp.maximum(jnp.linalg.norm(db, axis=-1, keepdims=True), 1e-12)
    cosang = jnp.sum(na * nb, axis=-1)
    accept = (cand & (za > 1e-3) & (zb > 1e-3)
              & (ea < max_err_n**2) & (eb < max_err_n**2)
              & (cosang < min_parallax_cos))
    return X, accept


def _slot_buckets(ok: np.ndarray) -> sba.ObsBuckets:
    """The (V, K) slot layout IS camera-bucketed: bucket slot k of camera c
    is flat row c*K + k. No argsort (cf. sba.build_buckets)."""
    C, K = ok.shape
    idx = np.arange(C * K, dtype=np.int32).reshape(C, K).T  # (K, C)
    return sba.ObsBuckets(jnp.asarray(idx), jnp.asarray(ok.T))


# ---------------------------------------------------------------------------
# driver


def _init_two_view(tracks: SparseTracks, rec: SequentialReconstruction,
                   i: int, j: int, key, base_R=None, base_t=None,
                   seg: int = 0) -> int:
    """Two-frame init (initialize_reconstruction.cc:53-94) on the shared
    tracks of slot-views i and j; returns #triangulated points.

    base_R/base_t place view i (segment re-initialization keeps the new
    segment near the old trajectory; scale is a fresh gauge)."""
    K = tracks.slots
    ti, tj = tracks.tid[i], tracks.tid[j]
    oki, okj = tracks.ok[i], tracks.ok[j]
    # host intersect of the two K-slot tid sets
    common, ia, ja = np.intersect1d(
        np.where(oki, ti, -1), np.where(okj, tj, -2), return_indices=True)
    sel = common >= 0
    ia, ja = ia[sel], ja[sel]
    n = ia.size
    if n < 16:
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

    if base_R is None:
        base_R = np.eye(3, dtype=np.float32)
        base_t = np.zeros(3, np.float32)
    X_np = np.asarray(X)
    # X is in cam-i coordinates; world point = base_R^T (X - base_t)
    X_world = (X_np - base_t) @ base_R
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
    rec.log.append(("init", i, j, int(good.sum())))
    return int(good.sum())


def _windowed_ba(rec: SequentialReconstruction, tracks: SparseTracks,
                 window: int, n_iters: int = 6, n_cg: int = 8) -> None:
    """Local BA over the last `window` registered views of the CURRENT
    segment. Gauge: the two oldest window cameras are frozen. Static shapes
    (window, K slots, window*K point capacity) — one compile serves every
    call (short windows pad with disabled camera slots)."""
    seg = rec.n_segments - 1
    seg_views = [v for v in rec.reg_order if rec.seg_of_view[v] == seg]
    W_live = min(window, len(seg_views))
    if W_live < 3:
        return
    W = window  # static shape; missing slots disabled below
    vids = np.asarray((seg_views[-W_live:] + [seg_views[-1]] * (W - W_live)),
                      np.int64)
    live = np.arange(W) < W_live
    K = tracks.slots
    tid = tracks.tid[vids]  # (W, K)
    uv = tracks.uv[vids]
    ok = (tracks.ok[vids] & rec.has_point[tid] & live[:, None]
          & (rec.seg_of_point[tid] == seg))

    flat_tid = np.where(ok, tid, -1).reshape(-1)
    uniq, inv = np.unique(flat_tid, return_inverse=True)
    off = 1 if uniq.size and uniq[0] == -1 else 0
    n_pts = uniq.size - off
    P_cap = W * K  # static point capacity
    local_pt = np.maximum(inv.reshape(W, K) - off, 0).astype(np.int32)

    pts_local = np.zeros((P_cap, 3), np.float32)
    pts_local[:n_pts] = rec.points[uniq[off:]]
    cams = np.concatenate(
        [np.asarray(se3.log_so3(jnp.asarray(rec.Rs[vids]))), rec.ts[vids]],
        axis=1).astype(np.float32)
    cam_free = live.copy()
    cam_free[:2] = False  # gauge anchor
    pt_free = np.arange(P_cap) < n_pts

    prob = sba.SparseBAProblem(
        cameras=jnp.asarray(cams), points=jnp.asarray(pts_local),
        intr=jnp.asarray(rec.intr),
        obs_cam=jnp.asarray(np.repeat(np.arange(W, dtype=np.int32), K)),
        obs_pt=jnp.asarray(local_pt.reshape(-1)),
        obs_uv=jnp.asarray(uv.reshape(-1, 2).T),
        obs_ok=jnp.asarray(ok.reshape(-1)),
    )
    res = sba.bundle_adjust_sparse(
        prob, n_iters=n_iters, fix_first_cam=False,
        cam_free=jnp.asarray(cam_free), pt_free=jnp.asarray(pt_free),
        n_cg=n_cg, buckets=_slot_buckets(ok))
    out_c = np.asarray(res.cameras)
    upd = np.flatnonzero(cam_free)
    rec.Rs[vids[upd]] = np.asarray(se3.exp_so3(jnp.asarray(out_c[upd, :3])))
    rec.ts[vids[upd]] = out_c[upd, 3:]
    rec.points[uniq[off:]] = np.asarray(res.points)[:n_pts]


def global_ba(rec: SequentialReconstruction, tracks: SparseTracks,
              n_iters: int = 15, n_cg: int = 15, mesh=None) -> None:
    """Global sparse BA over ALL registered views — the EuclideanBundle
    role (bundle.cc:450) at full problem size; shards over `mesh` through
    parallel.dist_ba when given."""
    V, K = tracks.tid.shape
    reg = rec.registered
    # segment-consistent observations only: a view never constrains points
    # of another segment (unrelated scale gauges)
    ok = (tracks.ok & reg[:, None] & rec.has_point[tracks.tid]
          & (rec.seg_of_point[tracks.tid] == rec.seg_of_view[:, None]))
    cams = np.concatenate(
        [np.asarray(se3.log_so3(jnp.asarray(rec.Rs))), rec.ts],
        axis=1).astype(np.float32)
    cam_free = reg.copy()
    for s in range(rec.n_segments):
        sviews = [v for v in rec.reg_order if rec.seg_of_view[v] == s]
        for v in sviews[:2]:  # per-segment gauge anchor
            cam_free[v] = False
    prob = sba.SparseBAProblem(
        cameras=jnp.asarray(cams), points=jnp.asarray(rec.points),
        intr=jnp.asarray(rec.intr),
        obs_cam=jnp.asarray(np.repeat(np.arange(V, dtype=np.int32), K)),
        obs_pt=jnp.asarray(tracks.tid.reshape(-1)),
        obs_uv=jnp.asarray(tracks.uv.reshape(-1, 2).T),
        obs_ok=jnp.asarray(ok.reshape(-1)),
    )
    buckets = _slot_buckets(ok)
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


def reconstruct_sequential(
    tracks: SparseTracks,
    intr: np.ndarray,
    window: int = 16,
    ba_every: int = 3,
    global_every: int = 0,
    min_gap: int = 3,
    min_inliers: int = 8,
    max_err_px: float = 4.0,
    final_global_iters: int = 15,
    mesh=None,
    seed: int = 0,
    progress_every: int = 0,
) -> SequentialReconstruction:
    """Sequential incremental reconstruction over sparse tracks.

    The cv::sfm::reconstruct contract (reconstruct.cpp:236) restructured
    for sequential captures at scale: register each view by robust PnP
    against the live map, triangulate tracks once their first registered
    sighting is >= min_gap views old, run windowed BA every `ba_every`
    views and a global sparse BA at the end (plus every `global_every`
    registrations if nonzero).
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
    first_view = np.full(T, -1, np.int64)
    first_uv = np.zeros((T, 2), np.float32)
    key = jax.random.PRNGKey(seed)

    def bookkeep(v):
        m = tracks.ok[v]
        t_ids = tracks.tid[v][m]
        fresh = first_view[t_ids] < 0
        first_view[t_ids[fresh]] = v
        first_uv[t_ids[fresh]] = tracks.uv[v][m][fresh]

    def try_init(i, base_R=None, base_t=None):
        """Two-view init at view i: widest-baseline overlapping later view
        first (the GRIC pair-selection intent, keyframe_selection.cc:133 —
        adjacent pairs triangulate degenerately), adjacent only as a last
        resort."""
        js = list(range(min(i + 2 * min_gap, V - 1), i + min_gap - 1, -1))
        js += list(range(i + min_gap - 1, i, -1))  # desperate fallback
        for j in js:
            if j <= i:
                continue
            k_ij = jax.random.fold_in(key, i * V + j)
            npts = _init_two_view(tracks, rec, i, j, k_ij,
                                  base_R=base_R, base_t=base_t,
                                  seg=rec.n_segments)
            if npts >= 12:
                rec.n_segments += 1
                bookkeep(i)
                bookkeep(j)
                return True
        return False

    if not try_init(0):
        raise ValueError("two-view initialization failed")

    intr_j = jnp.asarray(intr)
    # err threshold in normalized coords (about max_err_px pixels)
    max_err_n = jnp.float32(max_err_px / float(intr[0]))
    min_par_cos = jnp.float32(np.cos(np.radians(1.0)))
    n_since_ba = 0
    fail_streak = 0
    reinit_after = 4

    with trace_span("sfm_scale.sequential"):
        for v in range(V):
            if rec.registered[v]:
                continue
            seg = rec.n_segments - 1
            m = tracks.ok[v]
            tids = tracks.tid[v]
            have = (m & rec.has_point[tids]
                    & (rec.seg_of_point[tids] == seg))
            registered_now = False
            if int(have.sum()) >= max(min_inliers, 6):
                key, k = jax.random.split(key)
                X = jnp.asarray(rec.points[tids])
                uv_j = jnp.asarray(tracks.uv[v])
                have_j = jnp.asarray(have)
                R, t, n_inl = _pnp_register_jit(k, X, uv_j, have_j, intr_j)
                if int(n_inl) < min_inliers and rec.reg_order:
                    # motion-model fallback: refine from the previous
                    # registered pose (sequences are smooth)
                    pv = rec.reg_order[-1]
                    R2, t2, n2 = _refine_from_prior_jit(
                        jnp.asarray(rec.Rs[pv]), jnp.asarray(rec.ts[pv]),
                        X, uv_j, have_j, intr_j)
                    if int(n2) > int(n_inl):
                        R, t, n_inl = R2, t2, n2
                if int(n_inl) >= min_inliers:
                    rec.Rs[v] = np.asarray(R)
                    rec.ts[v] = np.asarray(t)
                    rec.registered[v] = True
                    rec.seg_of_view[v] = seg
                    rec.reg_order.append(v)
                    registered_now = True
                else:
                    rec.log.append(("pnp_reject", v, int(n_inl)))
            else:
                rec.log.append(("skip", v, int(have.sum())))

            if not registered_now:
                fail_streak += 1
                if fail_streak >= reinit_after and v + min_gap < V:
                    # tracking lost: re-initialize a new segment anchored
                    # near the last registered pose (fresh scale gauge)
                    pv = rec.reg_order[-1]
                    if try_init(v, base_R=rec.Rs[pv].copy(),
                                base_t=rec.ts[pv].copy()):
                        rec.log.append(("reinit", v, rec.n_segments - 1))
                        fail_streak = 0
                        n_since_ba = 0
                continue
            fail_streak = 0

            # first-sighting bookkeeping for this (now registered) view
            bookkeep(v)
            # re-anchor first sightings that point into another segment
            # (their pose gauge is unrelated to this one)
            t_ids = tids[m]
            fv_t = first_view[t_ids]
            stale = (fv_t >= 0) & (rec.seg_of_view[fv_t] != seg)
            if stale.any():
                first_view[t_ids[stale]] = v
                first_uv[t_ids[stale]] = tracks.uv[v][m][stale]

            # triangulate tracks first seen >= min_gap views ago by a
            # registered same-segment view
            fv_ok = first_view[tids] >= 0
            fv_safe = np.where(fv_ok, first_view[tids], v)
            cand = (m & (~(rec.has_point[tids]
                           & (rec.seg_of_point[tids] == seg)))
                    & fv_ok & (fv_safe <= v - min_gap)
                    & (rec.seg_of_view[fv_safe] == seg))
            if cand.any():
                fv = np.where(cand, fv_safe, rec.reg_order[0])
                X, acc = _triangulate_pairs_jit(
                    jnp.asarray(first_uv[tids]), jnp.asarray(tracks.uv[v]),
                    jnp.asarray(rec.Rs[fv]), jnp.asarray(rec.ts[fv]),
                    jnp.asarray(rec.Rs[v]), jnp.asarray(rec.ts[v]),
                    jnp.asarray(cand), intr_j, max_err_n, min_par_cos)
                acc = np.asarray(acc)
                new_ids = tids[acc]
                rec.points[new_ids] = np.asarray(X)[acc]
                rec.has_point[new_ids] = True
                rec.seg_of_point[new_ids] = seg
                rec.log.append(("tri", v, int(cand.sum()), int(acc.sum())))

            n_since_ba += 1
            if n_since_ba >= ba_every:
                _windowed_ba(rec, tracks, window)
                n_since_ba = 0
            if global_every and len(rec.reg_order) % global_every == 0:
                global_ba(rec, tracks, n_iters=5, n_cg=10, mesh=mesh)
            if progress_every and len(rec.reg_order) % progress_every == 0:
                print(f"[sfm_scale] registered {len(rec.reg_order)}/{V} "
                      f"points {int(rec.has_point.sum())}", flush=True)

    with trace_span("sfm_scale.global_ba"):
        if final_global_iters:
            global_ba(rec, tracks, n_iters=final_global_iters, mesh=mesh)
    return rec
