"""Incremental Euclidean reconstruction driver.

Parity: libmv's pipeline (reference anchors):
- keyframe/init-pair selection by GRIC(H) vs GRIC(F)
  (keyframe_selection.cc:59-76,133,255-256) — here `gric_scores`.
- two-frame init: 8-pt F -> E -> (R, t) (initialize_reconstruction.cc:53-94).
- fixpoint loop: intersect all unreconstructed tracks (>=2 views) -> bundle ->
  resect all unreconstructed views (>=5 pts) -> bundle, until no progress
  (pipeline.cc:138-264) — `reconstruct_incremental`.
- final reprojection error metric (pipeline.cc:266-318).

Host-side control flow only; each stage (RANSAC, PnP, triangulation, BA) is
one jitted static-shape device program. Views/tracks keep fixed capacities
with registered/valid masks — repeated calls hit the same compiled programs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ba import bundle
from opencv_contrib_tpu.core import camera as cam
from opencv_contrib_tpu.core import se3
from opencv_contrib_tpu.mvg import fundamental, homography, resection, robust, triangulation
from opencv_contrib_tpu.sfm.tracks import TracksTensor
from opencv_contrib_tpu.utils.precision import f32_matmuls
from opencv_contrib_tpu.utils.tracing import trace_span


@dataclass
class Reconstruction:
    """Cameras (world->cam) + points for registered views/tracks — the
    EuclideanReconstruction store (reconstruction.h:39-100)."""

    Rs: np.ndarray  # (V, 3, 3)
    ts: np.ndarray  # (V, 3)
    points: np.ndarray  # (T, 3)
    registered: np.ndarray  # (V,) bool
    has_point: np.ndarray  # (T,) bool
    intr: np.ndarray  # (9,)
    log: list = field(default_factory=list)

    def reprojection_rms(self, tracks: TracksTensor) -> float:
        mask = tracks.mask & self.registered[:, None] & self.has_point[None, :]
        if mask.sum() == 0:
            return float("inf")
        prob = bundle.make_problem_from_scene(
            self.Rs, self.ts, self.points, self.intr, tracks.obs, mask
        )
        return float(
            bundle.rms_reprojection_error(prob.cameras, prob.points, prob.intr, prob.obs, prob.mask)
        )

    def reprojection_mean(self, tracks: TracksTensor) -> float:
        """MEAN of per-marker Euclidean reprojection errors over markers of
        reconstructed (camera, point) pairs — the reference's error metric
        (InternalReprojectionError, pipeline.cc:266-318: total_error /
        num_reprojected), which its 1.4 px pipeline gate is stated in
        (test_simple_pipeline.cpp:82)."""
        mask = tracks.mask & self.registered[:, None] & self.has_point[None, :]
        if mask.sum() == 0:
            return float("inf")
        prob = bundle.make_problem_from_scene(
            self.Rs, self.ts, self.points, self.intr, tracks.obs, mask
        )
        r = bundle.residuals(prob.cameras, prob.points, prob.intr, prob.obs, prob.mask)
        e = jnp.linalg.norm(r, axis=-1)
        return float(jnp.sum(e) / jnp.maximum(jnp.sum(prob.mask), 1))


def gric_scores(x1: np.ndarray, x2: np.ndarray, img_shape=(480, 640)) -> tuple[float, float]:
    """GRIC(H) and GRIC(F) for an image pair (keyframe_selection.cc:59-76).

    Lower GRIC = better model. A good init pair has GRIC(F) < GRIC(H)
    (parallax dominates a homography)."""
    n = x1.shape[0]
    if n < 8:
        return 0.0, float("inf")
    x1j, x2j = jnp.asarray(x1), jnp.asarray(x2)
    H = homography.dlt(x1j, x2j)
    F = fundamental.eight_point(x1j, x2j)
    eH = np.asarray(homography.transfer_error(H, x1j, x2j))
    eF = np.asarray(fundamental.sampson_distance(F, x1j, x2j))
    r = 4.0  # data dimension
    sigma2 = 1.0  # px^2 noise scale
    lam3 = 2.0

    def gric(e, d, k):
        rho = np.minimum(e / sigma2, lam3 * (r - d))
        return rho.sum() + n * d * np.log(r) + k * np.log(r * n)

    return gric(eH, 2.0, 8), gric(eF, 3.0, 7)


def select_init_pair(tracks: TracksTensor, min_common: int = 16,
                     max_candidates: int = 16) -> tuple[int, int]:
    """Best two-frame init pair: enough common tracks and GRIC(F) << GRIC(H)
    (selectTwoKeyframesBasedOnGRICAndVariance, libmv_capi.h:127).

    The O(V^2) candidate enumeration is ONE boolean matmul (common-track
    counts); host-side GRIC runs only on the top-`max_candidates` pairs,
    so 100+-view track files don't trigger a V^2 device-call loop."""
    V = tracks.n_views
    m = tracks.mask.astype(np.float32)
    counts = m @ m.T  # (V, V) common-track counts
    iu = np.triu_indices(V, k=1)
    cand = np.stack([iu[0], iu[1], counts[iu]], axis=1)
    cand = cand[cand[:, 2] >= min_common]
    if len(cand) == 0:
        return (0, min(1, V - 1))
    # prefer well-separated, well-connected pairs: order by count, keep
    # the top candidates for the (device-bound) GRIC evaluation
    cand = cand[np.argsort(-cand[:, 2])][:max_candidates]
    best, best_score = (int(cand[0, 0]), int(cand[0, 1])), -np.inf
    for i, j, n in cand:
        i, j = int(i), int(j)
        common = tracks.common_tracks(i, j)
        gH, gF = gric_scores(tracks.obs[i, common], tracks.obs[j, common])
        score = (gH - gF) / max(len(common), 1) + 0.01 * len(common)
        if score > best_score:
            best_score, best = score, (i, j)
    return best


def initialize_two_view(
    tracks: TracksTensor, intr: np.ndarray, i: int, j: int, key=None
) -> Reconstruction:
    """Two-frame Euclidean init (initialize_reconstruction.cc:53-94):
    robust F -> E -> cheirality-selected (R, t); camera i at identity.

    Static shapes: all device work runs over the full (T,) track axis with
    the common-visibility mask — repeated calls on any view pair reuse one
    compiled program regardless of how many tracks the pair shares."""
    if key is None:
        key = jax.random.PRNGKey(0)
    m = jnp.asarray(tracks.mask[i] & tracks.mask[j])
    x1 = jnp.asarray(tracks.obs[i])
    x2 = jnp.asarray(tracks.obs[j])
    res = robust.fundamental_8pt_robust(key, x1, x2, threshold_px=1.5, mask=m)
    F = res.model
    K = cam.intrinsics_to_K(jnp.asarray(intr))
    E = fundamental.project_to_essential(fundamental.essential_from_fundamental(F, K, K))
    Rs4, ts4 = fundamental.motions_from_essential(E)
    x1n = _undistort_normalize(jnp.asarray(intr), x1)
    x2n = _undistort_normalize(jnp.asarray(intr), x2)
    inl = res.inliers & m
    R, t, _ = fundamental.choose_motion_cheirality(Rs4, ts4, x1n, x2n, inl)

    V, T = tracks.n_views, tracks.n_tracks
    rec = Reconstruction(
        Rs=np.tile(np.eye(3, dtype=np.float32), (V, 1, 1)),
        ts=np.zeros((V, 3), np.float32),
        points=np.zeros((T, 3), np.float32),
        registered=np.zeros(V, bool),
        has_point=np.zeros(T, bool),
        intr=np.asarray(intr, np.float32),
    )
    rec.Rs[j] = np.asarray(R)
    rec.ts[j] = np.asarray(t)
    rec.registered[i] = rec.registered[j] = True

    # triangulate the inlier tracks; keep points in front of both cameras
    X = triangulation.triangulate_midpoint_two_view(x1n, x2n, R, t)
    z1 = np.asarray(X[:, 2])
    Xc2 = np.asarray(se3.rotate_points(R, X) + t)
    ok = np.asarray(inl) & (z1 > 1e-3) & (Xc2[:, 2] > 1e-3)
    rec.points[ok] = np.asarray(X)[ok]
    rec.has_point[ok] = True
    rec.log.append(("init", i, j, int(ok.sum())))
    return rec


# above this many observations the dense (C, P) grid solver gives way to
# the bucketed sparse solver (ba.sparse) — the ITERATIVE_SCHUR-at-scale
# path; the dense grid's Jacobian buffers are O(C*P) regardless of fill
SPARSE_BA_OBS_THRESHOLD = 100_000


def _run_bundle_sparse(rec: Reconstruction, tracks: TracksTensor,
                       mask: np.ndarray, n_iters: int):
    """Route the fixpoint-loop bundle through ba.sparse (flat observation
    list + camera buckets). Buckets are cached on the reconstruction and
    reused while the sparsity pattern is unchanged — the repeated solves of
    the intersect/resect fixpoint (pipeline.cc:186,226) then skip the
    host-side argsort entirely."""
    from opencv_contrib_tpu.ba import sparse as sba

    c_idx, p_idx = np.nonzero(mask)
    n = len(c_idx)
    cap = max(4096, int(np.ceil(n / 4096)) * 4096)
    obs_cam = np.zeros(cap, np.int32)
    obs_pt = np.zeros(cap, np.int32)
    obs_uv = np.zeros((2, cap), np.float32)
    obs_ok = np.zeros(cap, bool)
    obs_cam[:n] = c_idx
    obs_pt[:n] = p_idx
    obs_uv[:, :n] = tracks.obs[c_idx, p_idx].T
    obs_ok[:n] = True

    fingerprint = (cap, n, int(c_idx[0]) if n else 0,
                   int(p_idx[-1]) if n else 0,
                   hash(c_idx.tobytes()) ^ hash(p_idx.tobytes()))
    cache = getattr(rec, "_sparse_ba_cache", None)
    if cache is not None and cache[0] == fingerprint:
        buckets = cache[1]
    else:
        buckets = sba.build_buckets(obs_cam, obs_pt, obs_ok,
                                    mask.shape[0], mask.shape[1])
        rec._sparse_ba_cache = (fingerprint, buckets)

    prob = sba.make_sparse_problem(
        rec.Rs, rec.ts, rec.points, rec.intr, obs_cam, obs_pt, obs_uv, obs_ok)
    out = sba.bundle_adjust_sparse(
        prob, n_iters=n_iters, fix_first_cam=True,
        cam_free=jnp.asarray(rec.registered),
        pt_free=jnp.asarray(rec.has_point),
        n_cg=15, buckets=buckets)
    Rm = np.asarray(se3.exp_so3(out.cameras[:, :3]))
    rec.Rs = np.where(rec.registered[:, None, None], Rm, rec.Rs).astype(np.float32)
    rec.ts = np.where(rec.registered[:, None], np.asarray(out.cameras[:, 3:]), rec.ts).astype(np.float32)
    rec.points = np.where(rec.has_point[:, None], np.asarray(out.points), rec.points).astype(np.float32)


def _run_bundle(rec: Reconstruction, tracks: TracksTensor, n_iters: int = 12, optimize_intr=False):
    mask = tracks.mask & rec.registered[:, None] & rec.has_point[None, :]
    if not optimize_intr and int(mask.sum()) > SPARSE_BA_OBS_THRESHOLD:
        _run_bundle_sparse(rec, tracks, mask, n_iters)
        return
    prob = bundle.make_problem_from_scene(
        rec.Rs, rec.ts, rec.points, rec.intr, tracks.obs, mask
    )
    cam_free = jnp.asarray(rec.registered)
    pt_free = jnp.asarray(rec.has_point)
    out = bundle.bundle_adjust(
        prob, n_iters=n_iters, optimize_intr=optimize_intr,
        cam_free=cam_free, pt_free=pt_free,
    )
    Rm = np.asarray(se3.exp_so3(out.cameras[:, :3]))
    rec.Rs = np.where(rec.registered[:, None, None], Rm, rec.Rs).astype(np.float32)
    rec.ts = np.where(rec.registered[:, None], np.asarray(out.cameras[:, 3:]), rec.ts).astype(np.float32)
    rec.points = np.where(rec.has_point[:, None], np.asarray(out.points), rec.points).astype(np.float32)
    if optimize_intr:
        rec.intr = np.asarray(out.intr)


def _undistort_normalize(intr, px):
    """Pixels -> undistorted normalized camera coords (libmv's
    InvertIntrinsics / libmv_getNormalizedTracks role, libmv_capi.h:284)."""
    return cam.undistort(intr, cam.normalize_points(intr, px))


@f32_matmuls
@partial(jax.jit, static_argnames=("iters",))
def _intersect_batch(obs, cand_mask, Rs, ts, intr, max_err_px, iters=5):
    """Device program for _intersect_new_tracks: triangulate ALL tracks over
    the full (T, V) grid and report per-track acceptance. Static shapes —
    one compile serves every pipeline round.

    Triangulation runs on undistorted normalized coords with P = [R|t]
    (distorted pixels through a K-only DLT would be biased); acceptance
    reprojects through the full distortion model."""
    xn = _undistort_normalize(intr, obs)  # (V, T, 2)
    Ps = jax.vmap(lambda R, t: jnp.concatenate([R, t[:, None]], axis=1))(Rs, ts)
    pts2d = jnp.transpose(xn, (1, 0, 2))  # (T, V, 2)
    m = jnp.transpose(cand_mask)  # (T, V)
    X = triangulation.triangulate_points_refined(pts2d, Ps, m, iters=iters)
    # acceptance: positive depth in every observing view, and MEDIAN
    # reprojection error under threshold. A per-view veto would deadlock:
    # one weak tail pose rejects the track, and that view can never
    # register because its tracks stay missing. The reference keeps every
    # triangulable track and lets bundle adjustment settle it
    # (pipeline.cc:151-181); the median gate only rejects genuinely bad
    # triangulations.
    px, z = jax.vmap(lambda R, t: cam.project(intr, R, t, X))(Rs, ts)  # (V,T,2),(V,T)
    err = jnp.linalg.norm(px - obs, axis=-1)  # (V, T)
    cheir_ok = jnp.all((~cand_mask) | (z > 1e-3), axis=0)
    n_obs = jnp.maximum(jnp.sum(cand_mask, axis=0), 1)  # (T,)
    err_sorted = jnp.sort(jnp.where(cand_mask, err, jnp.inf), axis=0)  # (V, T)
    med = jnp.take_along_axis(err_sorted, (n_obs[None, :] - 1) // 2, axis=0)[0]
    ok = cheir_ok & (med < max_err_px)
    return X, ok


def _intersect_new_tracks(rec: Reconstruction, tracks: TracksTensor, min_views: int = 2, max_err_px: float = 16.0) -> int:
    """Triangulate all unreconstructed tracks with >= min_views registered
    observations (EuclideanIntersect over the batch, pipeline.cc:151-181)."""
    cand_mask = tracks.mask & rec.registered[:, None]
    n_views_per_track = cand_mask.sum(axis=0)
    todo = (~rec.has_point) & (n_views_per_track >= min_views)
    if not todo.any():
        return 0
    X, ok = _intersect_batch(
        jnp.asarray(tracks.obs), jnp.asarray(cand_mask),
        jnp.asarray(rec.Rs), jnp.asarray(rec.ts), jnp.asarray(rec.intr),
        jnp.float32(max_err_px),
    )
    accept = np.asarray(ok) & todo
    rec.points[accept] = np.asarray(X)[accept]
    rec.has_point[accept] = True
    return int(accept.sum())


def _resect_new_views(rec: Reconstruction, tracks: TracksTensor, min_points: int = 5, key=None) -> int:
    """Register all unregistered views with >= min_points known 3D tracks
    (EuclideanResect over candidates, pipeline.cc:192-221)."""
    if key is None:
        key = jax.random.PRNGKey(1)
    n_new = 0
    X_all = jnp.asarray(rec.points)
    intr_j = jnp.asarray(rec.intr)
    for v in range(tracks.n_views):
        if rec.registered[v]:
            continue
        corr_mask = tracks.mask[v] & rec.has_point
        if corr_mask.sum() < max(min_points, 6):
            continue
        # full-(T,) masked resection: one compiled program for every view
        m = jnp.asarray(corr_mask)
        xn = _undistort_normalize(intr_j, jnp.asarray(tracks.obs[v]))
        rres = robust.pnp_robust(key, X_all, xn, threshold=0.01, mask=m)
        if int(rres.n_inliers) < max(min_points, 6):
            continue
        Rt = rres.model
        R, t, _ = resection.refine_pose(
            Rt[:, :3], Rt[:, 3], X_all, xn, rres.inliers & m, iters=10)
        rec.Rs[v] = np.asarray(R)
        rec.ts[v] = np.asarray(t)
        rec.registered[v] = True
        rec.log.append(("resect", v, int(rres.n_inliers)))
        n_new += 1
    return n_new


def reconstruct_incremental(
    tracks: TracksTensor,
    intr: np.ndarray,
    init_pair: tuple[int, int] | None = None,
    max_rounds: int = 20,
    refine_intrinsics: bool = False,
    seed: int = 0,
) -> Reconstruction:
    """Full incremental SfM — the cv::sfm::reconstruct contract
    (reconstruct.cpp:236 + libmv_solveReconstruction, libmv_capi.h:368):
    init pair -> alternate intersect/resect with bundling until fixpoint,
    optional final intrinsics refinement."""
    key = jax.random.PRNGKey(seed)
    if init_pair is None:
        init_pair = select_init_pair(tracks)
    i, j = init_pair
    with trace_span("sfm.init_two_view"):
        rec = initialize_two_view(tracks, intr, i, j, key)
        _run_bundle(rec, tracks)

    for round_idx in range(max_rounds):
        key, k1 = jax.random.split(key)
        with trace_span("sfm.intersect"):
            n_pts = _intersect_new_tracks(rec, tracks)
        if n_pts:
            with trace_span("sfm.bundle"):
                _run_bundle(rec, tracks)
        with trace_span("sfm.resect"):
            n_views = _resect_new_views(rec, tracks, key=k1)
        if n_views:
            with trace_span("sfm.bundle"):
                _run_bundle(rec, tracks)
        rec.log.append(("round", round_idx, n_pts, n_views))
        if n_pts == 0 and n_views == 0:
            break

    with trace_span("sfm.final_bundle"):
        if refine_intrinsics:
            # alternate intrinsics refinement with re-intersection: tracks
            # rejected under the initial distortion estimate may triangulate
            # cleanly once the intrinsics settle (libmv_solveRefineIntrinsics
            # then completes the reconstruction, libmv_capi.h:308)
            for _ in range(2):
                _run_bundle(rec, tracks, n_iters=15, optimize_intr=True)
                if _intersect_new_tracks(rec, tracks) == 0:
                    break
        _run_bundle(rec, tracks, n_iters=15)
    return rec
