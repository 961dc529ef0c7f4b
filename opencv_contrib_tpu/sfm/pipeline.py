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

import numpy as np
import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ba import bundle
from opencv_contrib_tpu.core import camera as cam
from opencv_contrib_tpu.core import se3
from opencv_contrib_tpu.mvg import fundamental, homography, resection, robust, triangulation
from opencv_contrib_tpu.sfm.tracks import TracksTensor
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


def select_init_pair(tracks: TracksTensor, min_common: int = 16) -> tuple[int, int]:
    """Best two-frame init pair: enough common tracks and GRIC(F) << GRIC(H)
    (selectTwoKeyframesBasedOnGRICAndVariance, libmv_capi.h:127)."""
    V = tracks.n_views
    best, best_score = (0, 1), -np.inf
    for i in range(V):
        for j in range(i + 1, V):
            common = tracks.common_tracks(i, j)
            if len(common) < min_common:
                continue
            gH, gF = gric_scores(tracks.obs[i, common], tracks.obs[j, common])
            score = (gH - gF) / max(len(common), 1) + 0.01 * len(common)
            if score > best_score:
                best_score, best = score, (i, j)
    return best


def initialize_two_view(
    tracks: TracksTensor, intr: np.ndarray, i: int, j: int, key=None
) -> Reconstruction:
    """Two-frame Euclidean init (initialize_reconstruction.cc:53-94):
    robust F -> E -> cheirality-selected (R, t); camera i at identity."""
    if key is None:
        key = jax.random.PRNGKey(0)
    common = tracks.common_tracks(i, j)
    x1 = jnp.asarray(tracks.obs[i, common])
    x2 = jnp.asarray(tracks.obs[j, common])
    res = robust.fundamental_8pt_robust(key, x1, x2, threshold_px=1.5)
    F = res.model
    K = cam.intrinsics_to_K(jnp.asarray(intr))
    E = fundamental.project_to_essential(fundamental.essential_from_fundamental(F, K, K))
    Rs4, ts4 = fundamental.motions_from_essential(E)
    x1n = cam.normalize_points(jnp.asarray(intr), x1)
    x2n = cam.normalize_points(jnp.asarray(intr), x2)
    R, t, _ = fundamental.choose_motion_cheirality(Rs4, ts4, x1n, x2n, res.inliers)

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

    # triangulate the inlier tracks
    X = triangulation.triangulate_midpoint_two_view(x1n, x2n, R, t)
    # keep points in front of both cameras
    z1 = np.asarray(X[:, 2])
    Xc2 = np.asarray(se3.rotate_points(R, X) + t)
    ok = np.asarray(res.inliers) & (z1 > 1e-3) & (Xc2[:, 2] > 1e-3)
    rec.points[common[ok]] = np.asarray(X)[ok]
    rec.has_point[common[ok]] = True
    rec.log.append(("init", i, j, int(ok.sum())))
    return rec


def _run_bundle(rec: Reconstruction, tracks: TracksTensor, n_iters: int = 12, optimize_intr=False):
    mask = tracks.mask & rec.registered[:, None] & rec.has_point[None, :]
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


def _intersect_new_tracks(rec: Reconstruction, tracks: TracksTensor, min_views: int = 2, max_err_px: float = 4.0) -> int:
    """Triangulate all unreconstructed tracks with >= min_views registered
    observations (EuclideanIntersect over the batch, pipeline.cc:151-181)."""
    cand_mask = tracks.mask & rec.registered[:, None]
    n_views_per_track = cand_mask.sum(axis=0)
    todo = (~rec.has_point) & (n_views_per_track >= min_views)
    ids = np.flatnonzero(todo)
    if len(ids) == 0:
        return 0
    Ps = np.stack(
        [
            np.asarray(cam.projection_from_KRt(cam.intrinsics_to_K(jnp.asarray(rec.intr)), jnp.asarray(rec.Rs[v]), jnp.asarray(rec.ts[v])))
            for v in range(tracks.n_views)
        ]
    )
    pts2d = jnp.asarray(tracks.obs[:, ids].transpose(1, 0, 2))
    m = jnp.asarray(cand_mask[:, ids].T)
    X = triangulation.triangulate_points_refined(pts2d, jnp.asarray(Ps), m, iters=5)
    # acceptance: reprojection under threshold in every observing view, and
    # positive depth (cheirality) in every observing view
    Xn = np.asarray(X)
    ok = np.ones(len(ids), bool)
    err = np.zeros(len(ids), np.float32)
    for v in range(tracks.n_views):
        sel = cand_mask[v, ids]
        if not sel.any():
            continue
        px, z = cam.project(jnp.asarray(rec.intr), jnp.asarray(rec.Rs[v]), jnp.asarray(rec.ts[v]), jnp.asarray(Xn))
        e = np.linalg.norm(np.asarray(px) - tracks.obs[v, ids], axis=1)
        ok &= ~sel | ((e < max_err_px) & (np.asarray(z) > 1e-3))
    rec.points[ids[ok]] = Xn[ok]
    rec.has_point[ids[ok]] = True
    return int(ok.sum())


def _resect_new_views(rec: Reconstruction, tracks: TracksTensor, min_points: int = 5, key=None) -> int:
    """Register all unregistered views with >= min_points known 3D tracks
    (EuclideanResect over candidates, pipeline.cc:192-221)."""
    if key is None:
        key = jax.random.PRNGKey(1)
    n_new = 0
    for v in range(tracks.n_views):
        if rec.registered[v]:
            continue
        corr = np.flatnonzero(tracks.mask[v] & rec.has_point)
        if len(corr) < max(min_points, 6):
            continue
        X = jnp.asarray(rec.points[corr])
        xn = cam.normalize_points(jnp.asarray(rec.intr), jnp.asarray(tracks.obs[v, corr]))
        rres = robust.pnp_robust(key, X, xn, threshold=0.01)
        if int(rres.n_inliers) < max(min_points, 6):
            continue
        Rt = rres.model
        R, t, _ = resection.refine_pose(Rt[:, :3], Rt[:, 3], X, xn, rres.inliers, iters=10)
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
            _run_bundle(rec, tracks, n_iters=15, optimize_intr=True)
        _run_bundle(rec, tracks, n_iters=15)
    return rec
