"""ChArUco boards + marker pose estimation.

Reference anchors: aruco/src/charuco.cpp (CharucoBoard::draw /
interpolateCornersCharuco — chessboard corners interpolated from detected
marker homographies) and aruco/src/aruco_calib.cpp + objdetect's
estimatePoseSingleMarkers (per-marker PnP from the 4 corners).

TPU-first: pose refinement reuses mvg.resection's vmapped Gauss-Newton;
corner interpolation is a per-board homography gather.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from opencv_contrib_tpu.aruco.markers import detect_markers, draw_marker
from opencv_contrib_tpu.mvg import homography as hmod
from opencv_contrib_tpu.mvg import resection


def draw_charuco_board(dictionary, squares=(5, 5), square_px: int = 32,
                       marker_frac: float = 0.75):
    """Render a ChArUco board (CharucoBoard::draw): chessboard with markers
    in the white squares. Returns (img, marker_ids, marker_centers_sq)."""
    sy, sx = squares
    img = np.ones((sy * square_px, sx * square_px), np.float32)
    mpx = int(square_px * marker_frac)
    pad = (square_px - mpx) // 2
    mid = 0
    ids, centers = [], []
    for r in range(sy):
        for c in range(sx):
            y0, x0 = r * square_px, c * square_px
            if (r + c) % 2 == 0:
                img[y0 : y0 + square_px, x0 : x0 + square_px] = 0.0
            else:
                if mid < dictionary.shape[0]:
                    m = draw_marker(dictionary, mid, mpx)
                    img[y0 + pad : y0 + pad + mpx, x0 + pad : x0 + pad + mpx] = m
                    ids.append(mid)
                    centers.append((r + 0.5, c + 0.5))
                    mid += 1
    return img, ids, np.asarray(centers, np.float32)


def interpolate_charuco_corners(marker_ids, marker_corners, board_ids, board_centers_sq,
                                squares=(5, 5), square_px: int = 32):
    """Interior chessboard corners from detected markers
    (interpolateCornersCharuco): fit one homography board->image over all
    detected marker corners, then map every interior corner through it.
    Returns (corner_ids, corners_yx (K, 2))."""
    sy, sx = squares
    src, dst = [], []
    mpx = 0.75 * square_px
    pad_frac = (1 - 0.75) / 2
    for mid, quad in zip(marker_ids, marker_corners):
        if mid not in board_ids:
            continue
        r, c = board_centers_sq[board_ids.index(mid)]
        # marker corner positions on the board (in pixels), TL TR BR BL to
        # match _find_quads' corner ordering (y, x)
        y0 = (r - 0.5 + pad_frac) * square_px
        y1 = (r + 0.5 - pad_frac) * square_px
        x0 = (c - 0.5 + pad_frac) * square_px
        x1 = (c + 0.5 - pad_frac) * square_px
        src.extend([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])
        # quad is (4, 2) (y, x); order: sorted by angle (TL, TR, BR, BL)
        dst.extend(quad[:, ::-1].tolist())
    if len(src) < 8:
        return [], np.zeros((0, 2), np.float32)
    Hm = np.asarray(hmod.dlt(jnp.asarray(np.asarray(src, np.float32)),
                             jnp.asarray(np.asarray(dst, np.float32))))
    ids, out = [], []
    k = 0
    for r in range(1, sy):
        for c in range(1, sx):
            p = Hm @ np.array([c * square_px, r * square_px, 1.0])
            out.append([p[1] / p[2], p[0] / p[2]])  # (y, x)
            ids.append(k)
            k += 1
    return ids, np.asarray(out, np.float32)


def estimate_pose_single_markers(corners_list, marker_length: float, K, dist_iters: int = 8):
    """Per-marker pose from its 4 corners (estimatePoseSingleMarkers):
    planar PnP via homography decomposition + GN refinement. corners are
    (4, 2) (y, x); returns list of (R, t)."""
    half = marker_length / 2.0
    # object corners (x, y, 0) matching the quad order TL, TR, BR, BL
    # (x right, y down when the marker faces the camera)
    obj_xy = np.array([[-half, -half], [half, -half], [half, half], [-half, half]], np.float32)
    obj3d = jnp.asarray(np.concatenate([obj_xy, np.zeros((4, 1), np.float32)], 1))
    Kinv = np.linalg.inv(np.asarray(K))
    poses = []
    for quad in corners_list:
        xy = np.asarray(quad, np.float32)[:, ::-1]  # (x, y)
        xn = (np.concatenate([xy, np.ones((4, 1), np.float32)], 1) @ Kinv.T)[:, :2]
        # planar homography obj (x, y) -> normalized image; H ~ [r1 r2 t]
        Hm = np.asarray(hmod.dlt(jnp.asarray(obj_xy), jnp.asarray(xn)))
        h1, h2, h3 = Hm[:, 0], Hm[:, 1], Hm[:, 2]
        lam = 2.0 / max(np.linalg.norm(h1) + np.linalg.norm(h2), 1e-9)
        if h3[2] * lam < 0:  # marker in front of the camera: t_z > 0
            lam = -lam
        r1, r2 = h1 * lam, h2 * lam
        R0 = np.stack([r1, r2, np.cross(r1, r2)], axis=1)
        U, _, Vt = np.linalg.svd(R0)
        R0 = U @ Vt
        if np.linalg.det(R0) < 0:
            R0 = U @ np.diag([1.0, 1.0, -1.0]) @ Vt
        t0 = h3 * lam
        Rj, tj, _ = resection.refine_pose(
            jnp.asarray(R0.astype(np.float32)), jnp.asarray(t0.astype(np.float32)),
            obj3d, jnp.asarray(xn), iters=dist_iters)
        poses.append((np.asarray(Rj), np.asarray(tj)))
    return poses
