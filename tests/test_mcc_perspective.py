"""Perspective-robust ColorChecker detection (mcc/detector.py).

Reference: CCheckerDetector::process assembles charts from contour quads
under rotation and perspective (mcc/src/checker_detector.cpp); these tests
warp a rendered Macbeth chart and require recovery, including with
occluded cells (partial charts)."""

import numpy as np

from opencv_contrib_tpu.mcc.ccm import MACBETH_SRGB
from opencv_contrib_tpu.mcc.detector import detect_chart


def _chart_image(cell: int = 22, gutter: int = 5):
    ref = np.asarray(MACBETH_SRGB, np.float32).reshape(4, 6, 3)
    H = 4 * cell + 5 * gutter
    W = 6 * cell + 7 * gutter
    img = np.zeros((H, W, 3), np.float32)
    for r in range(4):
        for c in range(6):
            y0 = gutter + r * (cell + gutter)
            x0 = gutter + c * (cell + gutter)
            img[y0:y0 + cell, x0:x0 + cell] = ref[r, c]
    return img, ref


def _warp(img, H, out_shape):
    """Inverse-map nearest warp (host fixture helper)."""
    Ho, Wo = out_shape
    Hi = np.linalg.inv(H)
    yy, xx = np.mgrid[0:Ho, 0:Wo]
    pts = np.stack([xx.ravel(), yy.ravel(), np.ones(Ho * Wo)])
    src = Hi @ pts
    sx = src[0] / src[2]
    sy = src[1] / src[2]
    xi = np.round(sx).astype(int)
    yi = np.round(sy).astype(int)
    ok = (xi >= 0) & (xi < img.shape[1]) & (yi >= 0) & (yi < img.shape[0])
    out = np.zeros((Ho * Wo, 3), np.float32)
    out[ok] = img[yi[ok], xi[ok]]
    return out.reshape(Ho, Wo, 3)


def _rotation_h(deg, center, offset):
    th = np.radians(deg)
    c, s = np.cos(th), np.sin(th)
    T1 = np.array([[1, 0, -center[0]], [0, 1, -center[1]], [0, 0, 1.0]])
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    T2 = np.array([[1, 0, offset[0]], [0, 1, offset[1]], [0, 0, 1.0]])
    return T2 @ R @ T1


def _mean_err(colors, ref):
    return np.abs(colors.reshape(4, 6, 3) - ref).mean()


class TestPerspectiveChart:
    def test_axis_aligned_still_works(self):
        img, ref = _chart_image()
        colors, _ = detect_chart(img)
        assert colors is not None
        assert _mean_err(colors, ref) < 0.03

    def test_rotated_30_degrees(self):
        img, ref = _chart_image()
        H = _rotation_h(30.0, (img.shape[1] / 2, img.shape[0] / 2),
                        (130, 120))
        warped = _warp(img, H, (260, 260))
        colors, centers = detect_chart(warped)
        assert colors is not None, f"cells found: {centers.shape[0]}"
        assert _mean_err(colors, ref) < 0.05

    def test_perspective_warp(self):
        img, ref = _chart_image()
        # displace the chart corners: mild keystone + rotation
        h, w = img.shape[:2]
        src = np.array([[0, 0], [w, 0], [w, h], [0, h]], np.float64)
        dst = np.array([[20, 28], [205, 12], [225, 135], [12, 165]],
                       np.float64)
        from opencv_contrib_tpu.mcc.detector import _fit_homography_np
        H = _fit_homography_np(src, dst)
        warped = _warp(img, H, (190, 250))
        colors, centers = detect_chart(warped)
        assert colors is not None, f"cells found: {centers.shape[0]}"
        assert _mean_err(colors, ref) < 0.06

    def test_partial_chart_two_cells_occluded(self):
        img, ref = _chart_image()
        # black out two cells (gutter-colored -> their components vanish)
        img[5 + 1 * 27:5 + 1 * 27 + 22, 5 + 2 * 27:5 + 2 * 27 + 22] = 0.0
        img[5 + 2 * 27:5 + 2 * 27 + 22, 5 + 4 * 27:5 + 4 * 27 + 22] = 0.0
        H = _rotation_h(15.0, (img.shape[1] / 2, img.shape[0] / 2),
                        (120, 110))
        warped = _warp(img, H, (240, 240))
        colors, centers = detect_chart(warped)
        assert colors is not None, f"cells found: {centers.shape[0]}"
        # non-occluded cells must still be right
        mask = np.ones((4, 6), bool)
        mask[1, 2] = mask[2, 4] = False
        err = np.abs(colors.reshape(4, 6, 3) - ref)[mask].mean()
        assert err < 0.06

    def test_ccm_through_perspective(self):
        from opencv_contrib_tpu.mcc.detector import detect_and_fit_ccm

        img, _ = _chart_image()
        H = _rotation_h(20.0, (img.shape[1] / 2, img.shape[0] / 2),
                        (120, 115))
        warped = _warp(img, H, (240, 240))
        M, measured = detect_and_fit_ccm(warped)
        assert M is not None
        np.testing.assert_allclose(np.asarray(M), np.eye(3), atol=0.1)
