"""ximgproc round-2 tests: SEEDS/LSC superpixels, graph segmentation,
selective search, EdgeBoxes, EDLines/EDCircles."""

import numpy as np
import jax.numpy as jnp


def _two_tone(H=64, W=64, noise=0.01, seed=0):
    rng = np.random.default_rng(seed)
    img = np.zeros((H, W), np.float32)
    img[:, W // 2 :] = 1.0
    return img + rng.normal(0, noise, (H, W)).astype(np.float32)


def _boundary_recall(labels, x_true=32, tol=2):
    """Fraction of true-boundary columns crossed by a label change."""
    lab = np.asarray(labels)
    hits = 0
    for y in range(lab.shape[0]):
        seg = lab[y, x_true - tol : x_true + tol + 1]
        hits += len(np.unique(seg)) > 1
    return hits / lab.shape[0]


class TestSuperpixelsX:
    def test_seeds_adheres_to_boundary(self):
        from opencv_contrib_tpu.ximgproc.superpixels_x import seeds

        img = _two_tone()
        labels = seeds(jnp.asarray(img), grid=8, n_iters=12)
        assert _boundary_recall(labels) > 0.9
        assert int(np.asarray(labels).max()) < 64

    def test_lsc_adheres_to_boundary(self):
        from opencv_contrib_tpu.ximgproc.superpixels_x import lsc

        img = _two_tone()
        labels, centers = lsc(jnp.asarray(img), grid=8)
        assert _boundary_recall(labels) > 0.9
        # superpixels stay compact: each label's spatial spread is bounded
        lab = np.asarray(labels)
        for k in np.unique(lab)[:10]:
            ys, xs = np.where(lab == k)
            assert np.ptp(ys) < 40 and np.ptp(xs) < 40


class TestSegmentation:
    def test_graph_segment_two_regions(self):
        from opencv_contrib_tpu.ximgproc.segmentation import graph_segment

        img = _two_tone()
        seg = graph_segment(img, k=0.5)
        n = len(np.unique(seg))
        assert n <= 6
        left = np.bincount(seg[:, :24].reshape(-1)).argmax()
        right = np.bincount(seg[:, 40:].reshape(-1)).argmax()
        assert left != right

    def test_selective_search_covers_object(self):
        from opencv_contrib_tpu.ximgproc.segmentation import selective_search

        rng = np.random.default_rng(0)
        img = rng.uniform(0, 0.05, (64, 64)).astype(np.float32)
        img[20:44, 12:36] += 0.9  # bright square object
        props = selective_search(img, base_k=0.5, max_proposals=48)
        assert props.shape[0] > 0
        # some proposal has IoU > 0.5 with the object box
        gt = np.array([20, 12, 43, 35])
        best = 0.0
        for p in props:
            y0, x0 = max(p[0], gt[0]), max(p[1], gt[1])
            y1, x1 = min(p[2], gt[2]), min(p[3], gt[3])
            inter = max(y1 - y0 + 1, 0) * max(x1 - x0 + 1, 0)
            a1 = (p[2] - p[0] + 1) * (p[3] - p[1] + 1)
            a2 = (gt[2] - gt[0] + 1) * (gt[3] - gt[1] + 1)
            best = max(best, inter / (a1 + a2 - inter))
        assert best > 0.5, best

    def test_edge_boxes_prefers_tight_box(self):
        from opencv_contrib_tpu.ximgproc.segmentation import edge_boxes

        rng = np.random.default_rng(1)
        img = rng.uniform(0, 0.02, (64, 64)).astype(np.float32)
        img[20:44, 12:36] += 0.9
        boxes = np.array([
            [18, 10, 45, 37],   # tight around the square's edges
            [5, 40, 30, 60],    # empty region
            [28, 20, 36, 28],   # strictly inside (no edges)
        ])
        s = edge_boxes(img, boxes)
        assert s[0] > s[1]
        assert s[0] > s[2]


class TestEdPrimitives:
    def test_ed_lines_finds_segments(self):
        from opencv_contrib_tpu.ximgproc.edline import ed_lines

        # step edges (bars would yield closed edge rings, not lines)
        img_h = np.zeros((64, 64), np.float32)
        img_h[:20, :] = 1.0  # horizontal step edge at y ~ 20
        lines_h = ed_lines(img_h, min_length=20)
        assert lines_h.shape[0] >= 1
        dy = np.abs(lines_h[:, 2] - lines_h[:, 0])
        dx = np.abs(lines_h[:, 3] - lines_h[:, 1])
        assert (dx > 5 * dy).any()
        assert (np.abs((lines_h[:, 0] + lines_h[:, 2]) / 2 - 19.5) < 2.0).any()

        img_v = np.zeros((64, 64), np.float32)
        img_v[:, 40:] = 1.0  # vertical step edge at x ~ 40
        lines_v = ed_lines(img_v, min_length=20)
        assert lines_v.shape[0] >= 1
        dy = np.abs(lines_v[:, 2] - lines_v[:, 0])
        dx = np.abs(lines_v[:, 3] - lines_v[:, 1])
        assert (dy > 5 * dx).any()
        assert (lines_v[:, 4] < 1.0).all()

    def test_ed_circles_finds_circle_rejects_line(self):
        from opencv_contrib_tpu.ximgproc.edline import ed_circles

        yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
        img = ((yy - 32) ** 2 + (xx - 32) ** 2 <= 15**2).astype(np.float32)
        img[2:4, 4:60] = 1.0  # plus a line that must NOT become a circle
        circles = ed_circles(img, min_points=16)
        assert circles.shape[0] >= 1
        c = circles[np.argmin(np.abs(circles[:, 2] - 15.0))]
        assert abs(c[0] - 32) < 2 and abs(c[1] - 32) < 2
        assert abs(c[2] - 15.0) < 2.0
        # no circle centered near the line
        assert not ((np.abs(circles[:, 0] - 3) < 3) & (circles[:, 2] > 20)).any()
