"""Breadth tests: dpm, rapid, hfs, dnn_objdetect."""

import numpy as np
import jax
import jax.numpy as jnp


class TestDpm:
    def test_gdt_quadratic(self):
        from opencv_contrib_tpu.dpm import gdt2d

        s = jnp.full((9, 9), -10.0).at[2, 6].set(5.0)
        out = np.asarray(gdt2d(s, jnp.asarray([1.0, 0.0, 1.0, 0.0]), 4, 4))
        # at the peak: 5; one cell away: 5 - 1; diagonal: 5 - 2
        assert out[2, 6] == 5.0
        assert out[3, 6] == 4.0
        assert out[2, 5] == 4.0
        assert out[3, 5] == 3.0

    def _pattern(self, rng, deform=0):
        img = rng.uniform(0, 0.1, (96, 96)).astype(np.float32)
        # object: two bright blobs (parts) over a dim box (root)
        img[40:72, 32:64] += 0.15
        img[44:52, 36:44] += 0.7
        img[60 + deform : 68 + deform, 52:60] += 0.7
        return img

    def test_detect_and_deformation_tolerance(self, rng):
        from opencv_contrib_tpu.dpm import DPMModel, detect
        from opencv_contrib_tpu.dpm.detector import _features

        train = self._pattern(rng)
        feat = _features(jnp.asarray(train))
        # build the model from the training image's own features
        # root spans the object (cells 5..8 in y, 4..7 in x)
        root = feat[4:9, 3:8]
        p1 = feat[5:7, 4:6]
        p2 = feat[7:9, 6:8]
        model = DPMModel(
            root=root / (jnp.linalg.norm(root) + 1e-6),
            parts=jnp.stack([p1 / (jnp.linalg.norm(p1) + 1e-6), p2 / (jnp.linalg.norm(p2) + 1e-6)]),
            anchors=jnp.asarray([[1, 1], [3, 3]], jnp.int32),
            deform=jnp.full((2, 4), 0.05),
            bias=0.0,
        )
        dets = detect(train, model, scales=(1.0,), score_thresh=2.0)
        assert dets, "no detection on the training pattern"
        y, x, s, sc = dets[0]
        assert abs(y - 32) <= 16 and abs(x - 24) <= 16

        # deformed instance must still fire (part moved one cell)
        deformed = self._pattern(rng, deform=6)
        dets2 = detect(deformed, model, scales=(1.0,), score_thresh=2.0)
        assert dets2, "no detection on the deformed pattern"
        # and score more than a scrambled background
        noise = rng.uniform(0, 1, (96, 96)).astype(np.float32)
        dets3 = detect(noise, model, scales=(1.0,), score_thresh=2.0)
        best3 = max((d[3] for d in dets3), default=-np.inf)
        assert dets2[0][3] > best3


def _render_wire_cube(K, R, t, shape=(120, 160)):
    """Rasterize a bright-on-dark filled square silhouette of a cube's
    front face — enough structure for RAPID's normal search."""
    from opencv_contrib_tpu.rapid.tracker import _project

    verts = cube_vertices()
    uv, _ = _project(jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), jnp.asarray(verts))
    uv = np.asarray(uv)
    # axis-aligned square with analytic partial-pixel coverage so the
    # intensity step sits at the true subpixel boundary
    y0, y1 = uv[:, 1].min(), uv[:, 1].max()
    x0, x1 = uv[:, 0].min(), uv[:, 0].max()
    ys = np.arange(shape[0])[:, None]
    xs = np.arange(shape[1])[None, :]
    cov_y = np.clip(np.minimum(y1, ys + 0.5) - np.maximum(y0, ys - 0.5), 0, 1)
    cov_x = np.clip(np.minimum(x1, xs + 0.5) - np.maximum(x0, xs - 0.5), 0, 1)
    return (cov_y * cov_x).astype(np.float32)


def cube_vertices(s=0.5):
    return np.array(
        [[-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0]], np.float32
    )


class TestRapid:
    def test_recovers_small_pose_offset(self):
        from opencv_contrib_tpu.rapid import track

        K = np.array([[120.0, 0, 80], [0, 120.0, 60], [0, 0, 1]], np.float32)
        R_true = np.eye(3, dtype=np.float32)
        t_true = np.array([0.0, 0.0, 3.0], np.float32)
        img = _render_wire_cube(K, R_true, t_true)
        edges = np.array([[0, 1], [1, 2], [2, 3], [3, 0]])
        # start from a translated pose
        t0 = t_true + np.array([0.05, -0.04, 0.1], np.float32)
        R2, t2, used = track(
            jnp.asarray(img), jnp.asarray(K), jnp.asarray(R_true), jnp.asarray(t0),
            cube_vertices(), edges, n_iters=5, search_len=10.0,
        )
        err0 = np.linalg.norm(t0 - t_true)
        err1 = np.linalg.norm(np.asarray(t2) - t_true)
        assert err1 < 0.6 * err0, (err0, err1)
        assert float(used) > 0.5


class TestHfs:
    def test_segments_piecewise_constant(self, rng):
        from opencv_contrib_tpu.hfs import hfs_segment

        img = np.zeros((96, 96), np.float32)
        img[:, 48:] = 1.0
        img += rng.normal(0, 0.01, img.shape).astype(np.float32)
        seg = hfs_segment(img, grid=8, seg_thresh1=0.3, seg_thresh2=0.6)
        assert seg.shape == (96, 96)
        n_seg = len(np.unique(seg))
        assert n_seg <= 4, f"over-segmented: {n_seg}"
        # left and right halves are (mostly) different segments
        left = np.bincount(seg[:, :40].reshape(-1)).argmax()
        right = np.bincount(seg[:, 56:].reshape(-1)).argmax()
        assert left != right
        # each half is dominated by one label
        frac_l = (seg[:, :40] == left).mean()
        frac_r = (seg[:, 56:] == right).mean()
        assert frac_l > 0.9 and frac_r > 0.9


class TestDnnObjdetect:
    def test_decode_and_nms(self):
        from opencv_contrib_tpu.models import dnn_objdetect as od

        anchors = od.make_anchors((16.0,))
        # build one-hot head: one confident anchor at cell (2, 3)
        head = np.zeros((6, 6, 1, 5 + 2), np.float32)
        head[..., 0] = -8.0
        head[2, 3, 0, 0] = 8.0
        head[2, 3, 0, 5:] = [4.0, -4.0]
        boxes, conf, cls = od.decode(jnp.asarray(head), anchors)
        i = int(np.argmax(np.asarray(conf)))
        b = np.asarray(boxes)[i]
        # anchor center at (2.5*8, 3.5*8) = (20, 28), size 16
        np.testing.assert_allclose(b, [12, 20, 28, 36], atol=1e-4)
        # NMS keeps one of two overlapping boxes
        bb = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32)
        ss = jnp.asarray([0.9, 0.8, 0.7])
        idx, valid = od.nms(bb, ss, iou_thresh=0.4, top_k=3)
        kept = set(np.asarray(idx)[np.asarray(valid)].tolist())
        assert kept == {0, 2}

    def test_train_step_reduces_loss(self, rng):
        from opencv_contrib_tpu.models import dnn_objdetect as od

        model = od.SqueezeDetLite(n_classes=2, n_anchors=1)
        key = jax.random.PRNGKey(0)
        params, opt_state = od.init(key, model, img_hw=(48, 48))
        anchors = od.make_anchors((16.0,))
        imgs = jnp.asarray(rng.uniform(0, 1, (2, 48, 48, 1)).astype(np.float32))
        Hc = Wc = 48 // 8
        tgt_conf = jnp.zeros((2, Hc, Wc, 1)).at[:, 2, 2, 0].set(1.0)
        tgt_boxes = jnp.zeros((2, Hc, Wc, 1, 4))
        tgt_cls = jnp.zeros((2, Hc, Wc, 1), jnp.int32)
        losses = []
        for _ in range(8):
            params, opt_state, loss = od.train_step(
                params, opt_state, model, imgs, tgt_conf, tgt_boxes, tgt_cls, anchors)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
