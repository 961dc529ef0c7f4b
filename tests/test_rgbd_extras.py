"""rgbd extras: colored TSDF, depth registration, planes, cleaner, LINEMOD,
warp field."""

import numpy as np
import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import se3


def _plane_depth(H=60, W=80, z0=2.0, intr=(70.0, 70.0, 40.0, 30.0)):
    """Depth map of a fronto-parallel plane at z0."""
    return np.full((H, W), z0, np.float32), jnp.asarray(intr, jnp.float32)


class TestColoredTsdf:
    def test_integrate_and_raycast_color(self):
        from opencv_contrib_tpu.rgbd import colored_tsdf as ct

        depth, intr = _plane_depth()
        rgb = np.zeros((60, 80, 3), np.float32)
        rgb[:, :40] = [1.0, 0.0, 0.0]
        rgb[:, 40:] = [0.0, 1.0, 0.0]
        vol = ct.create(resolution=(64, 64, 64), size=4.0, center=(0, 0, 2.0))
        T = jnp.eye(4)
        for _ in range(3):
            vol = ct.integrate(vol, jnp.asarray(depth), jnp.asarray(rgb), intr, T)
        pts, normals, colors, valid = ct.raycast_colored(vol, intr, T, shape=(60, 80))
        v = np.asarray(valid)
        assert v.mean() > 0.5
        c = np.asarray(colors)
        # left half red-dominated, right half green-dominated
        left = c[20:40, 10:30]
        right = c[20:40, 50:70]
        assert left[..., 0].mean() > left[..., 1].mean()
        assert right[..., 1].mean() > right[..., 0].mean()
        # depth near 2.0 where valid
        z = np.asarray(pts)[..., 2]
        assert abs(np.median(z[v]) - 2.0) < 0.1


class TestDepthUtils:
    def test_register_identity_roundtrip(self):
        from opencv_contrib_tpu.rgbd.depth_utils import register_depth

        depth, intr = _plane_depth()
        out = np.asarray(register_depth(jnp.asarray(depth), intr, intr, jnp.eye(4)))
        filled = out > 0
        assert filled.mean() > 0.95
        np.testing.assert_allclose(out[filled], 2.0, atol=1e-3)

    def test_register_translated_camera_shifts_depth(self):
        from opencv_contrib_tpu.rgbd.depth_utils import register_depth

        depth, intr = _plane_depth()
        T = np.eye(4, dtype=np.float32)
        T[2, 3] = 0.5  # rgb cam 0.5m forward
        out = np.asarray(register_depth(jnp.asarray(depth), intr, intr, jnp.asarray(T)))
        filled = out > 0
        np.testing.assert_allclose(out[filled], 2.5, atol=1e-3)

    def test_extract_plane(self):
        from opencv_contrib_tpu.rgbd.depth_utils import extract_planes

        depth, intr = _plane_depth()
        # add an off-plane blob
        depth = depth.copy()
        depth[10:20, 10:20] = 1.0
        plane, mask = extract_planes(jnp.asarray(depth), intr, jax.random.PRNGKey(0))
        p = np.asarray(plane)
        m = np.asarray(mask)
        # plane z = 2: normal ~ (0, 0, +-1), d ~ -+2
        assert abs(abs(p[2]) - 1.0) < 0.05
        assert abs(p[3] / -p[2] - 2.0) < 0.05
        assert m[30:, 30:].mean() > 0.9
        assert m[12:18, 12:18].mean() < 0.1

    def test_clean_depth_reduces_noise(self, rng):
        from opencv_contrib_tpu.rgbd.depth_utils import clean_depth

        depth, intr = _plane_depth()
        noisy = depth + rng.normal(0, 0.02, depth.shape).astype(np.float32)
        cleaned = np.asarray(clean_depth(jnp.asarray(noisy), intr))
        err_in = np.abs(noisy[5:-5, 5:-5] - 2.0).mean()
        err_out = np.abs(cleaned[5:-5, 5:-5] - 2.0).mean()
        assert err_out < 0.6 * err_in


class TestLinemod:
    def test_detects_template(self, rng):
        from opencv_contrib_tpu.rgbd import linemod

        scene = rng.uniform(0, 0.05, (96, 96)).astype(np.float32)
        # object: L-shape of bright strokes
        obj = np.zeros((24, 24), np.float32)
        obj[4:20, 4:8] = 1.0
        obj[16:20, 4:20] = 1.0
        scene[50:74, 30:54] += obj
        q, mag = linemod.quantize_gradients(jnp.asarray(scene))
        tmpl = linemod.extract_template(q, mag, (50, 30), (24, 24), n_features=24)
        boxes, scores = linemod.detect(scene, tmpl, thresh=0.9)
        assert len(scores) > 0
        best = boxes[np.argmax(scores)]
        assert abs(best[0] - 50) <= 4 and abs(best[1] - 30) <= 4
        # a rotated version scores lower at the same spot
        scene2 = rng.uniform(0, 0.05, (96, 96)).astype(np.float32)
        scene2[50:74, 30:54] += obj.T[::-1]
        _, s2 = linemod.detect(scene2, tmpl, thresh=0.0)
        assert s2.max() < scores.max()


class TestWarpField:
    def test_identity_warp(self):
        from opencv_contrib_tpu.rgbd import warpfield as wfm

        nodes = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
        wf = wfm.make_warpfield(nodes, sigma=0.5)
        pts = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (50, 3)).astype(np.float32))
        out = wfm.warp_points(wf, pts)
        np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-5)

    def test_rigid_translation_blend(self):
        from opencv_contrib_tpu.rgbd import warpfield as wfm

        nodes = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
        wf = wfm.make_warpfield(nodes, sigma=0.5)
        xi = np.zeros((4, 6), np.float32)
        xi[:, 3:] = [0.1, -0.2, 0.05]  # same translation on all nodes
        wf = wf._replace(xi=jnp.asarray(xi))
        pts = jnp.asarray([[0.5, 0.5, 0.0], [0.2, 0.8, 0.0]], dtype=jnp.float32)
        out = wfm.warp_points(wf, pts)
        np.testing.assert_allclose(np.asarray(out) - np.asarray(pts),
                                   np.tile([[0.1, -0.2, 0.05]], (2, 1)), atol=1e-4)

    def test_fit_recovers_translation(self):
        from opencv_contrib_tpu.rgbd import warpfield as wfm

        rng = np.random.default_rng(1)
        nodes = rng.uniform(0, 1, (8, 3)).astype(np.float32)
        wf = wfm.make_warpfield(nodes, sigma=0.6)
        src = rng.uniform(0, 1, (100, 3)).astype(np.float32)
        shift = np.array([0.05, -0.03, 0.08], np.float32)
        tgt = src + shift
        normals = np.tile(np.eye(3), (34, 1))[:100].astype(np.float32)
        nbrs = wfm.node_neighbors(jnp.asarray(nodes))
        wf2 = wfm.fit(wf, jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(normals),
                      nbrs, iters=200, lr=0.2, lam=0.1)
        warped = np.asarray(wfm.warp_points(wf2, jnp.asarray(src)))
        err0 = np.linalg.norm(src - tgt, axis=1).mean()
        err1 = np.linalg.norm(warped - tgt, axis=1).mean()
        assert err1 < 0.3 * err0


class TestDynaFu:
    def test_tracks_deforming_scene(self):
        from opencv_contrib_tpu.rgbd.dynafu import DynaFu

        H, W = 60, 80
        intr = np.array([70.0, 70.0, 40.0, 30.0], np.float32)
        yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")

        def frame(t):
            # plane at z=1.5 with a bump whose height grows over time
            bump = 0.2 * t * np.exp(-((yy - 30) ** 2 + (xx - 40) ** 2) / (2 * 8.0**2))
            return (1.5 - bump).astype(np.float32)

        df = DynaFu(intr, frame_shape=(H, W), n_nodes=32, node_sigma=0.3,
                    volume_resolution=(64, 64, 64), volume_size=2.0,
                    volume_center=(0.0, 0.0, 1.2))
        oks = []
        for t in np.linspace(0.0, 1.0, 5):
            oks.append(df.update(jnp.asarray(frame(t))))
        assert all(oks), oks
        # warp field learned a forward (negative z) deformation at the bump
        warped, cvalid = df.render_live()
        w = np.asarray(warped)
        v = np.asarray(cvalid)
        center = w[26:34, 36:44, 2][v[26:34, 36:44]]
        rim = w[5:15, 5:15, 2][v[5:15, 5:15]]
        assert center.size and rim.size
        assert center.mean() < rim.mean() - 0.05  # bump pulled toward camera
