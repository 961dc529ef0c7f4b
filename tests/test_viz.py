"""viz tests: occlusion-correct rasterization of points/lines/meshes and the
Viz3d scene facade (reference: modules/viz test style — render, then assert
geometric properties of the output)."""

import numpy as np
import jax.numpy as jnp

from opencv_contrib_tpu.viz import (
    Viz3d, cloud, cube, sphere, coordinate_system, trajectory, viewer_pose,
    render_points, render_mesh, render_lines)


def _K(w, h, f=200.0):
    return jnp.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], jnp.float32)


def test_point_splat_and_zbuffer():
    H = W = 64
    K = _K(W, H)
    T = jnp.eye(4)
    # two points on the same ray: near red point must beat far green point
    pts = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 1.0]])
    cols = jnp.array([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    img, zb = render_points(pts, cols, K, T, H, W)
    c = np.asarray(img[H // 2, W // 2])
    assert np.allclose(c, [1, 0, 0], atol=1e-5)
    assert np.isclose(float(zb[H // 2, W // 2]), 1.0, atol=1e-5)
    # behind-camera points must not render
    img2, _ = render_points(jnp.array([[0.0, 0.0, -1.0]]),
                            jnp.array([[1.0, 1.0, 1.0]]), K, T, H, W)
    assert float(jnp.sum(img2)) == 0.0


def test_mesh_raster_depth_and_coverage():
    H = W = 48
    K = _K(W, H, f=100.0)
    T = jnp.eye(4)
    # two stacked quads: blue in front of red
    V = np.array([
        [-1, -1, 4], [1, -1, 4], [1, 1, 4], [-1, 1, 4],      # red, far
        [-0.4, -0.4, 2], [0.4, -0.4, 2], [0.4, 0.4, 2], [-0.4, 0.4, 2],
    ], np.float32)
    F = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int32)
    C = np.array([[1, 0, 0], [1, 0, 0], [0, 0, 1], [0, 0, 1]], np.float32)
    img, zb = render_mesh(jnp.asarray(V), jnp.asarray(F), jnp.asarray(C),
                          K, T, H, W, shade=False, chunk=4)
    ctr = np.asarray(img[H // 2, W // 2])
    assert np.allclose(ctr, [0, 0, 1], atol=1e-5)  # blue wins at center
    # a pixel inside the red quad but outside the blue one
    edge = np.asarray(img[H // 2, W // 2 + 22])
    assert np.allclose(edge, [1, 0, 0], atol=1e-5)
    assert np.isclose(float(zb[H // 2, W // 2]), 2.0, rtol=1e-3)


def test_lines_compose_over_mesh():
    H = W = 48
    K = _K(W, H, f=100.0)
    T = jnp.eye(4)
    V = np.array([[-1, -1, 4], [1, -1, 4], [1, 1, 4], [-1, 1, 4]], np.float32)
    F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    C = np.array([[1, 0, 0], [1, 0, 0]], np.float32)
    img, zb = render_mesh(jnp.asarray(V), jnp.asarray(F), jnp.asarray(C),
                          K, T, H, W, shade=False, chunk=2)
    # a line nearer than the quad must draw over it; a line behind must not
    img2, _ = render_lines(jnp.array([[-1.0, 0.0, 2.0], [-1.0, 0.0, 8.0]]),
                           jnp.array([[1.0, 0.0, 2.0], [1.0, 0.0, 8.0]]),
                           jnp.array([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]]),
                           K, T, H, W, image=img, zbuf=zb)
    row = np.asarray(img2[H // 2])
    assert np.allclose(row[W // 2], [0, 1, 0], atol=1e-5)  # near line wins
    off_row = np.asarray(img2[H // 2 + 5])
    reds = (off_row[:, 0] > 0.5).sum()
    assert reds > 10  # far line hidden behind the quad, red still visible
    assert (off_row[:, 1] > 0.5).sum() == 0  # far line fully occluded


def test_viewer_pose_looks_at_target():
    T = viewer_pose([0, 0, -3], [0, 0, 0])
    p = np.array([0, 0, 0, 1.0])
    pc = T @ p
    assert np.allclose(pc[:3], [0, 0, 3], atol=1e-5)  # target 3m ahead


def test_viz3d_scene_render_and_trajectory():
    v = Viz3d(size=(96, 80))
    v.show_widget("cs", coordinate_system(scale=0.5))
    v.show_widget("cube", cube((-0.2, -0.2, -0.2), (0.2, 0.2, 0.2),
                               color=(0.8, 0.8, 0.2)))
    v.show_widget("cloud", cloud(np.random.default_rng(0).normal(
        size=(200, 3)).astype(np.float32) * 0.3, colors=(1, 1, 1)))
    poses = []
    for ang in np.linspace(0, np.pi / 2, 4):
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [np.sin(ang), 0, -np.cos(ang)]
        poses.append(c2w)
    v.show_widget("traj", trajectory(np.stack(poses), frustums=True))
    v.set_viewer_lookat(eye=[0.8, -0.8, -2.0], target=[0, 0, 0])
    img = np.asarray(v.render())
    assert img.shape == (80, 96, 3)
    assert img.max() > 0.1  # something rendered
    assert (img.sum(-1) > 0.05).mean() > 0.01  # non-trivial coverage
    # widget pose update moves geometry
    P = np.eye(4, dtype=np.float32)
    P[:3, 3] = [10, 0, 0]
    v.set_widget_pose("cube", P)
    img2 = np.asarray(v.render())
    assert not np.allclose(img, img2)
    v.remove_widget("cube")
    assert "cube" not in v._widgets


def test_sphere_widget_shading():
    v = Viz3d(size=(64, 64), background=(0, 0, 0))
    v.show_widget("s", sphere(center=(0, 0, 2.5), radius=0.8,
                              color=(0.9, 0.3, 0.3), resolution=10))
    img = np.asarray(v.render())
    lit = img[:, :, 0] > 0.05
    assert lit.mean() > 0.05
    # shading: intensity must vary across the sphere surface
    vals = img[:, :, 0][lit]
    assert vals.std() > 0.02
