"""Viz3d: offscreen scene facade over the TPU rasterizer.

Mirrors the reference's cv::viz::Viz3d API surface (modules/viz/include/
opencv2/viz/viz3d.hpp: showWidget/removeWidget/setWidgetPose,
setViewerPose/getViewerPose, spinOnce, saveScreenshot) minus the
interactive event loop — "display" here is rendering to a device array or
writing PNG frames, which is what a headless TPU pod can actually do. The
widget set lives in widgets.py; rasterization in renderer.py.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from opencv_contrib_tpu.viz import renderer, widgets


class Viz3d:
    def __init__(self, window_name: str = "viz", size: Tuple[int, int] = (640, 480),
                 background=(0.0, 0.0, 0.0), K: Optional[np.ndarray] = None):
        self.name = window_name
        self.width, self.height = size
        self.background = np.asarray(background, np.float32)
        if K is None:
            f = 0.8 * self.width
            K = np.array([[f, 0, self.width / 2],
                          [0, f, self.height / 2],
                          [0, 0, 1]], np.float32)
        self.K = np.asarray(K, np.float32)
        self._widgets: Dict[str, widgets.Geometry] = {}
        self._poses: Dict[str, np.ndarray] = {}
        self._viewer_pose = np.eye(4, dtype=np.float32)  # world->camera
        self._frames = []

    # --- widget management (viz3d.hpp:showWidget/removeWidget/...) ---
    def show_widget(self, name: str, geom: widgets.Geometry, pose=None):
        self._widgets[name] = geom
        self._poses[name] = (np.eye(4, dtype=np.float32) if pose is None
                             else np.asarray(pose, np.float32))

    def remove_widget(self, name: str):
        self._widgets.pop(name, None)
        self._poses.pop(name, None)

    def remove_all_widgets(self):
        self._widgets.clear()
        self._poses.clear()

    def set_widget_pose(self, name: str, pose: np.ndarray):
        self._poses[name] = np.asarray(pose, np.float32)

    def get_widget_pose(self, name: str) -> np.ndarray:
        return self._poses[name]

    # --- viewer (viz3d.hpp:setViewerPose expects camera->world affine;
    # we store world->camera internally) ---
    def set_viewer_pose(self, pose_cw: np.ndarray):
        self._viewer_pose = np.asarray(pose_cw, np.float32)

    def get_viewer_pose(self) -> np.ndarray:
        return self._viewer_pose

    def set_viewer_lookat(self, eye, target=(0, 0, 0), up=(0, -1, 0)):
        self._viewer_pose = renderer.viewer_pose(eye, target, up)

    # --- rendering ---
    def _scene(self) -> widgets.Geometry:
        return widgets.merge(
            g.transformed(self._poses[n]) for n, g in self._widgets.items())

    def render(self, return_depth: bool = False):
        """Rasterize the scene from the current viewer pose -> (H,W,3)."""
        g = self._scene()
        H, W = self.height, self.width
        K = jnp.asarray(self.K)
        T = jnp.asarray(self._viewer_pose)
        img = None
        zbuf = None
        if len(g.tris):
            V = g.tris.reshape(-1, 3)
            F = np.arange(len(V), dtype=np.int32).reshape(-1, 3)
            img, zbuf = renderer.render_mesh(
                jnp.asarray(V), jnp.asarray(F), jnp.asarray(g.tri_colors),
                K, T, H, W, background=jnp.asarray(self.background))
        if len(g.lines):
            img, zbuf = renderer.render_lines(
                jnp.asarray(g.lines[:, 0]), jnp.asarray(g.lines[:, 1]),
                jnp.asarray(g.line_colors), K, T, H, W,
                background=jnp.asarray(self.background),
                image=img, zbuf=zbuf)
        if len(g.points):
            img, zbuf = renderer.render_points(
                jnp.asarray(g.points), jnp.asarray(g.point_colors), K, T,
                H, W, point_size=2, background=jnp.asarray(self.background),
                image=img, zbuf=zbuf)
        if img is None:
            img = jnp.broadcast_to(jnp.asarray(self.background), (H, W, 3))
            zbuf = jnp.full((H, W), jnp.inf)
        if return_depth:
            return img, zbuf
        return img

    def spin_once(self):
        """Render one frame and buffer it (offscreen spinOnce)."""
        self._frames.append(np.asarray(self.render()))
        return self._frames[-1]

    def save_screenshot(self, path: str):
        from opencv_contrib_tpu.utils import io
        img = np.asarray(self.render())
        io.imwrite(path, (np.clip(img, 0, 1) * 255).astype(np.uint8))

    @property
    def frames(self):
        return self._frames
