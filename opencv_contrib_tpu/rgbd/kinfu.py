"""KinectFusion: the per-frame dense SLAM loop.

Parity: rgbd/src/kinfu.cpp KinFuImpl::updateT (:233-285):
  makeFrame -> (frame 0: integrate) else ICP against raycast model ->
  pose update -> min-movement gate -> integrate -> raycast -> pyramid.
Params presets mirror kinfu::Params::defaultParams/coarseParams
(kinfu.hpp:19, kinfu.cpp:55-87). `update()` returns False on ICP divergence
and the caller may `reset()` (kinfu.hpp:264) — the tracking-loss state
machine kept as-is (SURVEY §5.3).

Host holds only the tiny control loop + current pose; all bulk work
(frame pipeline, ICP, integrate, raycast) is jitted device code.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import se3
from opencv_contrib_tpu.rgbd import frame as frame_mod
from opencv_contrib_tpu.rgbd import icp as icp_mod
from opencv_contrib_tpu.rgbd import tsdf as tsdf_mod
from opencv_contrib_tpu.rgbd.frame import DepthFrame


@dataclass
class KinFuParams:
    intr: np.ndarray  # (9,) camera intrinsics
    frame_shape: tuple = (120, 160)
    pyramid_levels: int = 3
    volume_resolution: tuple = (128, 128, 128)
    volume_size: float = 3.0
    # volume sits in front of the initial camera (world = first camera
    # frame), like the reference's volumePose translation of
    # (-half, -half, 0.5) (kinfu.cpp:66): center at z = 0.5 + size/2
    volume_center: tuple = (0.0, 0.0, 2.0)
    depth_max: float = 4.0
    icp_iterations: tuple = (10, 5, 4)
    icp_dist_thresh: float = 0.1
    tsdf_max_weight: float = 64.0
    min_translation: float = 0.008  # min-movement gate before re-integration
    min_rotation: float = 0.01

    @staticmethod
    def default(intr, frame_shape=(120, 160)):
        return KinFuParams(intr=np.asarray(intr, np.float32), frame_shape=frame_shape)

    @staticmethod
    def coarse(intr, frame_shape=(120, 160)):
        return KinFuParams(
            intr=np.asarray(intr, np.float32), frame_shape=frame_shape,
            volume_resolution=(64, 64, 64), pyramid_levels=3,
            icp_iterations=(5, 3, 2),
        )


class KinFu:
    """KinFu facade (create/update/reset/get_pose/render-analog raycast)."""

    def __init__(self, params: KinFuParams):
        self.p = params
        self.reset()

    def reset(self):
        self.volume = tsdf_mod.create(
            self.p.volume_resolution, self.p.volume_size, self.p.volume_center
        )
        self.T_cw = jnp.eye(4)  # world->camera of the CURRENT frame
        self.frame_count = 0
        self.model_pyr = None  # raycast model pyramid (previous pose)

    @property
    def pose(self) -> np.ndarray:
        """Camera->world pose of the latest tracked frame (getPose)."""
        return np.asarray(se3.inverse(self.T_cw))

    def _raycast_pyramid(self, T_cw):
        pts, nrm, valid = tsdf_mod.raycast(
            self.volume, jnp.asarray(self.p.intr), T_cw,
            shape=self.p.frame_shape, depth_max=self.p.depth_max,
        )
        # build coarser levels by subsampling the model maps
        frames = []
        it = jnp.asarray(self.p.intr)
        p_l, n_l, v_l = pts, nrm, valid
        depth_l = p_l[..., 2]
        for l in range(self.p.pyramid_levels):
            frames.append(DepthFrame(depth=depth_l, points=p_l, normals=n_l, valid=v_l))
            p_l = p_l[::2, ::2]
            n_l = n_l[::2, ::2]
            v_l = v_l[::2, ::2]
            depth_l = depth_l[::2, ::2]
        return tuple(frames)

    def update(self, depth) -> bool:
        """One frame tick (updateT, kinfu.cpp:233). Returns False on tracking
        failure (caller decides to reset)."""
        depth = jnp.asarray(depth, jnp.float32)
        pyr = frame_mod.make_frame(
            depth, jnp.asarray(self.p.intr), levels=self.p.pyramid_levels
        )

        if self.frame_count == 0:
            self.volume = tsdf_mod.integrate(
                self.volume, pyr[0].depth, jnp.asarray(self.p.intr), self.T_cw,
                max_weight=self.p.tsdf_max_weight, depth_max=self.p.depth_max,
            )
            self.model_pyr = self._raycast_pyramid(self.T_cw)
            self.frame_count = 1
            return True

        # ICP: new frame against raycast model rendered at previous pose.
        # T maps new-frame camera coords -> previous-frame camera coords.
        T_rel, ok, err = icp_mod.estimate_transform(
            pyr, self.model_pyr, jnp.asarray(self.p.intr),
            iterations=self.p.icp_iterations, dist_thresh=self.p.icp_dist_thresh,
        )
        if not bool(ok):
            return False

        # T_rel: cam_new -> cam_prev, so world->cam_new = T_rel^-1 o world->cam_prev
        T_cw_new = se3.inverse(T_rel) @ self.T_cw

        # min-movement gate (kinfu.cpp:266-271): skip integration if the
        # camera barely moved (avoids over-averaging), but still update pose
        delta = se3.log_se3(T_rel)
        moved = (
            float(jnp.linalg.norm(delta[3:])) > self.p.min_translation
            or float(jnp.linalg.norm(delta[:3])) > self.p.min_rotation
        )
        self.T_cw = T_cw_new
        if moved:
            self.volume = tsdf_mod.integrate(
                self.volume, pyr[0].depth, jnp.asarray(self.p.intr), self.T_cw,
                max_weight=self.p.tsdf_max_weight, depth_max=self.p.depth_max,
            )
        self.model_pyr = self._raycast_pyramid(self.T_cw)
        self.frame_count += 1
        return True

    def get_cloud(self, max_points: int = 65536):
        """World-frame surface points + normals (getCloud)."""
        return tsdf_mod.extract_points(self.volume, max_points)

    def render_depth(self):
        """Raycast depth at the current pose (render-analog)."""
        pts, _, valid = tsdf_mod.raycast(
            self.volume, jnp.asarray(self.p.intr), self.T_cw,
            shape=self.p.frame_shape, depth_max=self.p.depth_max,
        )
        return pts[..., 2] * valid
