"""Submaps + large-scale KinFu.

Parity: rgbd/src/submap.hpp (:23-119 Submap = own volume + pose +
inter-submap PoseConstraints; :126-167 SubmapManager with shouldCreateSubmap
:218, constraint voting :251, map update :386-473) and large_kinfu.cpp's
LargeKinfuImpl::updateT (:214-282) which tracks against active submaps and
triggers pose-graph optimization on loop closure.

This is the reference's own precedent for map-block partitioning
(SURVEY §5.7c): each submap is an independent volume with its own pose —
exactly the unit that shards across hosts in the distributed design.

Host-side manager (tiny control flow), device-side volumes/ICP.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from opencv_contrib_tpu.core import se3
from opencv_contrib_tpu.rgbd import frame as frame_mod
from opencv_contrib_tpu.rgbd import icp as icp_mod
from opencv_contrib_tpu.rgbd import tsdf as tsdf_mod
from opencv_contrib_tpu.rgbd import posegraph


@dataclass
class Submap:
    """One submap: dense volume in its own frame + world pose."""

    index: int
    T_ws: np.ndarray  # submap->world (4, 4)
    volume: object  # TSDFVolume
    n_frames: int = 0
    constraints: dict = field(default_factory=dict)  # other_idx -> (T_rel, weight)


@dataclass
class LargeKinFuParams:
    intr: np.ndarray
    frame_shape: tuple = (120, 160)
    pyramid_levels: int = 3
    volume_resolution: tuple = (96, 96, 96)
    volume_size: float = 3.0
    depth_max: float = 4.0
    icp_iterations: tuple = (10, 5, 4)
    # create a new submap when the camera leaves the current volume's
    # comfortable tracking region (shouldCreateSubmap analog)
    max_dist_from_center: float = 1.0
    min_frames_per_submap: int = 5


class LargeKinFu:
    """Submap-based large-scale KinectFusion."""

    def __init__(self, params: LargeKinFuParams):
        self.p = params
        self.reset()

    def reset(self):
        self.submaps: list[Submap] = []
        self.T_cw = jnp.eye(4)  # world->camera
        self.frame_count = 0
        self.model_pyr = None
        self._new_submap(np.eye(4, dtype=np.float32))

    # ---- submap management (SubmapManager analog) ----

    def _new_submap(self, T_ws: np.ndarray):
        vol = tsdf_mod.create(
            self.p.volume_resolution, self.p.volume_size,
            center=(0.0, 0.0, self.p.volume_size / 2.0 + 0.5),
        )
        sm = Submap(index=len(self.submaps), T_ws=np.asarray(T_ws, np.float32), volume=vol)
        if self.submaps:
            prev = self.submaps[-1]
            T_rel = np.asarray(se3.inverse(jnp.asarray(prev.T_ws)) @ jnp.asarray(T_ws))
            prev.constraints[sm.index] = (T_rel, 1.0)
        self.submaps.append(sm)
        self.active = sm
        return sm

    def _should_create_submap(self) -> bool:
        """shouldCreateSubmap analog: camera too far from the active
        volume's center (in submap frame)."""
        T_sc = np.asarray(se3.inverse(jnp.asarray(self.active.T_ws)) @ se3.inverse(self.T_cw))
        cam_pos = T_sc[:3, 3]
        center = np.array([0.0, 0.0, self.p.volume_size / 2.0 + 0.5], np.float32) * 0  # volume centered ahead
        dist = np.linalg.norm(cam_pos - center)
        return (
            self.active.n_frames >= self.p.min_frames_per_submap
            and dist > self.p.max_dist_from_center
        )

    # ---- per-frame loop (LargeKinfuImpl::updateT analog) ----

    def update(self, depth) -> bool:
        depth = jnp.asarray(depth, jnp.float32)
        intr = jnp.asarray(self.p.intr)
        pyr = frame_mod.make_frame(depth, intr, levels=self.p.pyramid_levels)

        if self.frame_count == 0:
            self._integrate_active(pyr[0].depth)
            self.model_pyr = self._raycast_active()
            self.frame_count = 1
            self.active.n_frames = 1
            return True

        T_rel, ok, err = icp_mod.estimate_transform(
            pyr, self.model_pyr, intr, iterations=self.p.icp_iterations
        )
        if not bool(ok):
            return False
        self.T_cw = se3.inverse(T_rel) @ self.T_cw

        if self._should_create_submap():
            # new submap anchored at the current camera pose
            T_wc = np.asarray(se3.inverse(self.T_cw))
            self._new_submap(T_wc)

        self._integrate_active(pyr[0].depth)
        self.model_pyr = self._raycast_active()
        self.frame_count += 1
        self.active.n_frames += 1
        return True

    def _cam_in_submap(self):
        """world->camera composed into the active submap's frame:
        submap->camera."""
        return self.T_cw @ jnp.asarray(self.active.T_ws)

    def _integrate_active(self, depth):
        T_sc = self._cam_in_submap()
        self.active.volume = tsdf_mod.integrate(
            self.active.volume, depth, jnp.asarray(self.p.intr), T_sc,
            depth_max=self.p.depth_max,
        )

    def _raycast_active(self):
        T_sc = self._cam_in_submap()
        pts, nrm, valid = tsdf_mod.raycast(
            self.active.volume, jnp.asarray(self.p.intr), T_sc,
            shape=self.p.frame_shape, depth_max=self.p.depth_max,
        )
        frames = []
        p_l, n_l, v_l = pts, nrm, valid
        for l in range(self.p.pyramid_levels):
            frames.append(
                frame_mod.DepthFrame(depth=p_l[..., 2], points=p_l, normals=n_l, valid=v_l)
            )
            p_l = p_l[::2, ::2]
            n_l = n_l[::2, ::2]
            v_l = v_l[::2, ::2]
        return tuple(frames)

    # ---- loop closure / pose graph (MapToPoseGraph analog) ----

    def add_loop_constraint(self, i: int, j: int, T_rel: np.ndarray, weight: float = 1.0):
        """Register an inter-submap constraint (e.g. from a relocalization
        match): T_rel = submap_j in submap_i frame."""
        self.submaps[i].constraints[j] = (np.asarray(T_rel, np.float32), weight)

    def optimize_pose_graph(self, n_iters: int = 30):
        """Build the submap pose graph and optimize (MapToPoseGraph +
        PoseGraph::optimize, large_kinfu.cpp:282)."""
        N = len(self.submaps)
        if N < 2:
            return 0.0, 0.0
        poses = np.stack([sm.T_ws for sm in self.submaps])
        eij, eT = [], []
        for sm in self.submaps:
            for j, (T_rel, w) in sm.constraints.items():
                eij.append([sm.index, j])
                eT.append(T_rel)
        g = posegraph.make_graph(poses, np.array(eij), np.stack(eT))
        g2, costs = posegraph.optimize(g, n_iters=n_iters)
        new_poses = np.asarray(g2.poses)
        for sm, T in zip(self.submaps, new_poses):
            sm.T_ws = T.astype(np.float32)
        return float(costs[0]), float(costs[1])

    @property
    def pose(self) -> np.ndarray:
        return np.asarray(se3.inverse(self.T_cw))
