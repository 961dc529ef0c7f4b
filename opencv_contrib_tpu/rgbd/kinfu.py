"""KinectFusion: the per-frame dense SLAM loop.

Parity: rgbd/src/kinfu.cpp KinFuImpl::updateT (:233-285):
  makeFrame -> (frame 0: integrate) else ICP against raycast model ->
  pose update -> min-movement gate -> integrate -> raycast -> pyramid.
Params presets mirror kinfu::Params::defaultParams/coarseParams
(kinfu.hpp:19, kinfu.cpp:55-87). `update()` returns False on ICP divergence
and the caller may `reset()` (kinfu.hpp:264) — the tracking-loss state
machine kept as-is (SURVEY §5.3).

TPU-first: the ENTIRE tick (frame pipeline + multiscale ICP + gated
integrate + raycast model) is ONE jitted program — a single device dispatch
per frame. The min-movement and tracking-ok gates run as masked state
selects inside the program instead of host branches (host round-trips cost
more than the masked integrate, especially through a remote-TPU tunnel).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import se3
from opencv_contrib_tpu.rgbd import frame as frame_mod
from opencv_contrib_tpu.rgbd import icp as icp_mod
from opencv_contrib_tpu.rgbd import tsdf as tsdf_mod
from opencv_contrib_tpu.rgbd.frame import DepthFrame
from opencv_contrib_tpu.utils.tracing import trace_span


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
    # block-sparse active-band integration (tsdf.integrate_sparse): number
    # of 8^3 blocks to integrate per frame, or None for the dense path.
    # ~2x faster integrate at 128^3 (K=256), ~1.8x at 256^3 (K=512); skips
    # free-space carving (see integrate_sparse docstring).
    sparse_blocks: int | None = None

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


def _raycast_pyramid(volume, intr, T_cw, shape, levels, depth_max, n_coarse=None):
    import numpy as _np
    dims = volume.tsdf.shape
    big = int(_np.prod(dims)) > 256 ** 3
    if big and all(d % 8 == 0 for d in dims):
        # splatting raycast (tsdf.raycast_splat): the volume proposes
        # per-pixel brackets via a scatter-min z-buffer over surface
        # blocks instead of marching every ray through the whole depth
        # range — the formulation that removes the VGA/512^3 coarse-march
        # bottleneck (PERF.md roofline note)
        pts, nrm, valid = tsdf_mod.raycast_splat(
            volume, intr, T_cw, shape=shape, depth_max=depth_max,
            n_fine=10, stamp=8)
    else:
        pts, nrm, valid = tsdf_mod.raycast(volume, intr, T_cw, shape=shape,
                                           depth_max=depth_max,
                                           n_coarse=n_coarse, n_fine=12)
    frames = []
    p_l, n_l, v_l = pts, nrm, valid
    depth_l = p_l[..., 2]
    for _ in range(levels):
        frames.append(DepthFrame(depth=depth_l, points=p_l, normals=n_l, valid=v_l))
        p_l = p_l[::2, ::2]
        n_l = n_l[::2, ::2]
        v_l = v_l[::2, ::2]
        depth_l = depth_l[::2, ::2]
    return tuple(frames)


class KinFu:
    """KinFu facade (create/update/reset/get_pose/render-analog raycast)."""

    def __init__(self, params: KinFuParams):
        self.p = params
        p = params
        # coarse raycast step must stay below trunc_dist (5*voxel_size by
        # default) or thin surfaces are skipped; derived here because the
        # fused tick traces raycast with a non-concrete volume
        trunc = 5.0 * p.volume_size / p.volume_resolution[0]
        n_coarse = tsdf_mod.coarse_steps_for(trunc, 0.1, p.depth_max)

        if p.sparse_blocks is None:
            def _integ(volume, depth, intr, T_cw):
                return tsdf_mod.integrate(
                    volume, depth, intr, T_cw,
                    max_weight=p.tsdf_max_weight, depth_max=p.depth_max)
        else:
            def _integ(volume, depth, intr, T_cw):
                return tsdf_mod.integrate_sparse(
                    volume, depth, intr, T_cw,
                    max_weight=p.tsdf_max_weight, depth_max=p.depth_max,
                    max_blocks=p.sparse_blocks)

        @jax.jit
        def _first(volume, T_cw, depth):
            intr = jnp.asarray(p.intr)
            pyr = frame_mod.make_frame(depth, intr, levels=p.pyramid_levels)
            volume = _integ(volume, pyr[0].depth, intr, T_cw)
            model = _raycast_pyramid(volume, intr, T_cw, p.frame_shape,
                                     p.pyramid_levels, p.depth_max, n_coarse)
            return volume, model

        @jax.jit
        def _tick(volume, T_cw, model_pyr, depth):
            intr = jnp.asarray(p.intr)
            pyr = frame_mod.make_frame(depth, intr, levels=p.pyramid_levels)
            T_rel, ok, err = icp_mod.estimate_transform(
                pyr, model_pyr, intr,
                iterations=p.icp_iterations, dist_thresh=p.icp_dist_thresh)
            T_cw_new = jnp.where(ok, se3.inverse(T_rel) @ T_cw, T_cw)
            delta = se3.log_se3(T_rel)
            moved = (jnp.linalg.norm(delta[3:]) > p.min_translation) | (
                jnp.linalg.norm(delta[:3]) > p.min_rotation)
            vol2 = _integ(volume, pyr[0].depth, intr, T_cw_new)
            do_int = ok & moved
            volume = volume._replace(
                tsdf=jnp.where(do_int, vol2.tsdf, volume.tsdf),
                weight=jnp.where(do_int, vol2.weight, volume.weight))
            model_new = _raycast_pyramid(volume, intr, T_cw_new, p.frame_shape,
                                         p.pyramid_levels, p.depth_max, n_coarse)
            model = jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), model_new, model_pyr)
            return volume, T_cw_new, model, ok, err

        self._first_fn = _first
        self._tick_fn = _tick
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

    def update(self, depth, sync: bool = True):
        """One frame tick (updateT, kinfu.cpp:233). Returns False on tracking
        failure (caller decides to reset). ONE device dispatch per frame.

        sync=False skips the host readback of the tracking-ok flag so
        successive ticks pipeline on device (the flag is still recorded in
        self.last_ok as a device scalar; read it when needed). Divergent
        frames never corrupt state either way — the gates are masked
        on-device."""
        depth = jnp.asarray(depth, jnp.float32)
        if self.frame_count == 0:
            with trace_span("kinfu.first_frame"):
                self.volume, self.model_pyr = self._first_fn(self.volume, self.T_cw, depth)
            self.frame_count = 1
            self.last_ok = jnp.asarray(True)
            return True
        with trace_span("kinfu.tick"):
            self.volume, self.T_cw, self.model_pyr, ok, err = self._tick_fn(
                self.volume, self.T_cw, self.model_pyr, depth)
        self.frame_count += 1
        self.last_ok = ok
        return bool(ok) if sync else True

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


class HashKinFu:
    """KinFu backed by the hashed-block TSDF volume — the reference's
    hashTSDFParams preset (kinfu.hpp:19 Params::hashTSDFParams,
    hash_tsdf.cpp:81-91): unbounded scenes, blocks lazily allocated along
    the truncation band each frame.

    Same tick contract as KinFu (update() -> bool, reset, pose); the tick
    is two dispatches (allocate changes the pool ordering, then the fused
    track+integrate+raycast step runs on it)."""

    def __init__(self, params: KinFuParams, capacity: int = 16384):
        from opencv_contrib_tpu.rgbd import hash_tsdf as ht

        self.p = params
        self.capacity = capacity
        self._ht = ht
        p = params

        @jax.jit
        def _first(vol, T_cw, depth):
            intr = jnp.asarray(p.intr)
            vol = ht.allocate(vol, depth, intr, T_cw, depth_max=p.depth_max)
            vol = ht.integrate(vol, depth, intr, T_cw,
                               max_weight=p.tsdf_max_weight,
                               depth_max=p.depth_max)
            pts, nrm, valid = ht.raycast(vol, intr, T_cw, shape=p.frame_shape,
                                         depth_max=p.depth_max)
            model = _pyr_from(pts, nrm, valid, p.pyramid_levels)
            return vol, model

        @jax.jit
        def _tick(vol, T_cw, model_pyr, depth):
            intr = jnp.asarray(p.intr)
            pyr = frame_mod.make_frame(depth, intr, levels=p.pyramid_levels)
            T_rel, ok, err = icp_mod.estimate_transform(
                pyr, model_pyr, intr,
                iterations=p.icp_iterations, dist_thresh=p.icp_dist_thresh)
            T_cw_new = jnp.where(ok, se3.inverse(T_rel) @ T_cw, T_cw)
            vol = ht.allocate(vol, depth, intr, T_cw_new,
                              depth_max=p.depth_max)
            vol2 = ht.integrate(vol, depth, intr, T_cw_new,
                                max_weight=p.tsdf_max_weight,
                                depth_max=p.depth_max)
            vol = vol._replace(
                tsdf=jnp.where(ok, vol2.tsdf, vol.tsdf),
                weight=jnp.where(ok, vol2.weight, vol.weight))
            pts, nrm, valid = ht.raycast(vol, intr, T_cw_new,
                                         shape=p.frame_shape,
                                         depth_max=p.depth_max)
            model_new = _pyr_from(pts, nrm, valid, p.pyramid_levels)
            model = jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), model_new, model_pyr)
            return vol, T_cw_new, model, ok, err

        def _pyr_from(pts, nrm, valid, levels):
            frames = []
            p_l, n_l, v_l = pts, nrm, valid
            for _ in range(levels):
                frames.append(DepthFrame(depth=p_l[..., 2], points=p_l,
                                         normals=n_l, valid=v_l))
                p_l, n_l, v_l = p_l[::2, ::2], n_l[::2, ::2], v_l[::2, ::2]
            return tuple(frames)

        self._first_fn = _first
        self._tick_fn = _tick
        self.reset()

    def reset(self):
        vs = self.p.volume_size / self.p.volume_resolution[0]
        self.volume = self._ht.create(self.capacity, voxel_size=float(vs))
        self.T_cw = jnp.eye(4)
        self.frame_count = 0
        self.model_pyr = None

    @property
    def pose(self) -> np.ndarray:
        return np.asarray(se3.inverse(self.T_cw))

    def update(self, depth, sync: bool = True):
        depth = jnp.asarray(depth, jnp.float32)
        if self.frame_count == 0:
            self.volume, self.model_pyr = self._first_fn(self.volume, self.T_cw, depth)
            self.frame_count = 1
            self.last_ok = jnp.asarray(True)
            return True
        self.volume, self.T_cw, self.model_pyr, ok, err = self._tick_fn(
            self.volume, self.T_cw, self.model_pyr, depth)
        self.frame_count += 1
        self.last_ok = ok
        return bool(ok) if sync else True

    def n_active_blocks(self) -> int:
        return self._ht.n_active(self.volume)
