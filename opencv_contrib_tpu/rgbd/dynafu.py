"""DynaFu: non-rigid dense fusion driver.

Reference anchor: rgbd/src/dynafu.cpp (DynaFuImpl::updateT — gated
experimental upstream): a canonical TSDF volume plus a warp field; each
frame is (1) rigidly tracked, (2) the warp field is non-rigidly fitted so
the warped canonical surface matches the live depth, (3) the live depth is
integrated into the CANONICAL volume through the inverse warp.

TPU-first composition of existing pieces: rgbd.tsdf (canonical volume,
raycast), rgbd.icp (rigid step), rgbd.warpfield (DQB nodes + autodiff
nonrigid fit). The inverse warp for integration uses the standard
approximation warp^-1(x) ~ x - (warp(x) - x) for small deformations (the
reference does the same via per-voxel DQB of inverted node transforms).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import se3
from opencv_contrib_tpu.rgbd import tsdf as tsdf_mod
from opencv_contrib_tpu.rgbd import warpfield as wf_mod
from opencv_contrib_tpu.rgbd.frame import compute_normals, depth_to_points


class DynaFu:
    """Minimal DynaFu loop: rigid pose assumed identity (camera static,
    scene deforming — the reference's demo setting); per-frame nonrigid
    fit + canonical integration."""

    def __init__(self, intr, volume_resolution=(64, 64, 64), volume_size: float = 2.0,
                 volume_center=(0.0, 0.0, 1.5), n_nodes: int = 64, node_sigma: float = 0.15,
                 frame_shape=(120, 160)):
        self.intr = jnp.asarray(intr, jnp.float32)
        self.volume = tsdf_mod.create(volume_resolution, volume_size, volume_center)
        self.frame_shape = frame_shape
        self.n_nodes = n_nodes
        self.node_sigma = node_sigma
        self.warp = None
        self.nbrs = None
        self.frame_count = 0

    def _init_nodes(self, pts, valid):
        """Sample warp nodes from the first surface (warpfield node init)."""
        p = np.asarray(pts).reshape(-1, 3)
        v = np.asarray(valid).reshape(-1)
        cand = p[v]
        idx = np.linspace(0, len(cand) - 1, self.n_nodes).astype(int)
        self.warp = wf_mod.make_warpfield(cand[idx], sigma=self.node_sigma)
        self.nbrs = wf_mod.node_neighbors(self.warp.nodes)

    def update(self, depth) -> bool:
        depth = jnp.asarray(depth, jnp.float32)
        pts = depth_to_points(depth, self.intr)
        valid = depth > 0
        if self.frame_count == 0:
            self.volume = tsdf_mod.integrate(self.volume, depth, self.intr, jnp.eye(4))
            self._init_nodes(pts, valid)
            self.frame_count = 1
            return True

        # canonical surface points (raycast at identity)
        cpts, _, cvalid = tsdf_mod.raycast(self.volume, self.intr, jnp.eye(4), self.frame_shape)
        normals, _ = compute_normals(pts, valid)
        # correspondences by pixel (projective association at identity pose)
        m = (cvalid & valid).reshape(-1)
        src = cpts.reshape(-1, 3)
        tgt = pts.reshape(-1, 3)
        nrm = normals.reshape(-1, 3)
        w = m.astype(jnp.float32)
        # fit warp so that warp(canonical) ~ live (masked point-to-plane)
        self.warp = wf_mod.fit(self.warp, src, tgt, nrm * w[:, None], self.nbrs,
                               iters=40, lr=0.1, lam=0.5)

        # integrate live depth into the canonical volume through the
        # inverse warp: resample the depth as canonical-frame points
        warped = wf_mod.warp_points(self.warp, src)
        # residual after fit (tracking quality)
        res = jnp.linalg.norm((warped - tgt) * w[:, None], axis=1).sum() / jnp.maximum(w.sum(), 1)
        # deform the volume sampling: integrate with depth looked up at the
        # warped positions -> approximate by rendering a pseudo-depth map of
        # the warped canonical surface fused with live depth
        u = warped[:, 0] / jnp.maximum(warped[:, 2], 1e-6) * self.intr[0] + self.intr[2]
        v = warped[:, 1] / jnp.maximum(warped[:, 2], 1e-6) * self.intr[1] + self.intr[3]
        H, W = self.frame_shape
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
        live_z = depth[vi, ui]
        ok = m & (live_z > 0)
        # back-deformed depth: canonical z + (live z - warped z)
        z_canon = jnp.where(ok, src[:, 2] + (live_z - warped[:, 2]), 0.0)
        pseudo = jnp.zeros(H * W).at[(vi * W + ui)].max(jnp.where(ok, z_canon, 0.0))
        pseudo = pseudo.reshape(H, W)
        pseudo = jnp.where(pseudo > 0, pseudo, jnp.where(valid & ~cvalid, depth, 0.0))
        self.volume = tsdf_mod.integrate(self.volume, pseudo, self.intr, jnp.eye(4))
        self.frame_count += 1
        return bool(res < 0.05)

    def get_cloud(self, max_points: int = 16384):
        """Canonical-frame surface (fetchPointsNormals-analog)."""
        return tsdf_mod.extract_points(self.volume, max_points)

    def render_live(self):
        """Raycast the canonical surface and warp it to the live frame."""
        cpts, _, cvalid = tsdf_mod.raycast(self.volume, self.intr, jnp.eye(4), self.frame_shape)
        warped = wf_mod.warp_points(self.warp, cpts.reshape(-1, 3)).reshape(cpts.shape)
        return warped, cvalid
