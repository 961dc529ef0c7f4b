"""Widget geometry generators for the viz module.

Mirrors the reference's widget families (modules/viz/include/opencv2/viz/
widgets.hpp: WCloud, WLine, WPlane, WSphere, WCube, WGrid, WCoordinateSystem,
WTrajectory, WCameraPosition, WPolyLine, WText) as plain geometry
dataclasses. Each widget lowers to one of three primitive batches — points,
3D segments, or triangles — which Viz3d concatenates and hands to the
rasterizer in renderer.py. Geometry generation runs on host with numpy
(static shapes decided at scene build time); rasterization runs on device.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class Geometry:
    """Lowered widget geometry (any field may be empty)."""
    points: np.ndarray  # (N,3)
    point_colors: np.ndarray  # (N,3)
    lines: np.ndarray  # (L,2,3) segment endpoints
    line_colors: np.ndarray  # (L,3)
    tris: np.ndarray  # (F,3,3) triangle vertices
    tri_colors: np.ndarray  # (F,3)

    @staticmethod
    def empty() -> "Geometry":
        z = np.zeros
        return Geometry(z((0, 3), np.float32), z((0, 3), np.float32),
                        z((0, 2, 3), np.float32), z((0, 3), np.float32),
                        z((0, 3, 3), np.float32), z((0, 3), np.float32))

    def transformed(self, pose: np.ndarray) -> "Geometry":
        R, t = pose[:3, :3], pose[:3, 3]

        def tp(p):
            return (p.reshape(-1, 3) @ R.T + t).reshape(p.shape)

        return Geometry(tp(self.points), self.point_colors,
                        tp(self.lines), self.line_colors,
                        tp(self.tris), self.tri_colors)


def merge(geoms) -> Geometry:
    gs = list(geoms)
    if not gs:
        return Geometry.empty()
    return Geometry(
        np.concatenate([g.points for g in gs], 0),
        np.concatenate([g.point_colors for g in gs], 0),
        np.concatenate([g.lines for g in gs], 0),
        np.concatenate([g.line_colors for g in gs], 0),
        np.concatenate([g.tris for g in gs], 0),
        np.concatenate([g.tri_colors for g in gs], 0),
    )


def _col(color, n):
    c = np.asarray(color, np.float32).reshape(-1)
    if c.size == 3:
        return np.broadcast_to(c, (n, 3)).copy()
    return c.reshape(n, 3).astype(np.float32)


def cloud(points, colors=(1.0, 1.0, 1.0)) -> Geometry:
    """WCloud (widgets.hpp WCloud): colored point cloud."""
    g = Geometry.empty()
    pts = np.asarray(points, np.float32).reshape(-1, 3)
    g.points = pts
    g.point_colors = _col(colors, len(pts))
    return g


def line(p0, p1, color=(1.0, 1.0, 1.0)) -> Geometry:
    g = Geometry.empty()
    g.lines = np.array([[p0, p1]], np.float32)
    g.line_colors = _col(color, 1)
    return g


def polyline(points, color=(1.0, 1.0, 1.0)) -> Geometry:
    """WPolyLine: consecutive points joined by segments."""
    pts = np.asarray(points, np.float32).reshape(-1, 3)
    g = Geometry.empty()
    if len(pts) >= 2:
        g.lines = np.stack([pts[:-1], pts[1:]], axis=1)
        g.line_colors = _col(color, len(pts) - 1)
    return g


def cube(min_pt=(-0.5, -0.5, -0.5), max_pt=(0.5, 0.5, 0.5),
         color=(1.0, 1.0, 1.0), wireframe=False) -> Geometry:
    mn = np.asarray(min_pt, np.float32)
    mx = np.asarray(max_pt, np.float32)
    corners = np.array([[mn[0], mn[1], mn[2]], [mx[0], mn[1], mn[2]],
                        [mx[0], mx[1], mn[2]], [mn[0], mx[1], mn[2]],
                        [mn[0], mn[1], mx[2]], [mx[0], mn[1], mx[2]],
                        [mx[0], mx[1], mx[2]], [mn[0], mx[1], mx[2]]],
                       np.float32)
    g = Geometry.empty()
    if wireframe:
        e = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
             (0, 4), (1, 5), (2, 6), (3, 7)]
        g.lines = np.stack([corners[[a for a, _ in e]],
                            corners[[b for _, b in e]]], axis=1)
        g.line_colors = _col(color, len(e))
    else:
        quads = [(0, 1, 2, 3), (4, 5, 6, 7), (0, 1, 5, 4),
                 (2, 3, 7, 6), (0, 3, 7, 4), (1, 2, 6, 5)]
        tris = []
        for a, b, c, d in quads:
            tris.append(corners[[a, b, c]])
            tris.append(corners[[a, c, d]])
        g.tris = np.stack(tris)
        g.tri_colors = _col(color, len(tris))
    return g


def plane(center=(0, 0, 0), normal=(0, 0, 1), size=1.0,
          color=(1.0, 1.0, 1.0)) -> Geometry:
    n = np.asarray(normal, np.float32)
    n = n / (np.linalg.norm(n) + 1e-12)
    a = np.array([1.0, 0, 0], np.float32)
    if abs(n @ a) > 0.9:
        a = np.array([0, 1.0, 0], np.float32)
    u = np.cross(n, a); u /= np.linalg.norm(u)
    v = np.cross(n, u)
    c = np.asarray(center, np.float32)
    h = size / 2.0
    q = np.stack([c - h * u - h * v, c + h * u - h * v,
                  c + h * u + h * v, c - h * u + h * v])
    g = Geometry.empty()
    g.tris = np.stack([q[[0, 1, 2]], q[[0, 2, 3]]])
    g.tri_colors = _col(color, 2)
    return g


def sphere(center=(0, 0, 0), radius=1.0, color=(1.0, 1.0, 1.0),
           resolution=12) -> Geometry:
    th = np.linspace(0, np.pi, resolution)
    ph = np.linspace(0, 2 * np.pi, 2 * resolution, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    x = np.sin(T) * np.cos(P); y = np.sin(T) * np.sin(P); z = np.cos(T)
    V = np.stack([x, y, z], axis=-1) * radius + np.asarray(center, np.float32)
    tris = []
    nph = len(ph)
    for i in range(resolution - 1):
        for j in range(nph):
            jn = (j + 1) % nph
            tris.append(np.stack([V[i, j], V[i + 1, j], V[i + 1, jn]]))
            tris.append(np.stack([V[i, j], V[i + 1, jn], V[i, jn]]))
    g = Geometry.empty()
    g.tris = np.stack(tris).astype(np.float32)
    g.tri_colors = _col(color, len(tris))
    return g


def grid(cells=(10, 10), cell_size=(0.1, 0.1), color=(0.5, 0.5, 0.5)) -> Geometry:
    """WGrid: xy-plane grid of lines centred at origin."""
    nx, ny = cells
    sx, sy = cell_size
    x0, y0 = -nx * sx / 2, -ny * sy / 2
    segs = []
    for i in range(nx + 1):
        segs.append([[x0 + i * sx, y0, 0], [x0 + i * sx, -y0, 0]])
    for j in range(ny + 1):
        segs.append([[x0, y0 + j * sy, 0], [-x0, y0 + j * sy, 0]])
    g = Geometry.empty()
    g.lines = np.asarray(segs, np.float32)
    g.line_colors = _col(color, len(segs))
    return g


def coordinate_system(scale=1.0) -> Geometry:
    """WCoordinateSystem: RGB <-> xyz axis triad."""
    o = np.zeros(3, np.float32)
    g = Geometry.empty()
    g.lines = np.array([[o, [scale, 0, 0]], [o, [0, scale, 0]],
                        [o, [0, 0, scale]]], np.float32)
    g.line_colors = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    return g


def camera_frustum(K=None, fov=(0.9, 0.7), scale=0.3,
                   color=(1.0, 1.0, 1.0), image_size=None) -> Geometry:
    """WCameraPosition: wireframe frustum for a camera at the origin
    looking down +z (widgets.hpp WCameraPosition(K, scale))."""
    if K is not None and image_size is not None:
        W, H = image_size
        hx = scale * (W / 2) / K[0][0] if not hasattr(K, "shape") else scale * (W / 2) / float(K[0, 0])
        hy = scale * (H / 2) / float(np.asarray(K)[1, 1])
    else:
        hx = scale * np.tan(fov[0] / 2)
        hy = scale * np.tan(fov[1] / 2)
    o = np.zeros(3, np.float32)
    c = np.array([[-hx, -hy, scale], [hx, -hy, scale],
                  [hx, hy, scale], [-hx, hy, scale]], np.float32)
    segs = [[o, c[0]], [o, c[1]], [o, c[2]], [o, c[3]],
            [c[0], c[1]], [c[1], c[2]], [c[2], c[3]], [c[3], c[0]]]
    g = Geometry.empty()
    g.lines = np.asarray(segs, np.float32)
    g.line_colors = _col(color, len(segs))
    return g


def trajectory(poses, scale=0.15, color=(0.2, 0.9, 0.2),
               frustums=True, path_color=(1.0, 1.0, 0.2)) -> Geometry:
    """WTrajectory: camera path as a polyline + per-pose frustums.

    poses: (N,4,4) camera->world matrices (reference passes Affine3d
    camera poses, widgets.hpp WTrajectory).
    """
    poses = np.asarray(poses, np.float32)
    centers = poses[:, :3, 3]
    parts = [polyline(centers, path_color)]
    if frustums:
        fr = camera_frustum(scale=scale, color=color)
        for P in poses:
            parts.append(fr.transformed(P))
    return merge(parts)


def normals(points, normal_vecs, length=0.05, color=(0.3, 0.6, 1.0)) -> Geometry:
    """WCloudNormals: short segments along per-point normals."""
    p = np.asarray(points, np.float32).reshape(-1, 3)
    n = np.asarray(normal_vecs, np.float32).reshape(-1, 3)
    g = Geometry.empty()
    g.lines = np.stack([p, p + length * n], axis=1)
    g.line_colors = _col(color, len(p))
    return g
