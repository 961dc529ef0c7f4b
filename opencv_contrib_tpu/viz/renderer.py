"""Offscreen 3D rasterization on TPU.

The compute core of the `viz` module (reference: modules/viz — VTK-backed
`Viz3d` window with cloud/shape/trajectory widgets, viz3d.hpp; and
modules/ovis' OGRE scene rendering). The reference renders through a GUI
toolkit on the host; the TPU-native design instead rasterizes directly on
device into a framebuffer array so that rendering a reconstruction (SfM
point cloud, KinFu raycast, trajectory frustums) is one jitted dispatch and
composes with the rest of the pipeline (e.g. rendering training views for
RAPID-style trackers or DynaFu debug output).

Three primitives, all static-shape and jit-friendly:

- point splatting with a scatter-min z-buffer (`render_points`),
- 3D line rendering by uniform segment sampling + splatting (`render_lines`),
- triangle-mesh rasterization with perspective-correct barycentric
  interpolation and Lambertian shading, scanned over triangle chunks so the
  (pixels x tris) edge-function tile stays bounded (`render_mesh`).

All take a pinhole intrinsics vector (core.camera.make_intrinsics layout)
and a world->camera SE(3) matrix; +z looks forward, y down (OpenCV
convention, matching the reference's cv::viz camera model).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from opencv_contrib_tpu.core import se3


def _project(K: jnp.ndarray, T_cw: jnp.ndarray, pts: jnp.ndarray):
    """World points (N,3) -> (u, v, z_cam) with z>0 in front."""
    pc = se3.transform_points(T_cw, pts)
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = K[0, 0] * pc[:, 0] / zs + K[0, 2]
    v = K[1, 1] * pc[:, 1] / zs + K[1, 2]
    return u, v, z


def _splat(img, zbuf, u, v, z, colors, valid, point_size: int):
    """Z-buffered splat of point samples into (img, zbuf); returns updated."""
    H, W, _ = img.shape
    npix = H * W
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    r = (point_size - 1) // 2
    offs = [(dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)]
    zflat = zbuf.reshape(npix + 1)
    cflat = img.reshape(-1, 3)
    for dy, dx in offs:
        uu, vv = ui + dx, vi + dy
        ok = valid & (z > 1e-6) & (uu >= 0) & (uu < W) & (vv >= 0) & (vv < H)
        lin = jnp.where(ok, vv * W + uu, npix)
        zflat = zflat.at[lin].min(jnp.where(ok, z, jnp.inf))
        # winners: points whose depth equals (or nearly) the buffer minimum
        win = ok & (z <= zflat[lin] * (1.0 + 1e-6) + 1e-9)
        lin2 = jnp.where(win, lin, npix)
        cflat = jnp.concatenate([cflat, jnp.zeros((1, 3), cflat.dtype)], axis=0)
        cflat = cflat.at[lin2].set(colors)[:npix]
    return cflat.reshape(H, W, 3), zflat


@functools.partial(jax.jit, static_argnames=("height", "width", "point_size"))
def render_points(points, colors, K, T_cw, height: int, width: int,
                  point_size: int = 1, background=None, valid=None,
                  zbuf=None, image=None):
    """Splat a point cloud into an RGB framebuffer with a z-buffer.

    points (N,3) world, colors (N,3) in [0,1]. Returns (image (H,W,3),
    zbuf (H,W)). Pass image/zbuf to compose over a previous render.
    """
    if image is None:
        bg = jnp.zeros(3) if background is None else jnp.asarray(background)
        image = jnp.broadcast_to(bg, (height, width, 3)).astype(jnp.float32)
    if zbuf is None:
        zbuf = jnp.full((height * width + 1,), jnp.inf, jnp.float32)
    else:
        zbuf = zbuf.reshape(-1)
        if zbuf.shape[0] == height * width:
            zbuf = jnp.concatenate([zbuf, jnp.array([jnp.inf])])
    if valid is None:
        valid = jnp.ones(points.shape[0], bool)
    u, v, z = _project(K, T_cw, points)
    img, zflat = _splat(image, zbuf, u, v, z, colors, valid, point_size)
    return img, zflat[: height * width].reshape(height, width)


@functools.partial(jax.jit, static_argnames=("height", "width", "samples_per_line", "thickness"))
def render_lines(starts, ends, colors, K, T_cw, height: int, width: int,
                 samples_per_line: int = 128, thickness: int = 1,
                 background=None, valid=None, zbuf=None, image=None):
    """Render 3D segments (L,3)->(L,3) by uniform sampling + z-splatting."""
    L = starts.shape[0]
    t = jnp.linspace(0.0, 1.0, samples_per_line)
    pts = starts[:, None, :] + t[None, :, None] * (ends - starts)[:, None, :]
    pts = pts.reshape(L * samples_per_line, 3)
    cols = jnp.repeat(colors, samples_per_line, axis=0)
    if valid is None:
        vmask = jnp.ones(L * samples_per_line, bool)
    else:
        vmask = jnp.repeat(valid, samples_per_line)
    return render_points(pts, cols, K, T_cw, height, width,
                         point_size=thickness, background=background,
                         valid=vmask, zbuf=zbuf, image=image)


@functools.partial(jax.jit, static_argnames=("height", "width", "chunk", "shade"))
def render_mesh(vertices, faces, face_colors, K, T_cw, height: int, width: int,
                chunk: int = 64, shade: bool = True, background=None,
                light_dir=(0.3, -0.5, -0.8), ambient: float = 0.35,
                zbuf=None, image=None):
    """Rasterize a triangle mesh with a per-pixel z-buffer.

    vertices (V,3) world, faces (F,3) int32, face_colors (F,3). Scans over
    triangle chunks: each step evaluates edge functions for all pixels
    against `chunk` triangles and folds the depth-min — so peak memory is
    O(H*W*chunk), never O(H*W*F).
    """
    H, W = height, width
    F = faces.shape[0]
    pad = (-F) % chunk
    if pad:
        faces = jnp.concatenate([faces, jnp.zeros((pad, 3), faces.dtype)], 0)
        face_colors = jnp.concatenate(
            [face_colors, jnp.zeros((pad, 3), face_colors.dtype)], 0)
        fvalid = jnp.concatenate([jnp.ones(F, bool), jnp.zeros(pad, bool)])
    else:
        fvalid = jnp.ones(F, bool)

    u, v, z = _project(K, T_cw, vertices)
    tri_u = u[faces]  # (F',3)
    tri_v = v[faces]
    tri_z = z[faces]

    # flat Lambertian shading from world-space face normals
    if shade:
        p0, p1, p2 = (vertices[faces[:, i]] for i in range(3))
        n = jnp.cross(p1 - p0, p2 - p0)
        n = n / (jnp.linalg.norm(n, axis=1, keepdims=True) + 1e-12)
        ld = jnp.asarray(light_dir, jnp.float32)
        ld = ld / jnp.linalg.norm(ld)
        lam = jnp.abs(n @ ld)
        shadef = ambient + (1.0 - ambient) * lam
        face_colors = face_colors * shadef[:, None]

    px = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0).reshape(-1)
    py = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1).reshape(-1)

    nchunks = faces.shape[0] // chunk

    def step(carry, ci):
        zmin, cbuf = carry
        sl = ci * chunk
        au = jax.lax.dynamic_slice(tri_u, (sl, 0), (chunk, 3))
        av = jax.lax.dynamic_slice(tri_v, (sl, 0), (chunk, 3))
        az = jax.lax.dynamic_slice(tri_z, (sl, 0), (chunk, 3))
        ac = jax.lax.dynamic_slice(face_colors, (sl, 0), (chunk, 3))
        aval = jax.lax.dynamic_slice(fvalid, (sl,), (chunk,))
        aval = aval & jnp.all(az > 1e-6, axis=1)

        # edge functions: (pixels, chunk)
        x0, x1, x2 = au[:, 0][None], au[:, 1][None], au[:, 2][None]
        y0, y1, y2 = av[:, 0][None], av[:, 1][None], av[:, 2][None]
        X, Y = px[:, None], py[:, None]
        w0 = (x2 - x1) * (Y - y1) - (y2 - y1) * (X - x1)
        w1 = (x0 - x2) * (Y - y2) - (y0 - y2) * (X - x2)
        w2 = (x1 - x0) * (Y - y0) - (y1 - y0) * (X - x0)
        area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
        area = jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
        b0, b1, b2 = w0 / area, w1 / area, w2 / area
        inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & aval[None, :]
        # perspective-correct depth: interpolate 1/z in screen space
        inv_z = (b0 / az[:, 0][None] + b1 / az[:, 1][None]
                 + b2 / az[:, 2][None])
        depth = 1.0 / jnp.maximum(inv_z, 1e-12)
        depth = jnp.where(inside, depth, jnp.inf)
        dmin = jnp.min(depth, axis=1)
        amin = jnp.argmin(depth, axis=1)
        hit = dmin < zmin
        zmin = jnp.where(hit, dmin, zmin)
        cbuf = jnp.where(hit[:, None], ac[amin], cbuf)
        return (zmin, cbuf), ()

    if image is None:
        bg = jnp.zeros(3) if background is None else jnp.asarray(background)
        cbuf0 = jnp.broadcast_to(bg, (H * W, 3)).astype(jnp.float32)
    else:
        cbuf0 = image.reshape(H * W, 3)
    zmin0 = (jnp.full((H * W,), jnp.inf, jnp.float32) if zbuf is None
             else zbuf.reshape(-1)[: H * W])
    (zmin, cbuf), _ = jax.lax.scan(step, (zmin0, cbuf0),
                                   jnp.arange(nchunks, dtype=jnp.int32))
    return cbuf.reshape(H, W, 3), zmin.reshape(H, W)


def viewer_pose(eye, target=(0.0, 0.0, 0.0), up=(0.0, -1.0, 0.0)) -> np.ndarray:
    """World->camera SE(3) for a camera at `eye` looking at `target`
    (reference: cv::viz::makeCameraPose semantics, types.hpp)."""
    eye = np.asarray(eye, np.float32)
    target = np.asarray(target, np.float32)
    up = np.asarray(up, np.float32)
    fwd = target - eye
    fwd = fwd / (np.linalg.norm(fwd) + 1e-12)
    right = np.cross(fwd, up)
    if np.linalg.norm(right) < 1e-8:
        up = np.array([0.0, 0.0, 1.0], np.float32)
        right = np.cross(fwd, up)
    right /= np.linalg.norm(right) + 1e-12
    dn = np.cross(fwd, right)
    R_wc = np.stack([right, dn, fwd], axis=1)  # camera axes in world
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R_wc.T
    T[:3, 3] = -R_wc.T @ eye
    return T
