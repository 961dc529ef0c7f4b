"""Synthetic SDF-raymarched depth scenes — the KinFu test fixture.

Parity: rgbd/test/test_kinfu.cpp:36-171 — `Scene` renders depth frames by
sphere-tracing an implicit surface (cube + spheres / rotating primitives)
along a known pose orbit; KinFu must re-estimate the orbit within drift
bounds. Here the raymarcher is a vectorized jnp program.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import se3


def sdf_cube_spheres(p: jnp.ndarray) -> jnp.ndarray:
    """Cube + two spheres around the origin (CubeSpheresScene analog).
    p (..., 3) -> signed distance (...)."""
    # box half-size 0.5 at origin
    q = jnp.abs(p) - 0.5
    box = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1) + jnp.minimum(
        jnp.max(q, axis=-1), 0.0
    )
    s1 = jnp.linalg.norm(p - jnp.array([0.0, 0.7, 0.0]), axis=-1) - 0.3
    s2 = jnp.linalg.norm(p - jnp.array([0.6, -0.3, 0.4]), axis=-1) - 0.2
    # backdrop half-space (solid y >= 1.0) so most rays terminate on a
    # surface — mirrors the reference scene's enclosing geometry
    floor = 1.0 - p[..., 1]
    return jnp.minimum(jnp.minimum(box, floor), jnp.minimum(s1, s2))


def sdf_rounded_room(p: jnp.ndarray) -> jnp.ndarray:
    """A blobby interior scene (RotatingScene analog): plane floor + spheres."""
    floor = p[..., 1] + 0.8
    s1 = jnp.linalg.norm(p - jnp.array([0.3, 0.1, 0.0]), axis=-1) - 0.45
    s2 = jnp.linalg.norm(p - jnp.array([-0.55, -0.2, 0.35]), axis=-1) - 0.3
    k = 8.0  # smooth union
    e = jnp.exp(-k * floor) + jnp.exp(-k * s1) + jnp.exp(-k * s2)
    return -jnp.log(jnp.maximum(e, 1e-12)) / k


@partial(jax.jit, static_argnames=("sdf", "shape", "n_steps"))
def render_depth(
    T_wc: jnp.ndarray,
    intr: jnp.ndarray,
    sdf=sdf_cube_spheres,
    shape=(120, 160),
    n_steps: int = 64,
    max_depth: float = 6.0,
) -> jnp.ndarray:
    """Sphere-trace a depth map from camera pose T_wc (cam->world 4x4).

    Returns depth (H, W) in meters, 0 where no hit (RenderInvoker analog).
    """
    H, W = shape
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    dirs_cam = jnp.stack(
        [(u - intr[2]) / intr[0], (v - intr[3]) / intr[1], jnp.ones((H, W))], axis=-1
    )
    R, t = se3.mat_to_rt(T_wc)
    dirs = jnp.einsum("ij,hwj->hwi", R, dirs_cam)
    origin = t

    def step(carry, _):
        depth_z, done = carry
        # current point along ray: origin + z * dir (z is the *z-depth*, so
        # world distance = z * |dir| per pixel; we march in z directly)
        pt = origin[None, None] + dirs * depth_z[..., None]
        d = sdf(pt)
        hit = d < 1e-3
        done_new = done | hit
        # advance proportionally to sdf (sphere tracing), scaled to z-steps
        dz = d / jnp.maximum(jnp.linalg.norm(dirs, axis=-1), 1e-9)
        depth_new = jnp.where(done_new, depth_z, depth_z + jnp.maximum(dz, 1e-4))
        return (depth_new, done_new), None

    z0 = jnp.full((H, W), 0.2, jnp.float32)
    (z, done), _ = jax.lax.scan(step, (z0, jnp.zeros((H, W), bool)), None, length=n_steps)
    z = jnp.where(done & (z < max_depth), z, 0.0)
    return z


def orbit_poses(n_frames: int, radius: float = 2.2, height: float = 0.3, sweep=0.8):
    """Camera orbit looking at the origin (the test's pose trajectory).
    Returns (n, 4, 4) cam->world poses."""
    from opencv_contrib_tpu.core import camera as cam

    poses = []
    for i in range(n_frames):
        a = sweep * (i / max(n_frames - 1, 1) - 0.5)
        eye = jnp.array(
            [radius * np.sin(a), height * np.cos(3 * a), -radius * np.cos(a)], jnp.float32
        )
        R, t = cam.look_at(eye, jnp.zeros(3))
        T_cw = se3.rt_to_mat(R, t)  # world->cam
        poses.append(np.asarray(se3.inverse(T_cw)))
    return np.stack(poses)
