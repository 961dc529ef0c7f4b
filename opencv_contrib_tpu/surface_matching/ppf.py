"""Point-pair-feature detection (Drost et al., the reference's PPF3DDetector).

PPF(p1, p2) = (|d|, angle(n1, d), angle(n2, d), angle(n1, n2)), quantized.
Training hashes model pair features; matching votes over (model reference
point, rotation angle) for scene pairs with matching features.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


def compute_ppf_features(p1, n1, p2, n2):
    """Batched PPF: p*, n* (..., 3) -> (..., 4)."""
    d = p2 - p1
    dn = jnp.linalg.norm(d, axis=-1)
    dhat = d / jnp.maximum(dn[..., None], 1e-9)

    def ang(a, b):
        return jnp.arccos(jnp.clip(jnp.sum(a * b, axis=-1), -1.0, 1.0))

    return jnp.stack([dn, ang(n1, dhat), ang(n2, dhat), ang(n1, n2)], axis=-1)


def _quantize(f, dist_step, angle_step):
    q0 = (f[..., 0] / dist_step).astype(jnp.int32)
    q1 = (f[..., 1] / angle_step).astype(jnp.int32)
    q2 = (f[..., 2] / angle_step).astype(jnp.int32)
    q3 = (f[..., 3] / angle_step).astype(jnp.int32)
    # pack into int32 (7 bits each is plenty at default steps)
    return (jnp.clip(q0, 0, 127) << 21) | (jnp.clip(q1, 0, 127) << 14) | (jnp.clip(q2, 0, 127) << 7) | jnp.clip(q3, 0, 127)


def _pair_alpha(p1, n1, p2):
    """In-plane rotation angle of the pair about the reference normal
    (the alpha_m of the Drost voting scheme)."""
    # build frame: z = n1
    z = n1
    a = jnp.where(jnp.abs(z[..., 0:1]) < 0.9, jnp.array([1.0, 0, 0]), jnp.array([0, 1.0, 0]))
    x = jnp.cross(a, z)
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-9)
    y = jnp.cross(z, x)
    d = p2 - p1
    return jnp.arctan2(jnp.sum(d * y, axis=-1), jnp.sum(d * x, axis=-1))


class PPFModel(NamedTuple):
    points: jnp.ndarray  # (M, 3) sampled model points
    normals: jnp.ndarray  # (M, 3)
    keys: jnp.ndarray  # (P,) sorted quantized features of model pairs
    ref_idx: jnp.ndarray  # (P,) reference (first) point index per pair
    alpha: jnp.ndarray  # (P,) model in-plane angle per pair
    dist_step: jnp.ndarray
    angle_step: jnp.ndarray
    diameter: jnp.ndarray


def train_model(points, normals, sampling_step: int = 2, dist_quant: float = 0.05, angle_bins: int = 30) -> PPFModel:
    """PPF3DDetector::trainModel: subsample, compute all pair features,
    sort by quantized key."""
    pts = jnp.asarray(points, jnp.float32)[::sampling_step]
    nrm = jnp.asarray(normals, jnp.float32)[::sampling_step]
    M = pts.shape[0]
    diameter = jnp.max(jnp.linalg.norm(pts[:, None] - pts[None], axis=-1))
    dist_step = dist_quant * diameter
    angle_step = jnp.pi / angle_bins

    i = jnp.repeat(jnp.arange(M), M)
    j = jnp.tile(jnp.arange(M), M)
    keep = i != j
    f = compute_ppf_features(pts[i], nrm[i], pts[j], nrm[j])
    keys = jnp.where(keep, _quantize(f, dist_step, angle_step), jnp.int32(2**31 - 1))
    alpha = _pair_alpha(pts[i], nrm[i], pts[j])
    order = jnp.argsort(keys)
    return PPFModel(
        points=pts, normals=nrm, keys=keys[order], ref_idx=i[order].astype(jnp.int32),
        alpha=alpha[order], dist_step=dist_step, angle_step=angle_step, diameter=diameter,
    )


def match(model: PPFModel, scene_points, scene_normals, scene_step: int = 4, n_angle_bins: int = 30, max_matches_per_key: int = 8):
    """PPF3DDetector::match: for each scene reference point, vote over
    (model ref point, alpha difference) using pairs with matching features;
    return the best (R, t) hypothesis by vote count.

    Returns (T (4, 4) model->scene, votes)."""
    spts = jnp.asarray(scene_points, jnp.float32)[::scene_step]
    snrm = jnp.asarray(scene_normals, jnp.float32)[::scene_step]
    S = spts.shape[0]
    M = model.points.shape[0]

    i = jnp.repeat(jnp.arange(S), S)
    j = jnp.tile(jnp.arange(S), S)
    keep = i != j
    f = compute_ppf_features(spts[i], snrm[i], spts[j], snrm[j])
    keys = _quantize(f, model.dist_step, model.angle_step)
    alpha_s = _pair_alpha(spts[i], snrm[i], spts[j])

    # join scene pairs to model pairs via searchsorted + linear probe of
    # up to max_matches_per_key entries with the same key
    start = jnp.searchsorted(model.keys, keys)
    A = n_angle_bins
    acc = jnp.zeros((S, M, A))
    P = model.keys.shape[0]
    for k in range(max_matches_per_key):
        idx = jnp.clip(start + k, 0, P - 1)
        ok = keep & (model.keys[idx] == keys)
        m_ref = model.ref_idx[idx]
        dalpha = model.alpha[idx] - alpha_s
        abin = (jnp.mod(dalpha + jnp.pi, 2 * jnp.pi) / (2 * jnp.pi) * A).astype(jnp.int32)
        abin = jnp.clip(abin, 0, A - 1)
        acc = acc.at[i, m_ref, abin].add(ok.astype(jnp.float32))

    flat = acc.reshape(-1)
    best = jnp.argmax(flat)
    votes = flat[best]
    s_ref = best // (M * A)
    m_ref = (best // A) % M
    abin = best % A
    alpha = (abin.astype(jnp.float32) + 0.5) / A * 2 * jnp.pi - jnp.pi

    # recover pose: align model ref point/normal to scene ref point/normal,
    # then rotate by alpha about the normal
    T = _pose_from_correspondence(
        model.points[m_ref], model.normals[m_ref], spts[s_ref], snrm[s_ref], alpha
    )
    return T, votes


def _axis_frame(n):
    z = n
    a = jnp.where(jnp.abs(z[0]) < 0.9, jnp.array([1.0, 0, 0]), jnp.array([0, 1.0, 0]))
    x = jnp.cross(a, z)
    x = x / jnp.maximum(jnp.linalg.norm(x), 1e-9)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=0)  # rows


def _pose_from_correspondence(pm, nm, ps, ns, alpha):
    """T such that pm -> ps, nm -> ns, with in-plane rotation alpha."""
    Fm = _axis_frame(nm)  # model frame -> canonical
    Fs = _axis_frame(ns)
    c, s = jnp.cos(alpha), jnp.sin(alpha)
    Rz = jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    R = Fs.T @ Rz @ Fm
    t = ps - R @ pm
    T = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)
    return T
