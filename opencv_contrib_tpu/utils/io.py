"""Image + array IO.

Parity: the reference leans on main-repo imgcodecs for images and the hdf
module (HDF5::dscreate/dswrite, hdf/include/opencv2/hdf/hdf5.hpp:56-198)
for bulk arrays / checkpoints. Here: PIL-backed image IO (host-side only)
and an npz-based checkpoint store with the same "named dataset" contract;
reconstruction import/export in a bundler-like text format
(sfm/src/io.cpp io_bundler.h parity).
"""

from __future__ import annotations

import os
from typing import Mapping

import numpy as np


def imread(path: str, gray: bool = False) -> np.ndarray:
    """Load an image as float32 in [0, 1] (H, W[, 3])."""
    from PIL import Image

    img = Image.open(path)
    if gray:
        img = img.convert("L")
    arr = np.asarray(img)
    if arr.dtype == np.uint8:
        return arr.astype(np.float32) / 255.0
    if arr.dtype == np.uint16:
        return arr.astype(np.float32) / 65535.0
    return arr.astype(np.float32)


def imread_depth_tum(path: str, scale: float = 5000.0) -> np.ndarray:
    """TUM RGB-D 16-bit PNG depth -> meters (0 = invalid)."""
    from PIL import Image

    arr = np.asarray(Image.open(path)).astype(np.float32)
    return arr / scale


def imwrite(path: str, img: np.ndarray):
    """Write an image: float arrays are treated as [0, 1], uint8 as-is."""
    from PIL import Image

    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


# ----------------------------------------------------------------------------
# Checkpoint store (hdf-module parity at the API level)
# ----------------------------------------------------------------------------


def save_checkpoint(path: str, arrays: Mapping[str, np.ndarray], attrs: Mapping | None = None):
    """Write named arrays (+ scalar attributes) — HDF5::dswrite/atwrite
    contract on an npz container."""
    payload = {k: np.asarray(v) for k, v in arrays.items()}
    if attrs:
        for k, v in attrs.items():
            payload[f"__attr__{k}"] = np.asarray(v)
    np.savez_compressed(path, **payload)


def load_checkpoint(path: str):
    """-> (arrays dict, attrs dict)."""
    data = np.load(path, allow_pickle=False)
    arrays, attrs = {}, {}
    for k in data.files:
        if k.startswith("__attr__"):
            attrs[k[len("__attr__"):]] = data[k]
        else:
            arrays[k] = data[k]
    return arrays, attrs


# ----------------------------------------------------------------------------
# Reconstruction export/import (bundler-format parity, sfm/src/io_bundler.h)
# ----------------------------------------------------------------------------


def export_reconstruction(path: str, Rs, ts, points, intr, registered=None, has_point=None):
    """Bundler-like text dump: header, per-camera f k1 k2 / R / t, points."""
    Rs = np.asarray(Rs)
    ts = np.asarray(ts)
    points = np.asarray(points)
    if registered is None:
        registered = np.ones(len(Rs), bool)
    if has_point is None:
        has_point = np.ones(len(points), bool)
    cams = np.flatnonzero(registered)
    pts = np.flatnonzero(has_point)
    with open(path, "w") as f:
        f.write("# Bundle file v0.3\n")
        f.write(f"{len(cams)} {len(pts)}\n")
        for c in cams:
            f.write(f"{intr[0]} {intr[4]} {intr[5]}\n")
            for row in Rs[c]:
                f.write(" ".join(f"{x:.9g}" for x in row) + "\n")
            f.write(" ".join(f"{x:.9g}" for x in ts[c]) + "\n")
        for p in pts:
            f.write(" ".join(f"{x:.9g}" for x in points[p]) + "\n")
            f.write("255 255 255\n0\n")


def import_reconstruction(path: str):
    """-> (Rs (C,3,3), ts (C,3), points (P,3), f_k1_k2 (C,3))."""
    with open(path) as f:
        lines = [l.strip() for l in f if not l.startswith("#")]
    n_cams, n_pts = map(int, lines[0].split())
    i = 1
    Rs, ts, intrs = [], [], []
    for _ in range(n_cams):
        intrs.append([float(x) for x in lines[i].split()])
        Rs.append([[float(x) for x in lines[i + r].split()] for r in (1, 2, 3)])
        ts.append([float(x) for x in lines[i + 4].split()])
        i += 5
    pts = []
    for _ in range(n_pts):
        pts.append([float(x) for x in lines[i].split()])
        i += 3
    return np.array(Rs, np.float32), np.array(ts, np.float32), np.array(pts, np.float32), np.array(intrs, np.float32)
