"""hdf — HDF5 checkpoint/IO layer (reference: modules/hdf).

API twin of cv::hdf::HDF5 (hdf/include/opencv2/hdf/hdf5.hpp:56-198):
dataset create/read/write with chunking + gzip compression, group
management, attributes, and keypoint datasets. Backed by libhdf5 through
h5py (present in the image), so files interoperate with the reference's
output. Device arrays (jax.Array) are accepted directly and staged through
host memory; large-array model checkpointing for the SLAM stack remains in
parallel.checkpoint (orbax) — this module is the *interchange* format, the
role hdf plays upstream.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

try:
    import h5py
    _HAVE_H5 = True
except Exception:  # pragma: no cover
    _HAVE_H5 = False


class HDF5:
    """cv::hdf::HDF5 twin (hdf5.hpp:56). Use hdf.open(path)."""

    # unlimited-dimension marker (hdf5.hpp H5_UNLIMITED)
    UNLIMITED = -1

    def __init__(self, path: str, mode: str = "a"):
        if not _HAVE_H5:
            raise RuntimeError("h5py not available")
        self._f = h5py.File(path, mode)

    # --- lifecycle ---
    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # --- groups (hdf5.hpp grcreate/hlexists) ---
    def grcreate(self, name: str):
        self._f.require_group(name)

    def hlexists(self, name: str) -> bool:
        return name in self._f

    def exists(self, name: str) -> bool:
        return name in self._f

    # --- datasets (hdf5.hpp dscreate:144 / dswrite / dsread / dsinsert) ---
    def dscreate(self, rows_or_shape, cols: Optional[int] = None,
                 dtype=np.float32, dslabel: str = "",
                 compresslevel: int = 0,
                 dims_chunks: Optional[Sequence[int]] = None):
        shape = (tuple(rows_or_shape) if cols is None
                 else (int(rows_or_shape), int(cols)))
        maxshape = tuple(None if s == self.UNLIMITED else s for s in shape)
        shape = tuple(0 if s == self.UNLIMITED else s for s in shape)
        kw = {}
        if compresslevel > 0:
            kw.update(compression="gzip", compression_opts=int(compresslevel))
        if dims_chunks is not None:
            kw.update(chunks=tuple(dims_chunks))
        elif any(m is None for m in maxshape) or compresslevel > 0:
            kw.update(chunks=True)
        self._f.create_dataset(dslabel, shape=shape, maxshape=maxshape,
                               dtype=np.dtype(dtype), **kw)

    def dswrite(self, array, dslabel: str,
                dims_offset: Optional[Sequence[int]] = None):
        arr = np.asarray(array)
        if dslabel not in self._f:
            self._f.create_dataset(dslabel, data=arr)
            return
        ds = self._f[dslabel]
        if dims_offset is None:
            if ds.shape != arr.shape:
                ds.resize(arr.shape)
            ds[...] = arr
        else:
            off = tuple(int(o) for o in dims_offset)
            end = tuple(o + s for o, s in zip(off, arr.shape))
            need = tuple(max(e, c) for e, c in zip(end, ds.shape))
            if need != ds.shape:
                ds.resize(need)
            ds[tuple(slice(o, e) for o, e in zip(off, end))] = arr

    # dsinsert == offset write in the reference (hdf5.hpp:168)
    def dsinsert(self, array, dslabel: str,
                 dims_offset: Optional[Sequence[int]] = None):
        self.dswrite(array, dslabel, dims_offset)

    def dsread(self, dslabel: str,
               dims_offset: Optional[Sequence[int]] = None,
               dims_counts: Optional[Sequence[int]] = None) -> np.ndarray:
        ds = self._f[dslabel]
        if dims_offset is None:
            return ds[...]
        off = tuple(int(o) for o in dims_offset)
        cnt = (tuple(int(c) for c in dims_counts) if dims_counts is not None
               else tuple(s - o for s, o in zip(ds.shape, off)))
        return ds[tuple(slice(o, o + c) for o, c in zip(off, cnt))]

    def dsgetsize(self, dslabel: str):
        return tuple(self._f[dslabel].shape)

    def dsgettype(self, dslabel: str):
        return self._f[dslabel].dtype

    def dsdelete(self, dslabel: str):
        del self._f[dslabel]

    # --- attributes (hdf5.hpp atwrite/atread/atexists/atdelete :183-198) ---
    def atwrite(self, value, atlabel: str):
        if isinstance(value, str):
            self._f.attrs[atlabel] = value
        else:
            self._f.attrs[atlabel] = np.asarray(value)

    def atread(self, atlabel: str):
        v = self._f.attrs[atlabel]
        if isinstance(v, bytes):
            return v.decode()
        return v

    def atexists(self, atlabel: str) -> bool:
        return atlabel in self._f.attrs

    def atdelete(self, atlabel: str):
        del self._f.attrs[atlabel]

    # --- keypoints (hdf5.hpp kpcreate/kpwrite/kpread — stored as the
    # reference's 6-field KeyPoint records) ---
    # field names match the reference's compound type (hdf5.cpp:1199 writes
    # xpos/ypos/size/angle/response/octave/class_id) so keypoint datasets
    # interoperate with reference-written files
    _KP_DTYPE = np.dtype([("xpos", "f4"), ("ypos", "f4"), ("size", "f4"),
                          ("angle", "f4"), ("response", "f4"),
                          ("octave", "i4"), ("class_id", "i4")])

    def kpwrite(self, keypoints, kplabel: str):
        """keypoints: (N,>=2) array [x, y, size, angle, response, octave,
        class_id] (missing columns default to 0/-1)."""
        raw = np.asarray(keypoints).reshape(len(keypoints), -1)
        kp = raw.astype(np.float32)
        rec = np.zeros(len(kp), self._KP_DTYPE)
        names = ["xpos", "ypos", "size", "angle", "response"]
        for i, n in enumerate(names[: min(5, kp.shape[1])]):
            rec[n] = kp[:, i]
        # octave/class_id sliced from the ORIGINAL input: OpenCV packs
        # layer/scale bits into octave's high bytes, which a float32
        # round-trip would destroy
        rec["octave"] = (raw[:, 5].astype(np.int32) if raw.shape[1] > 5 else 0)
        rec["class_id"] = (raw[:, 6].astype(np.int32) if raw.shape[1] > 6
                           else -1)
        if kplabel in self._f:
            del self._f[kplabel]
        self._f.create_dataset(kplabel, data=rec)

    def kpread(self, kplabel: str) -> np.ndarray:
        rec = self._f[kplabel][...]
        names = rec.dtype.names
        out = np.zeros((len(rec), 7), np.float32)
        for i, n in enumerate(["xpos", "ypos", "size", "angle", "response",
                               "octave", "class_id"]):
            # accept both the reference layout (xpos/ypos) and the legacy
            # in-repo layout (x/y)
            key = n if n in names else {"xpos": "x", "ypos": "y"}.get(n, n)
            if key in names:
                out[:, i] = rec[key]
        return out

    def kpgetsize(self, kplabel: str) -> int:
        return int(self._f[kplabel].shape[0])


def open(path: str, mode: str = "a") -> HDF5:
    """cv::hdf::open twin (hdf5.hpp:836)."""
    return HDF5(path, mode)


__all__ = ["HDF5", "open"]
