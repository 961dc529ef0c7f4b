"""ctypes bindings for the native IO runtime (native/libocvtpu_io.so).

The C++ side (native/dataset_loader.cpp) owns PNG decode, TUM association,
and a threaded prefetch queue; Python only moves ready float buffers to the
device. Falls back to the pure-Python readers in utils.datasets/io when the
shared library hasn't been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _find_lib():
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cand = os.path.join(here, "native", "libocvtpu_io.so")
    return cand if os.path.exists(cand) else None


def load_library():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _find_lib()
    if path is None:
        raise FileNotFoundError(
            "libocvtpu_io.so not built — run `make -C native` at the repo root"
        )
    lib = ctypes.CDLL(path)
    lib.ocvtpu_decode_png.restype = ctypes.c_void_p
    lib.ocvtpu_decode_png.argtypes = [
        ctypes.c_char_p, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.ocvtpu_copy_pixels.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.ocvtpu_free_decoded.argtypes = [ctypes.c_void_p]
    lib.ocvtpu_tum_open.restype = ctypes.c_void_p
    lib.ocvtpu_tum_open.argtypes = [
        ctypes.c_char_p, ctypes.c_float, ctypes.c_double, ctypes.c_int, ctypes.c_int
    ]
    lib.ocvtpu_tum_size.argtypes = [ctypes.c_void_p]
    lib.ocvtpu_tum_size.restype = ctypes.c_int
    lib.ocvtpu_tum_dims.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)
    ]
    lib.ocvtpu_tum_dims.restype = ctypes.c_int
    lib.ocvtpu_tum_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    lib.ocvtpu_tum_next.restype = ctypes.c_int
    lib.ocvtpu_tum_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def available() -> bool:
    return _find_lib() is not None


def decode_image(path: str, depth_scale: float = -1.0) -> np.ndarray:
    """Native decode of PNG or JPEG by extension (the C runtime dispatches;
    JPEG serves SfM photo feeds, 16-bit PNG the TUM depth stream)."""
    return decode_png(path, depth_scale)


def decode_png(path: str, depth_scale: float = -1.0) -> np.ndarray:
    """Decode a PNG via the native runtime.

    depth_scale > 0: 16-bit values divided by it (TUM depth); otherwise
    8-bit -> [0,1], 16-bit -> [0,1].
    Returns (H, W) or (H, W, C) float32."""
    lib = load_library()
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    bits = ctypes.c_int()
    handle = lib.ocvtpu_decode_png(
        path.encode(), ctypes.c_float(depth_scale),
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(c), ctypes.byref(bits),
    )
    if not handle:
        raise IOError(f"native PNG decode failed: {path}")
    out = np.empty(h.value * w.value * c.value, np.float32)
    lib.ocvtpu_copy_pixels(handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    lib.ocvtpu_free_decoded(handle)
    if c.value == 1:
        return out.reshape(h.value, w.value)
    return out.reshape(h.value, w.value, c.value)


class TumLoader:
    """Threaded prefetching TUM RGB-D sequence iterator (native)."""

    def __init__(self, root: str, depth_scale: float = 5000.0, max_dt: float = 0.02, n_threads: int = 4, prefetch: int = 8):
        lib = load_library()
        self._lib = lib
        self._h = lib.ocvtpu_tum_open(
            root.encode(), ctypes.c_float(depth_scale), ctypes.c_double(max_dt),
            n_threads, prefetch,
        )
        if not self._h:
            raise IOError(f"failed to open TUM sequence at {root}")
        self.size = lib.ocvtpu_tum_size(self._h)
        w = ctypes.c_int()
        h = ctypes.c_int()
        if not lib.ocvtpu_tum_dims(self._h, ctypes.byref(w), ctypes.byref(h)):
            raise IOError("failed to read first frame dims")
        self.width, self.height = w.value, h.value

    def __len__(self):
        return self.size

    def __iter__(self):
        rgb = np.empty(self.height * self.width * 3, np.float32)
        depth = np.empty(self.height * self.width, np.float32)
        t_rgb = ctypes.c_double()
        t_depth = ctypes.c_double()
        while True:
            ok = self._lib.ocvtpu_tum_next(
                self._h,
                rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.byref(t_rgb), ctypes.byref(t_depth),
            )
            if not ok:
                return
            yield (
                t_rgb.value,
                rgb.reshape(self.height, self.width, 3).copy(),
                t_depth.value,
                depth.reshape(self.height, self.width).copy(),
            )

    def close(self):
        if self._h:
            self._lib.ocvtpu_tum_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
