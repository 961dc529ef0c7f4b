"""Video IO — the cudacodec role (reference: modules/cudacodec
`cv::cudacodec::VideoReader/VideoWriter`, cudacodec.hpp: hardware NVDEC/NVENC
decode straight to device memory with a background demux thread).

There is no hardware codec block on a TPU, so the TPU-native split is:
containers/bitstreams are handled on host (Y4M and AVI demux are pure
byte-slicing; JPEG entropy decode via PIL), a background prefetch thread
keeps frames flowing (the role of cudacodec's videoSource thread), and the
*pixel* work — YUV420->RGB conversion, normalization — is a batched jitted
device op so a whole GOP converts in one dispatch on the VPU.

Formats:
- Y4M (YUV4MPEG2) read/write — uncompressed interchange, streams of I420
  planes; the standard format ffmpeg pipes produce.
- AVI read/write — uncompressed 24-bit DIB ('DIB '/raw) and MJPEG
  ('MJPG', decode via PIL) fourccs.
"""

from __future__ import annotations

import functools
import io as _io
import os
import queue
import struct
import threading
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# device color conversion (BT.601 full-range, the Y4M default)

@jax.jit
def yuv420_to_rgb(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """I420 planes ([B,]H,W), ([B,]H/2,W/2) x2 in [0,255] -> RGB float32
    [0,1]. Chroma is upsampled by nearest (cudacodec converts on the GPU;
    here the VPU does the batched elementwise matrix)."""
    up = jnp.repeat(jnp.repeat(u, 2, axis=-2), 2, axis=-1)
    vp = jnp.repeat(jnp.repeat(v, 2, axis=-2), 2, axis=-1)
    yf = y.astype(jnp.float32)
    uf = up.astype(jnp.float32) - 128.0
    vf = vp.astype(jnp.float32) - 128.0
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    return jnp.clip(jnp.stack([r, g, b], axis=-1) / 255.0, 0.0, 1.0)


@jax.jit
def rgb_to_yuv420(rgb: jnp.ndarray):
    """RGB float [0,1] ([B,]H,W,3) -> (y, u, v) uint8 I420 planes."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 0.5
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5
    H, W = y.shape[-2], y.shape[-1]
    # 2x2 average pooling for chroma subsampling
    def sub(c):
        c4 = c.reshape(c.shape[:-2] + (H // 2, 2, W // 2, 2))
        return c4.mean(axis=(-3, -1))
    to8 = lambda a: jnp.clip(jnp.round(a * 255.0), 0, 255).astype(jnp.uint8)
    return to8(y), to8(sub(u)), to8(sub(v))


# ---------------------------------------------------------------------------
# Y4M

class Y4MWriter:
    def __init__(self, path: str, size: Tuple[int, int], fps: float = 30.0):
        self.w, self.h = size
        num, den = _fps_to_ratio(fps)
        self._f = open(path, "wb")
        self._f.write(f"YUV4MPEG2 W{self.w} H{self.h} F{num}:{den} Ip A1:1 "
                      f"C420jpeg\n".encode())

    def write(self, frame):
        """frame: RGB float [0,1] (H,W,3) ndarray/jax.Array, or a tuple of
        I420 planes."""
        if isinstance(frame, tuple):
            y, u, v = (np.asarray(p) for p in frame)
        else:
            y, u, v = (np.asarray(p) for p in rgb_to_yuv420(jnp.asarray(frame)))
        self._f.write(b"FRAME\n")
        self._f.write(y.tobytes())
        self._f.write(u.tobytes())
        self._f.write(v.tobytes())

    def release(self):
        self._f.close()


class Y4MReader:
    def __init__(self, path: str):
        self._f = open(path, "rb")
        header = self._f.readline().decode()
        assert header.startswith("YUV4MPEG2"), "not a y4m file"
        self.w = self.h = 0
        self.fps = 30.0
        for tok in header.split()[1:]:
            if tok[0] == "W":
                self.w = int(tok[1:])
            elif tok[0] == "H":
                self.h = int(tok[1:])
            elif tok[0] == "F":
                n, d = tok[1:].split(":")
                self.fps = float(n) / float(d)

    def read_planes(self):
        line = self._f.readline()
        if not line or not line.startswith(b"FRAME"):
            return None
        ysz = self.w * self.h
        csz = ysz // 4
        buf = self._f.read(ysz + 2 * csz)
        if len(buf) < ysz + 2 * csz:
            return None
        y = np.frombuffer(buf, np.uint8, ysz).reshape(self.h, self.w)
        u = np.frombuffer(buf, np.uint8, csz, ysz).reshape(self.h // 2, self.w // 2)
        v = np.frombuffer(buf, np.uint8, csz, ysz + csz).reshape(self.h // 2, self.w // 2)
        return y, u, v

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            p = self.read_planes()
            if p is None:
                return
            yield p

    def release(self):
        self._f.close()


def _fps_to_ratio(fps: float):
    if abs(fps - round(fps)) < 1e-9:
        return int(round(fps)), 1
    return int(round(fps * 1001)), 1001


# ---------------------------------------------------------------------------
# AVI (RIFF) — uncompressed DIB + MJPEG

def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _list(tag: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", tag + payload)


class AVIWriter:
    """Minimal AVI writer: 'DIB ' (uncompressed BGR24 bottom-up) or 'MJPG'."""

    def __init__(self, path: str, size: Tuple[int, int], fps: float = 30.0,
                 fourcc: str = "DIB ", quality: int = 90):
        self.path = path
        self.w, self.h = size
        self.fps = fps
        self.fourcc = fourcc
        self.quality = quality
        self._frames = []

    def write(self, frame):
        arr = np.asarray(frame)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        if self.fourcc == "MJPG":
            from PIL import Image
            buf = _io.BytesIO()
            Image.fromarray(arr).save(buf, "JPEG", quality=self.quality)
            self._frames.append(buf.getvalue())
        else:
            bgr = arr[::-1, :, ::-1]  # bottom-up BGR
            self._frames.append(bgr.tobytes())

    def release(self):
        n = len(self._frames)
        us_per_frame = int(1e6 / self.fps)
        fcc = self.fourcc.encode()
        avih = struct.pack("<14I", us_per_frame, 0, 0, 0x10, n, 0, 1, 0,
                           self.w, self.h, 0, 0, 0, 0)
        # rate/scale as an exact ratio (29.97 -> 30000/1001), not a
        # truncated integer rate — readers honor strh over avih
        fnum, fden = _fps_to_ratio(self.fps)
        strh = struct.pack("<4s4sIHHIIIIIIII4H", b"vids", fcc, 0, 0, 0, 0,
                           fden, fnum, 0, n, 0, 0xFFFFFFFF, 0,
                           0, 0, self.w, self.h)
        biComp = 0 if self.fourcc == "DIB " else struct.unpack("<I", b"MJPG")[0]
        strf = struct.pack("<IiiHHIIiiII", 40, self.w, self.h, 1, 24,
                           biComp, self.w * self.h * 3, 0, 0, 0, 0)
        strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
        hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)
        movi_payload = b"movi"
        offs = []
        for fr in self._frames:
            offs.append(len(movi_payload))
            movi_payload += _chunk(b"00dc", fr)
        movi = _chunk(b"LIST", movi_payload)
        idx = b""
        for off, fr in zip(offs, self._frames):
            idx += struct.pack("<4sIII", b"00dc", 0x10, off,
                               len(fr))
        riff_payload = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
        with open(self.path, "wb") as f:
            f.write(_chunk(b"RIFF", riff_payload))


class AVIReader:
    """Minimal AVI demuxer for the writer's output (DIB/MJPG '00dc' chunks)."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            data = f.read()
        assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
        self.w = self.h = 0
        self.fps = 30.0
        self.fourcc = "DIB "
        self._frames = []
        self._parse(data[12: 8 + struct.unpack("<I", data[4:8])[0]])

    def _parse(self, buf: bytes):
        pos = 0
        while pos + 8 <= len(buf):
            tag = buf[pos:pos + 4]
            size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
            body = buf[pos + 8:pos + 8 + size]
            if tag == b"LIST":
                self._parse(body[4:])
            elif tag == b"strh":
                self.fourcc = body[4:8].decode("latin1")
                scale, rate = struct.unpack("<II", body[20:28])
                if scale:
                    self.fps = rate / scale
            elif tag == b"strf":
                self.w, self.h = struct.unpack("<ii", body[4:12])
                self.h = abs(self.h)
            elif tag[2:] == b"dc":
                self._frames.append(body)
            pos += 8 + size + (size % 2)

    def __len__(self):
        return len(self._frames)

    def read(self, i: int) -> np.ndarray:
        raw = self._frames[i]
        if self.fourcc.strip() in ("MJPG", "mjpg"):
            from PIL import Image
            return np.asarray(Image.open(_io.BytesIO(raw)).convert("RGB"))
        bgr = np.frombuffer(raw, np.uint8).reshape(self.h, self.w, 3)
        return bgr[::-1, :, ::-1].copy()

    def __iter__(self):
        for i in range(len(self._frames)):
            yield self.read(i)


# ---------------------------------------------------------------------------
# VideoReader facade: background demux thread + batched device conversion
# (cudacodec.hpp VideoReader::nextFrame semantics)

class VideoReader:
    def __init__(self, path: str, batch: int = 8, prefetch: int = 2,
                 to_device: bool = True):
        ext = os.path.splitext(path)[1].lower()
        if ext == ".y4m":
            self._src: object = Y4MReader(path)
            self._mode = "y4m"
            self.width, self.height, self.fps = self._src.w, self._src.h, self._src.fps
        elif ext == ".avi":
            self._src = AVIReader(path)
            self._mode = "avi"
            self.width, self.height, self.fps = self._src.w, self._src.h, self._src.fps
        else:
            raise ValueError(f"unsupported container: {ext}")
        self.batch = batch
        self.to_device = to_device
        self._q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._thread = threading.Thread(target=self._pump, daemon=True)
        self._thread.start()

    def _pump(self):
        buf = []
        for fr in self._src:  # type: ignore[attr-defined]
            buf.append(fr)
            if len(buf) == self.batch:
                self._q.put(buf)
                buf = []
        if buf:
            self._q.put(buf)
        self._q.put(None)

    def next_batch(self):
        """-> RGB float32 (B,H,W,3) device array, or None at EOF."""
        item = self._q.get()
        if item is None:
            return None
        if self._mode == "y4m":
            y = jnp.asarray(np.stack([f[0] for f in item]))
            u = jnp.asarray(np.stack([f[1] for f in item]))
            v = jnp.asarray(np.stack([f[2] for f in item]))
            return yuv420_to_rgb(y, u, v)
        arr = np.stack(item).astype(np.float32) / 255.0
        return jnp.asarray(arr) if self.to_device else arr

    def __iter__(self):
        while True:
            b = self.next_batch()
            if b is None:
                return
            yield b


def create_video_reader(path: str, **kw) -> VideoReader:
    """cudacodec::createVideoReader twin (cudacodec.hpp:322)."""
    return VideoReader(path, **kw)


def create_video_writer(path: str, size, fps: float = 30.0,
                        codec: str = "auto"):
    """cudacodec::createVideoWriter twin. codec: 'y4m' | 'DIB ' | 'MJPG'."""
    ext = os.path.splitext(path)[1].lower()
    if codec == "auto":
        codec = "y4m" if ext == ".y4m" else "DIB "
    if codec == "y4m":
        return Y4MWriter(path, size, fps)
    return AVIWriter(path, size, fps, fourcc=codec)
