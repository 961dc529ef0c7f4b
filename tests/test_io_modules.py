"""Tests for freetype (text rendering), cvv (debug recorder), hdf (HDF5 IO)
and utils.video (cudacodec role): round-trips and rendered-output checks."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu import freetype, cvv, hdf
from opencv_contrib_tpu.utils import video


# --- freetype ---

def test_puttext_renders_and_blends():
    img = jnp.zeros((64, 200, 3), jnp.float32)
    out = freetype.put_text(img, "Hello TPU", (4, 10), 16, (1.0, 0.2, 0.2))
    out = np.asarray(out)
    assert out[:, :, 0].max() > 0.9  # red text drawn
    assert out[:45, :, :].sum() > 0  # inside the text rows
    # text confined to its box
    w, h = freetype.get_text_size("Hello TPU", 16)
    assert out[:, w + 8:, :].sum() == 0
    assert out[30:, :, :].sum() == 0


def test_puttext_clipping_and_gray():
    img = jnp.zeros((32, 32), jnp.float32)
    # partially off-canvas must not error and must draw the visible part
    out = np.asarray(freetype.put_text(img, "WWWW", (-10, 20), 12, 1.0))
    assert out.shape == (32, 32)
    assert out.max() > 0.5
    # fully off-canvas: unchanged
    out2 = np.asarray(freetype.put_text(img, "x", (100, 100), 12, 1.0))
    assert out2.sum() == 0


def test_puttext_thickness_bolder():
    img = jnp.zeros((40, 120), jnp.float32)
    thin = np.asarray(freetype.put_text(img, "B", (2, 2), 24, 1.0, thickness=1))
    bold = np.asarray(freetype.put_text(img, "B", (2, 2), 24, 1.0, thickness=3))
    assert (bold > 0.5).sum() > 1.5 * (thin > 0.5).sum()


def test_text_size_scales():
    w1, h1 = freetype.get_text_size("abc", 8)
    w2, h2 = freetype.get_text_size("abc", 16)
    assert w2 == 2 * w1 and h2 == 2 * h1


# --- cvv ---

def test_cvv_capture_query_and_report(tmp_path):
    cvv.clear()
    img = np.random.default_rng(0).random((16, 16)).astype(np.float32)
    cvv.show_image(img, description="raw frame")
    cvv.debug_filter(img, img * 0.5, description="darken filter")
    kps1 = np.array([[2.0, 2.0], [10.0, 4.0]])
    kps2 = np.array([[3.0, 3.0], [11.0, 5.0]])
    cvv.debug_dmatch(img, kps1, img, kps2, [(0, 0), (1, 1)],
                     description="bf matches")
    s = cvv.get_session()
    assert len(s.calls) == 3
    # call-site metadata captured
    assert s.calls[0].file.endswith("test_io_modules.py")
    assert s.calls[0].line > 0
    # stfl-style queries
    assert len(cvv.query("kind:filter")) == 1
    assert len(cvv.query("matches")) == 1
    assert len(cvv.query(f"line:>0 file:test_io_modules")) == 3
    # dmatch view rendered side-by-side with green lines
    vis = s.calls[2].images[2]
    assert vis.shape[1] == 32
    assert (vis[:, :, 1] > 0.9).sum() >= 8
    # html gallery
    path = cvv.final_show(str(tmp_path))
    assert os.path.exists(path)
    assert os.path.exists(str(tmp_path / "call0000_0.png"))
    html = open(path).read()
    assert "darken filter" in html
    cvv.clear()


def test_cvv_disabled_flag():
    cvv.clear()
    cvv.set_debug_flag(False)
    cvv.show_image(np.zeros((4, 4)))
    assert len(cvv.get_session().calls) == 0
    cvv.set_debug_flag(True)


# --- hdf ---

def test_hdf5_dataset_roundtrip(tmp_path):
    p = str(tmp_path / "t.h5")
    a = np.random.default_rng(1).normal(size=(37, 5)).astype(np.float32)
    with hdf.open(p, "w") as h:
        h.grcreate("grp")
        assert h.hlexists("grp")
        h.dswrite(a, "grp/a")
        h.atwrite(42, "answer")
        h.atwrite("hello", "msg")
    with hdf.open(p, "r") as h:
        assert h.hlexists("grp/a")
        np.testing.assert_array_equal(h.dsread("grp/a"), a)
        assert h.dsgetsize("grp/a") == (37, 5)
        assert int(h.atread("answer")) == 42
        assert h.atread("msg") == "hello"
        assert h.atexists("msg") and not h.atexists("nope")


def test_hdf5_chunked_offset_write_and_compression(tmp_path):
    p = str(tmp_path / "c.h5")
    with hdf.open(p, "w") as h:
        h.dscreate(hdf.HDF5.UNLIMITED, 4, dslabel="ds", compresslevel=4,
                   dims_chunks=(8, 4))
        h.dswrite(np.ones((8, 4), np.float32), "ds", dims_offset=(0, 0))
        h.dsinsert(2 * np.ones((8, 4), np.float32), "ds", dims_offset=(8, 0))
    with hdf.open(p, "r") as h:
        out = h.dsread("ds")
        assert out.shape == (16, 4)
        assert out[:8].max() == 1.0 and out[8:].min() == 2.0
        sub = h.dsread("ds", dims_offset=(6, 0), dims_counts=(4, 4))
        np.testing.assert_array_equal(sub[:2], 1.0)
        np.testing.assert_array_equal(sub[2:], 2.0)


def test_hdf5_keypoints(tmp_path):
    p = str(tmp_path / "k.h5")
    kps = np.array([[1.0, 2.0, 3.0, 45.0, 0.9, 1, 7],
                    [4.0, 5.0, 6.0, 90.0, 0.8, 2, -1]], np.float32)
    with hdf.open(p, "w") as h:
        h.kpwrite(kps, "kps")
    with hdf.open(p, "r") as h:
        assert h.kpgetsize("kps") == 2
        out = h.kpread("kps")
        np.testing.assert_allclose(out, kps, atol=1e-6)


# --- video ---

def _frames(n, h=32, w=48):
    """Smooth test frames (chroma-subsampled codecs are lossy on noise)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    out = []
    for i in range(n):
        r = 0.5 + 0.5 * np.sin(xx / 7.0 + i)
        g = 0.5 + 0.5 * np.cos(yy / 5.0 - i / 2.0)
        b = 0.5 + 0.5 * np.sin((xx + yy) / 9.0 + i / 3.0)
        out.append(np.clip(np.stack([r, g, b], -1), 0, 1).astype(np.float32))
    return out


def test_y4m_roundtrip(tmp_path):
    p = str(tmp_path / "v.y4m")
    frames = _frames(5)
    wtr = video.create_video_writer(p, (48, 32), fps=25.0, codec="y4m")
    for f in frames:
        wtr.write(f)
    wtr.release()
    rdr = video.VideoReader(p, batch=2)
    assert (rdr.width, rdr.height) == (48, 32)
    assert abs(rdr.fps - 25.0) < 1e-6
    got = []
    for b in rdr:
        got.append(np.asarray(b))
    got = np.concatenate(got, 0)
    assert got.shape == (5, 32, 48, 3)
    # YUV420 is lossy (chroma subsampled + 8-bit) but close
    err = np.abs(got - np.stack(frames)).mean()
    assert err < 0.03


def test_avi_dib_roundtrip(tmp_path):
    p = str(tmp_path / "v.avi")
    frames = _frames(4, 24, 32)
    wtr = video.create_video_writer(p, (32, 24), fps=30.0)
    for f in frames:
        wtr.write(f)
    wtr.release()
    rdr = video.AVIReader(p)
    assert len(rdr) == 4
    assert (rdr.w, rdr.h) == (32, 24)
    assert abs(rdr.fps - 30.0) < 1e-3
    for i, f in enumerate(frames):
        got = rdr.read(i).astype(np.float32) / 255.0
        assert np.abs(got - f).max() < 1.0 / 255.0 + 1e-6


def test_avi_mjpg_roundtrip(tmp_path):
    p = str(tmp_path / "m.avi")
    frames = _frames(3, 24, 32)
    wtr = video.create_video_writer(p, (32, 24), fps=15.0, codec="MJPG")
    for f in frames:
        wtr.write(f)
    wtr.release()
    rdr = video.VideoReader(p, batch=2, to_device=False)
    got = np.concatenate([np.asarray(b) for b in rdr], 0)
    assert got.shape == (3, 24, 32, 3)
    assert np.abs(got - np.stack(frames)).mean() < 0.08  # jpeg-lossy


def test_yuv_color_matrix_identity():
    rgb = jnp.asarray(_frames(1, 16, 16)[0])[None]
    y, u, v = video.rgb_to_yuv420(rgb)
    back = np.asarray(video.yuv420_to_rgb(y, u, v))[0]
    assert np.abs(back - np.asarray(rgb[0])).mean() < 0.03
