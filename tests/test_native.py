"""Native IO runtime tests: C++ PNG decode + TUM loader vs the Python
reference readers (backend-parity pattern)."""

import os

import numpy as np
import pytest

from opencv_contrib_tpu.utils import io, native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libocvtpu_io.so not built (make -C native)"
)


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    """Synthesize a tiny TUM-format sequence on disk."""
    from PIL import Image

    root = tmp_path_factory.mktemp("tum")
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    rng = np.random.default_rng(0)
    n = 6
    with open(root / "rgb.txt", "w") as fr, open(root / "depth.txt", "w") as fd:
        fr.write("# rgb\n")
        fd.write("# depth\n")
        for i in range(n):
            t = 100.0 + i * 0.033
            rgb = (rng.uniform(0, 255, (24, 32, 3))).astype(np.uint8)
            depth = (rng.uniform(0, 20000, (24, 32))).astype(np.uint16)
            Image.fromarray(rgb).save(root / "rgb" / f"{i}.png")
            Image.fromarray(depth, mode="I;16").save(root / "depth" / f"{i}.png")
            fr.write(f"{t:.6f} rgb/{i}.png\n")
            fd.write(f"{t + 0.004:.6f} depth/{i}.png\n")
    return str(root)


class TestNativeDecode:
    def test_rgb_png_matches_python(self, tum_dir):
        path = os.path.join(tum_dir, "rgb", "0.png")
        a = native.decode_png(path)
        b = io.imread(path)
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_depth16_png_scale(self, tum_dir):
        path = os.path.join(tum_dir, "depth", "0.png")
        a = native.decode_png(path, depth_scale=5000.0)
        b = io.imread_depth_tum(path)
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_missing_file_raises(self):
        with pytest.raises(IOError):
            native.decode_png("/nonexistent/file.png")


class TestNativeTumLoader:
    def test_iterates_all_frames_in_order(self, tum_dir):
        loader = native.TumLoader(tum_dir, n_threads=3, prefetch=4)
        assert len(loader) == 6
        assert (loader.width, loader.height) == (32, 24)
        ts = []
        for t_rgb, rgb, t_depth, depth in loader:
            ts.append(t_rgb)
            assert rgb.shape == (24, 32, 3)
            assert depth.shape == (24, 32)
            assert depth.max() <= 4.0 + 1e-6  # 20000/5000
        assert len(ts) == 6
        assert ts == sorted(ts)
        loader.close()

    def test_matches_python_loader(self, tum_dir):
        from opencv_contrib_tpu.utils import datasets

        seq = datasets.load_tum(tum_dir)
        loader = native.TumLoader(tum_dir)
        frames = list(loader)
        assert len(frames) == len(seq.pairs)
        # first frame pixel parity
        rgb_py = io.imread(os.path.join(tum_dir, seq.pairs[0][1]))
        np.testing.assert_allclose(frames[0][1], rgb_py, atol=1e-6)
        loader.close()


def test_native_jpeg_decode(tmp_path):
    """JPEG path of the native decoder (SfM photo feed)."""
    from opencv_contrib_tpu.utils import native
    if not native.available():
        import pytest
        pytest.skip("native library not built")
    from PIL import Image
    yy, xx = np.meshgrid(np.arange(32), np.arange(48), indexing="ij")
    arr = np.stack([yy * 8, xx * 5, (yy + xx) * 3], -1).astype(np.uint8)
    p = str(tmp_path / "t.jpg")
    Image.fromarray(arr).save(p, quality=95)
    img = native.decode_image(p)
    assert img.shape == (32, 48, 3) and img.dtype == np.float32
    # lossy codec on a smooth image: small mean error
    assert np.abs(img * 255.0 - arr).mean() < 4.0
