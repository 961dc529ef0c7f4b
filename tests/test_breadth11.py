"""Round-3 breadth: siamese tracker (GOTURN/DaSiamRPN class), dataset
readers part 2."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu.tracking import siam
from opencv_contrib_tpu.utils import datasets2 as ds2


class TestSiam:
    @pytest.fixture(scope="class")
    def trained(self):
        return siam.train_siam(n_steps=150, batch=16, seed=0)

    def test_training_separates_object(self, trained):
        model, params = trained
        rng = np.random.default_rng(10)
        hits = 0
        for _ in range(10):
            t, s, off = siam._synth_pair(rng)
            tf = siam._embed(params, model.apply, jnp.asarray(t))
            sf = siam._embed(params, model.apply, jnp.asarray(s))
            resp = np.asarray(siam.xcorr(sf, tf))
            py, px = np.unravel_index(resp.argmax(), resp.shape)
            pred = (np.array([py, px]) - (np.array(resp.shape) - 1) / 2.0) * 4.0
            if np.abs(pred - off).max() <= 6.0:
                hits += 1
        assert hits >= 8

    def test_tracks_moving_object(self, trained):
        model, params = trained
        rng = np.random.default_rng(11)
        obj = rng.uniform(0.5, 1.0, (12, 12)).astype(np.float32)

        def frame(cy, cx):
            img = rng.uniform(0, 0.2, (96, 96)).astype(np.float32)
            img[cy - 6:cy + 6, cx - 6:cx + 6] = obj
            return img

        f0 = frame(40, 40)
        state = siam.siam_init(params, model.apply, f0, (34, 34, 12, 12))
        traj = [(40, 40), (43, 44), (46, 48), (49, 51), (52, 55)]
        for cy, cx in traj[1:]:
            state, bbox, score = siam.siam_update(params, model.apply, state, frame(cy, cx))
        assert abs(float(state.center[0]) - 52) <= 4
        assert abs(float(state.center[1]) - 55) <= 4


class TestDatasets2:
    def test_epfl_roundtrip(self, tmp_path):
        K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
        R = np.eye(3)
        t = np.array([0.1, 0.2, 0.3])
        nums = list(K.reshape(-1)) + [0.0, 0.0, 0.0] + list(R.reshape(-1)) + list(t) + [640, 480]
        p = tmp_path / "img1.png.camera"
        p.write_text(" ".join(str(x) for x in nums))
        views = ds2.load_msm_epfl(str(tmp_path))
        assert len(views) == 1
        v = views[0]
        np.testing.assert_allclose(v.K, K)
        np.testing.assert_allclose(v.t, t)
        assert v.image_size == (640, 480)
        assert v.P.shape == (3, 4)

    def test_middlebury_roundtrip(self, tmp_path):
        views = [ds2.MSMView(name=f"im{i}.png",
                             K=np.diag([400.0, 400.0, 1.0]),
                             R=np.eye(3),
                             t=np.array([0.0, 0.0, float(i)]))
                 for i in range(3)]
        par = tmp_path / "temple_par.txt"
        ds2.write_msm_middlebury(str(par), views)
        loaded = ds2.load_msm_middlebury(str(par))
        assert len(loaded) == 3
        np.testing.assert_allclose(loaded[2].t, [0, 0, 2])
        np.testing.assert_allclose(loaded[0].K, np.diag([400.0, 400.0, 1.0]))

    def test_labeled_dirs(self, tmp_path):
        for split in ("train", "test"):
            for cls in ("cat", "dog"):
                d = tmp_path / split / cls
                d.mkdir(parents=True)
                (d / "a.png").write_bytes(b"x")
                (d / "b.jpg").write_bytes(b"x")
        ds = ds2.load_labeled_dirs(str(tmp_path))
        assert len(ds.train) == 4 and len(ds.test) == 4 and ds.val == []
        assert ds.labels == ["cat", "dog"]

    def test_image_sequence(self, tmp_path):
        for i in (2, 0, 1):
            (tmp_path / f"{i:06d}.png").write_bytes(b"x")
        seq = ds2.load_image_sequence(str(tmp_path))
        assert [os.path.basename(p) for p in seq] == ["000000.png", "000001.png", "000002.png"]
