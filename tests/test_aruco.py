"""ArUco marker tests: render markers into a scene and re-detect."""

import numpy as np
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu import aruco


@pytest.fixture(scope="module")
def dico():
    return aruco.generate_dictionary(n_markers=8, bits=4, min_dist=4)


class TestDictionary:
    def test_min_distance_holds(self, dico):
        n = dico.shape[0]
        for i in range(n):
            for j in range(i + 1, n):
                d = min(np.sum(np.rot90(dico[i], k) != dico[j]) for k in range(4))
                assert d >= 4

    def test_deterministic(self):
        a = aruco.generate_dictionary(n_markers=4, bits=4, seed=3)
        b = aruco.generate_dictionary(n_markers=4, bits=4, seed=3)
        np.testing.assert_array_equal(a, b)


class TestDetect:
    def _scene_with_marker(self, dico, marker_id, y0, x0, size=64, bg=0.8):
        img = np.full((240, 320), bg, np.float32)
        m = aruco.draw_marker(dico, marker_id, size)
        img[y0 : y0 + m.shape[0], x0 : x0 + m.shape[1]] = m
        return img

    def test_detects_axis_aligned(self, dico):
        img = self._scene_with_marker(dico, 3, 50, 80)
        ids, corners = aruco.detect_markers(img, dico)
        assert 3 in ids
        q = corners[ids.index(3)]
        assert abs(q[:, 0].min() - 50) < 6 and abs(q[:, 1].min() - 80) < 6

    def test_detects_multiple(self, dico):
        img = self._scene_with_marker(dico, 1, 30, 40)
        m2 = aruco.draw_marker(dico, 5, 60)
        img[140:200, 200:260] = m2
        ids, corners = aruco.detect_markers(img, dico)
        assert 1 in ids and 5 in ids

    def test_rotation_decoded(self, dico):
        img = self._scene_with_marker(dico, 2, 60, 100)
        img_rot = np.rot90(img).copy()
        ids, _ = aruco.detect_markers(img_rot, dico)
        assert 2 in ids

    def test_no_false_positives_on_noise(self, dico, rng):
        img = rng.uniform(0.3, 0.9, size=(240, 320)).astype(np.float32)
        ids, _ = aruco.detect_markers(img, dico)
        assert len(ids) == 0
