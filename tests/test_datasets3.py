"""Dataset reader families round 4 (or_pascal, tr_icdar, or_mnist,
track_vot, fr_lfw) — each against a synthesized on-disk fixture in the
reference's file format."""

import os
import struct

import numpy as np

from opencv_contrib_tpu.utils import datasets3 as ds


def test_or_pascal(tmp_path):
    xml = """<annotation>
  <filename>000001.jpg</filename>
  <size><width>353</width><height>500</height><depth>3</depth></size>
  <object><name>dog</name><difficult>0</difficult><truncated>1</truncated>
    <bndbox><xmin>48</xmin><ymin>240</ymin><xmax>195</xmax><ymax>371</ymax></bndbox>
  </object>
  <object><name>person</name><difficult>1</difficult>
    <bndbox><xmin>8</xmin><ymin>12</ymin><xmax>352</xmax><ymax>498</ymax></bndbox>
  </object>
</annotation>"""
    (tmp_path / "000001.xml").write_text(xml)
    samples = ds.load_or_pascal(str(tmp_path))
    assert len(samples) == 1
    s = samples[0]
    assert s.filename == "000001.jpg" and (s.width, s.height) == (353, 500)
    assert len(s.objects) == 2
    assert s.objects[0].name == "dog" and s.objects[0].truncated
    assert s.objects[1].difficult
    assert (s.objects[0].xmin, s.objects[0].ymax) == (48, 371)


def test_tr_icdar(tmp_path):
    (tmp_path / "gt_img_1.txt").write_text(
        "38,43,920,43,920,215,38,215,Tiredness\n"
        "275,264,665,264,665,450,275,450,kills\n")
    gt = ds.load_tr_icdar(str(tmp_path))
    words = gt["gt_img_1.txt"]
    assert [w.value for w in words] == ["Tiredness", "kills"]
    assert words[0].x == 38 and words[0].width == 920 - 38
    assert words[1].height == 450 - 264


def test_or_mnist(tmp_path):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (5, 28, 28), np.uint8)
    labels = np.array([3, 1, 4, 1, 5], np.uint8)
    ip = tmp_path / "train-images-idx3-ubyte"
    lp = tmp_path / "train-labels-idx1-ubyte"
    ip.write_bytes(struct.pack(">IIII", 0x803, 5, 28, 28) + imgs.tobytes())
    lp.write_bytes(struct.pack(">II", 0x801, 5) + labels.tobytes())
    im, lb = ds.load_or_mnist(str(ip), str(lp))
    np.testing.assert_array_equal(im, imgs)
    np.testing.assert_array_equal(lb, labels)


def test_track_vot(tmp_path):
    seq = tmp_path / "ball"
    seq.mkdir()
    (tmp_path / "list.txt").write_text("ball\n")
    (seq / "groundtruth.txt").write_text(
        "10.0,20.0,30.0,20.0,30.0,40.0,10.0,40.0\n"
        "12,22,20,20\n")
    for i in (1, 2):
        (seq / f"{i:08d}.jpg").write_bytes(b"")
    seqs = ds.load_track_vot(str(tmp_path))
    assert len(seqs) == 1 and seqs[0].name == "ball"
    assert len(seqs[0].frames) == 2
    np.testing.assert_allclose(seqs[0].gt[0], [10, 20, 20, 20])
    np.testing.assert_allclose(seqs[0].gt[1], [12, 22, 20, 20])


def test_fr_lfw_pairs(tmp_path):
    p = tmp_path / "pairs.txt"
    p.write_text(
        "2 2\n"
        "Alice 1 2\nBob 1 3\n"
        "Alice 1 Bob 2\nCarol 1 Dave 1\n"
        "Bob 2 3\nCarol 1 2\n"
        "Alice 2 Carol 1\nBob 1 Dave 1\n")
    folds = ds.load_fr_lfw_pairs(str(p))
    assert len(folds) == 2 and len(folds[0]) == 4
    assert folds[0][0].same and folds[0][0].image1 == "Alice/Alice_0001.jpg"
    assert not folds[0][2].same
    assert folds[1][3].image2 == "Dave/Dave_0001.jpg"


def test_ir_affine(tmp_path):
    for i in range(1, 7):
        (tmp_path / f"img{i}.ppm").write_bytes(b"P6 1 1 255 abc")
    H = np.array([[1.1, 0.0, 2.0], [0.0, 0.9, -3.0], [1e-4, 0, 1]])
    for i in range(2, 7):
        np.savetxt(tmp_path / f"H1to{i}p", H * i)
    seq = ds.load_ir_affine(str(tmp_path))
    assert len(seq.images) == 6
    np.testing.assert_allclose(seq.H[0], np.eye(3))
    np.testing.assert_allclose(seq.H[1], H * 2)
    np.testing.assert_allclose(seq.H[5], H * 6)


def test_sr_dataset(tmp_path):
    d = tmp_path / "DIV2K_train_HR"
    d.mkdir()
    for n in ("0002.png", "0001.png"):
        (d / n).write_bytes(b"")
    splits = ds.load_sr_dataset(str(tmp_path))
    assert [os.path.basename(p) for p in splits["train"]] == ["0001.png", "0002.png"]
    assert splits["valid"] == []


def test_pd_inria(tmp_path):
    t = tmp_path / "Train"
    (t / "annotations").mkdir(parents=True)
    (t / "pos.lst").write_text("Train/pos/crop001001.png\n")
    (t / "neg.lst").write_text("Train/neg/empty.png\n")
    (t / "annotations" / "crop001001.txt").write_text(
        'Bounding box for object 1 "PASperson" (Xmin, Ymin) - (Xmax, Ymax) : (10, 20) - (110, 220)\n')
    out = ds.load_pd_inria(str(tmp_path), "Train")
    assert len(out) == 2
    np.testing.assert_array_equal(out[0].bndboxes, [[10, 20, 110, 220]])
    assert out[1].bndboxes.shape == (0, 4)


def test_ar_hmdb_splits(tmp_path):
    (tmp_path / "brush_hair_test_split1.txt").write_text(
        "a.avi 1\nb.avi 2\nc.avi 0\n")
    (tmp_path / "wave_test_split1.txt").write_text("d.avi 1\n")
    out = ds.load_ar_hmdb_splits(str(tmp_path), 1)
    assert out["brush_hair"]["train"] == ["a.avi"]
    assert out["brush_hair"]["test"] == ["b.avi"]
    assert out["wave"]["train"] == ["d.avi"]


def test_is_bsds(tmp_path):
    (tmp_path / "iids_train.txt").write_text("100075\n100080\n")
    (tmp_path / "iids_test.txt").write_text("100007\n")
    out = ds.load_is_bsds(str(tmp_path))
    assert out["train"] == ["100075", "100080"]
    assert out["test"] == ["100007"]


def test_track_alov(tmp_path):
    c = tmp_path / "01-Light"
    c.mkdir()
    (c / "01-Light_video00001.ann").write_text(
        "1 10 20 30 20 30 40 10 40\n8 12 22 32 22 32 42 12 42\n")
    out = ds.load_track_alov(str(tmp_path))
    anns = out["01-Light/01-Light_video00001"]
    assert anns[0].frame == 1 and anns[1].frame == 8
    np.testing.assert_allclose(anns[0].box, [10, 20, 20, 20])


def test_gr_skig(tmp_path):
    d = tmp_path / "subject1_rgb"
    d.mkdir()
    (d / "person_1_backgroud_2_illumination_1_pose_3_actionType_7.avi").write_bytes(b"")
    out = ds.load_gr_skig(str(tmp_path))
    assert len(out) == 1
    s = out[0]
    assert (s.person, s.background, s.illumination, s.pose, s.action) == (1, 2, 1, 3, 7)
