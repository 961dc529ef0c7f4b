"""Format-fixture tests for the final 13 dataset reader families
(datasets module 31/31; reference parsers in datasets/src/*.cpp)."""

import os
import struct

import numpy as np

from opencv_contrib_tpu.utils import datasets4 as ds


def test_ar_sports(tmp_path):
    d = tmp_path / "original"
    d.mkdir()
    (d / "train_partition.txt").write_text(
        "http://v/a.mp4 3,12\nhttp://v/b.mp4 7\n")
    (d / "test_partition.txt").write_text("http://v/c.mp4 1,2,3\n")
    out = ds.load_ar_sports(str(tmp_path))
    assert len(out["train"]) == 2 and len(out["test"]) == 1
    assert out["train"][0].labels == [3, 12]
    assert out["test"][0].video_url == "http://v/c.mp4"


def test_fr_adience(tmp_path):
    faces = tmp_path / "faces" / "u1"
    faces.mkdir(parents=True)
    (faces / "coarse_tilt_aligned_face.2.pic1.jpg").write_bytes(b"x")
    (tmp_path / "fold_0_data.txt").write_text(
        "user_id\toriginal_image\tface_id\tage\tgender\tx\ty\tdx\tdy\t"
        "tilt_ang\tfiducial_yaw_angle\tfiducial_score\n"
        "u1\tpic1.jpg\t2\t(25, 32)\tm\t10\t20\t100\t120\t5\t-15\t88\n"
        "u1\tnope.jpg\t3\t(25, 32)\tf\t0\t0\t1\t1\t0\t0\t0\n")
    out = ds.load_fr_adience(str(tmp_path))
    assert len(out["folds"][0]) == 1
    s = out["folds"][0][0]
    assert s.original_image == "coarse_tilt_aligned_face.2.pic1.jpg"
    assert s.gender == "m" and s.fiducial_score == 88
    assert out["missing"] == ["u1/nope.jpg"]


def test_gr_chalearn(tmp_path):
    d = tmp_path / "Sample0001"
    d.mkdir()
    (d / "Sample0001_data.csv").write_text("120,20,640\n")
    (d / "Sample0001_labels.csv").write_text("7,1,50\n9,51,120\n")
    row = ",".join(str(float(i)) for i in range(180))
    (d / "Sample0001_skeleton.csv").write_text(row + "\n" + row + "\n")
    out = ds.load_gr_chalearn(str(tmp_path))
    assert len(out) == 1
    s = out[0]
    assert s.num_frames == 120 and s.fps == 20 and s.depth == 640
    assert [g.gesture_id for g in s.gestures] == [7, 9]
    assert s.skeletons.shape == (2, 20, 9)
    assert s.skeletons[0, 1, 0] == 9.0  # joint 1 Wx = 10th value (9.0)
    assert s.name_color == "Sample0001/Sample0001_color.mp4"


def test_hpe_humaneva(tmp_path):
    img = tmp_path / "S2" / "Image_Data"
    sync = tmp_path / "S2" / "Sync_Data"
    img.mkdir(parents=True)
    sync.mkdir(parents=True)
    (img / "Walking_1_(C2).avi").write_bytes(b"x")
    (sync / "Walking_1_(C2).ofs").write_text("0.5\n1.5\n")
    out = ds.load_hpe_humaneva(str(tmp_path))
    assert len(out) == 1
    s = out[0]
    assert s.person == 2 and s.action == "Walking" and s.type1 == 1
    assert s.type2 == "C2"
    assert np.allclose(s.ofs, [0.5, 1.5])


def test_hpe_parse(tmp_path):
    for i in range(105):
        (tmp_path / f"im{i:04d}.jpg").write_bytes(b"x")
    (tmp_path / "notes.txt").write_text("skip")
    out = ds.load_hpe_parse(str(tmp_path))
    assert len(out["train"]) == 100 and len(out["test"]) == 5


def test_ir_robot(tmp_path):
    d = tmp_path / "Scene01"
    d.mkdir()
    for num in (1, 2):
        for pos in (1, 2, 3):
            (d / f"img{num:03d}_{pos:02d}.png").write_bytes(b"x")
    out = ds.load_ir_robot(str(tmp_path))
    assert list(out) == ["Scene01"]
    assert len(out["Scene01"]) == 2  # two camera positions
    assert len(out["Scene01"][0]) == 3


def test_is_weizmann(tmp_path):
    (tmp_path / "img_0001" / "src_bw").mkdir(parents=True)
    (tmp_path / "seg.mat").write_bytes(b"x")
    out = ds.load_is_weizmann(str(tmp_path))
    assert len(out) == 1
    assert out[0].src_bw == "img_0001/src_bw/img_0001.png"


def test_or_imagenet(tmp_path):
    (tmp_path / "labels.txt").write_text("n01440764,1\nn01443537,2\n")
    syn = tmp_path / "train" / "n01443537"
    syn.mkdir(parents=True)
    (syn / "n01443537_42.JPEG").write_bytes(b"x")
    (tmp_path / "ILSVRC2010_validation_ground_truth.txt").write_text(
        "77\n13\n")
    out = ds.load_or_imagenet(str(tmp_path))
    assert out["train"][0].id == 2
    assert out["validation"][0].image == "val/ILSVRC2010_val_00000001.JPEG"
    assert out["validation"][1].id == 13


def test_or_sun(tmp_path):
    p = tmp_path / "Partitions"
    p.mkdir()
    (p / "Training_01.txt").write_text(
        "/a/abbey/sun_1.jpg\n/a/abbey/sun_2.jpg\n/b/beach/sun_3.jpg\n")
    (p / "Testing_01.txt").write_text("/b/beach/sun_9.jpg\n")
    out = ds.load_or_sun(str(tmp_path), n_partitions=1)
    tr = out["train"][0]
    assert [s.label for s in tr] == [0, 0, 1]
    assert tr[0].name == "sun_1.jpg"
    assert out["test"][0][0].label == 1  # registry shared across parts
    assert out["paths"] == ["/a/abbey/", "/b/beach/"]


def test_pd_caltech(tmp_path):
    d = tmp_path / "set00"
    d.mkdir()
    frames = [b"JPG0", b"JPEGDATA1"]
    with open(d / "V000.seq", "wb") as f:
        f.write(b"\0" * (28 + 8 + 512))
        header = [320, 240, 8, 8, 320 * 240, 102, len(frames), 0, 0]
        f.write(struct.pack("<9I", *header))
        f.write(struct.pack("<d", 30.0))
        f.write(b"\0" * 432)
        for fr in frames:
            f.write(struct.pack("<I", len(fr)))
            f.write(fr)
            f.write(b"\0" * 12)
    out = ds.load_pd_caltech(str(tmp_path))
    info = out["set00"]["V000.seq"]
    assert info.width == 320 and info.num_frames == 2
    assert info.fps == 30.0 and info.ext == "jpg"
    assert info.frame_names == ["/0.jpg", "/1.jpg"]
    assert ds.read_seq_frame(str(d / "V000.seq"), info, 1) == b"JPEGDATA1"


def test_slam_tumindoor(tmp_path):
    info = tmp_path / "info"
    info.mkdir()
    mat = [float(i) for i in range(16)]
    row = "dslr_left_0001.jpg;" + ";".join(str(x) for x in mat)
    row2 = "ladybug_0001.jpg;" + ";".join(str(x) for x in mat)
    (info / "poses.csv").write_text(row + "\n" + row2 + "\n")
    out = ds.load_slam_tumindoor(str(tmp_path))
    assert out[0].type == "left" and out[1].type == "ladybug"
    assert out[0].transform[1, 2] == 6.0  # row-major order


def test_tr_chars(tmp_path):
    (tmp_path / "list_English_Img.m").write_text(
        "list.ALLlabels = [1\n2\n3\n];\n"
        "list.ALLnames = ['img/a.png'\n'img/b.png'\n'img/c.png'\n];\n"
        "list.TRNind = [1 2\n3 0\n];\n"
        "list.TSTind = [2 1\n];\n"
        "list.VALind = [0 3\n];\n")
    out0 = ds.load_tr_chars(str(tmp_path), split=0)
    assert [s.img_name for s in out0["train"]] == ["img/a.png", "img/c.png"]
    assert [s.label for s in out0["test"]] == [2]
    assert out0["validation"] == []
    out1 = ds.load_tr_chars(str(tmp_path), split=1)
    assert [s.img_name for s in out1["train"]] == ["img/b.png"]
    assert [s.img_name for s in out1["validation"]] == ["img/c.png"]


def test_tr_svt(tmp_path):
    xml = """<tagset>
      <image>
        <imageName>img/14_03.jpg</imageName>
        <lex>LIVING,ROOM,FOO</lex>
        <taggedRectangles>
          <taggedRectangle height="75" width="236" x="375" y="253">
            <tag>LIVING</tag>
          </taggedRectangle>
          <taggedRectangle height="76" width="175" x="639" y="272">
            <tag>ROOM</tag>
          </taggedRectangle>
        </taggedRectangles>
      </image>
    </tagset>"""
    p = tmp_path / "train.xml"
    p.write_text(xml)
    out = ds.load_tr_svt(str(p))
    assert len(out) == 1
    s = out[0]
    assert s.file_name == "img/14_03.jpg"
    assert s.lex == ["LIVING", "ROOM", "FOO"]
    assert s.tags[0] == ds.SvtTag("LIVING", 375, 253, 236, 75)
