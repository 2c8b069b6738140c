"""Preprocessor tests: bbox math, camera-frame orient alignment, and the
no-TensorFlow TFRecord Example parser (round-trip against hand-built
protobuf wire bytes)."""

import struct

import pytest

import numpy as np

from maed_tpu.data.preprocess.insta import iter_tfrecord, parse_example
from maed_tpu.data.preprocess.mpii3d import bbox_from_kp2d
from maed_tpu.data.preprocess.penn_action import kp_bound_bbox
from maed_tpu.data.preprocess.threedpw import align_global_orient_to_camera


def test_bbox_from_kp2d_square_margin():
    kp = np.array([[10.0, 20.0, 1], [30.0, 60.0, 1], [20.0, 40.0, 1]])
    bbox = bbox_from_kp2d(kp)
    # center (20, 40), h=40 > w=20 -> side = 44
    np.testing.assert_allclose(bbox, [20, 40, 44, 44])


def test_kp_bound_bbox_ignores_invisible():
    kp = np.array([[10.0, 20, 1], [30, 60, 1], [500, 500, 0]])
    bbox = kp_bound_bbox(kp)
    np.testing.assert_allclose(bbox, [20, 40, 40, 40])


def test_align_global_orient():
    from scipy.spatial.transform import Rotation as R

    rng = np.random.RandomState(0)
    pose = np.zeros((4, 72), np.float32)
    pose[:, :3] = R.random(4, random_state=rng).as_rotvec()
    cam = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    cam[:, :3, :3] = R.random(4, random_state=rng).as_matrix()

    out = align_global_orient_to_camera(pose, cam)
    want = R.from_matrix(
        cam[:, :3, :3] @ R.from_rotvec(pose[:, :3]).as_matrix()
    ).as_rotvec()
    got_mat = R.from_rotvec(out[:, :3]).as_matrix()
    want_mat = R.from_rotvec(want).as_matrix()
    np.testing.assert_allclose(got_mat, want_mat, atol=1e-4)
    # body pose untouched
    np.testing.assert_array_equal(out[:, 3:], pose[:, 3:])


# ---------------------------------------------------------------------------
# protobuf wire-format helpers to BUILD a tf.train.Example for the parser test
# ---------------------------------------------------------------------------

def _varint(n):
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b7 | 0x80])
        else:
            out += bytes([b7])
            return out


def _field(fnum, wtype, payload):
    return _varint((fnum << 3) | wtype) + payload


def _len_delim(fnum, data):
    return _field(fnum, 2, _varint(len(data)) + data)


def _bytes_list(values):  # BytesList { repeated bytes value = 1 }
    return b"".join(_len_delim(1, v) for v in values)


def _float_list(values):  # FloatList { repeated float value = 1 [packed] }
    packed = b"".join(struct.pack("<f", v) for v in values)
    return _len_delim(1, packed)


def _feature_bytes(values):
    return _len_delim(1, _bytes_list(values))  # Feature.bytes_list = 1


def _feature_floats(values):
    return _len_delim(2, _float_list(values))  # Feature.float_list = 2


def _example(features: dict) -> bytes:
    entries = b""
    for name, feat in features.items():
        entry = _len_delim(1, name.encode()) + _len_delim(2, feat)
        entries += _len_delim(1, entry)  # Features.feature map entry
    return _len_delim(1, entries)  # Example.features = 1


def test_parse_example_roundtrip(tmp_path):
    floats = [1.5, -2.25, 3.0]
    imgs = [b"\xff\xd8fakejpg1", b"\xff\xd8fakejpg2"]
    record = _example({
        "image/xys": _feature_floats(floats),
        "image_data": _feature_bytes(imgs),
    })

    # write one TFRecord (length + masked-crc placeholders)
    path = tmp_path / "t.tfrecord"
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(record)))
        f.write(b"\x00" * 4)
        f.write(record)
        f.write(b"\x00" * 4)

    records = list(iter_tfrecord(str(path)))
    assert len(records) == 1
    ex = parse_example(records[0])
    np.testing.assert_allclose(np.asarray(ex["image/xys"]), floats, rtol=1e-6)
    assert ex["image_data"] == imgs


def test_parse_example_against_tensorflow_written_shard(tmp_path):
    """Validate the no-TF wire-format reader against a REAL TensorFlow-written
    tfrecord shard: official length+masked-CRC framing, packed float lists,
    varint-packed int64 lists, multi-record files — the edge cases the
    self-round-trip test (above) cannot exercise."""
    tf = pytest.importorskip("tensorflow")

    rng = np.random.RandomState(0)
    path = str(tmp_path / "train_insta.tfrecord")
    n_frames = [3, 5]
    truth = []
    with tf.io.TFRecordWriter(path) as w:
        for nf in n_frames:
            xys = rng.randn(nf * 2 * 25).astype(np.float32)
            vis = (rng.rand(nf * 25) > 0.3).astype(np.float32)
            jpgs = [bytes([0xFF, 0xD8, i, 0x99]) * 7 for i in range(nf)]
            big_ints = [0, 1, 127, 128, 300, 2 ** 31, 2 ** 40 + 3]
            ex = tf.train.Example(features=tf.train.Features(feature={
                "image/xys": tf.train.Feature(
                    float_list=tf.train.FloatList(value=xys)),
                "image/visibilities": tf.train.Feature(
                    float_list=tf.train.FloatList(value=vis)),
                "image_data": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=jpgs)),
                "meta/ints": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=big_ints)),
            }))
            w.write(ex.SerializeToString())
            truth.append((xys, vis, jpgs, big_ints))

    records = list(iter_tfrecord(path))
    assert len(records) == len(n_frames)
    for rec, (xys, vis, jpgs, big_ints) in zip(records, truth):
        ex = parse_example(rec)
        np.testing.assert_allclose(np.asarray(ex["image/xys"]), xys, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(ex["image/visibilities"]), vis, rtol=1e-6)
        assert ex["image_data"] == jpgs
        assert ex["meta/ints"].tolist() == big_ints


def test_insta_read_data_from_tensorflow_shard(tmp_path, monkeypatch):
    """read_data end-to-end on a TF-written shard: joints reshaped to
    (frames, 25, 3), converted to the spin keypoint set, paths/vid names per
    record (reference insta_utils.py:103-407 semantics)."""
    tf = pytest.importorskip("tensorflow")
    from maed_tpu.data.preprocess.insta import read_data

    rng = np.random.RandomState(1)
    rec_dir = tmp_path / "recs"
    rec_dir.mkdir()
    path = str(rec_dir / "train_0.tfrecord")
    nf = 4
    xys = rng.rand(nf, 2, 25).astype(np.float32) * 100
    vis = np.ones((nf, 25), np.float32)
    with tf.io.TFRecordWriter(path) as w:
        ex = tf.train.Example(features=tf.train.Features(feature={
            "image/xys": tf.train.Feature(
                float_list=tf.train.FloatList(value=xys.ravel())),
            "image/visibilities": tf.train.Feature(
                float_list=tf.train.FloatList(value=vis.ravel())),
            "image_data": tf.train.Feature(
                bytes_list=tf.train.BytesList(value=[b"j"] * nf)),
        }))
        w.write(ex.SerializeToString())

    db = read_data(str(rec_dir), "/imgs", split="train")
    assert len(db["img_name"]) == nf
    assert db["joints2D"].shape == (nf, 49, 3)  # spin set
    assert (db["vid_name"] == "train_0_0").all()
    # the insta 25-joint xys land in the spin slots with visibilities intact
    assert db["joints2D"][..., 2].max() == 1.0
