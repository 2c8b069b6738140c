"""Data-layer tests: chunk index math (vs reference behavior), keypoint format
conversion/flip tables, transforms, datasets, and sharded loaders."""

import numpy as np
import pytest

from maed_tpu.data.chunks import gen_sample_index, split_into_chunks, view_as_windows_1d
from maed_tpu.data.dataset import ImageDataset, VideoDataset
from maed_tpu.data.keypoints import (
    SPIN_JOINT_NAMES,
    convert_kps,
    get_joint_names,
    keypoint_2d_hflip,
    keypoint_3d_hflip,
    smpl_pose_hflip,
)
from maed_tpu.data.loaders import ConcatDataset, ShardedLoader, collate
from maed_tpu.data.transforms import build_eval_transforms, build_train_transforms
from fixtures import make_image_db, make_video_db


# --------------------------------------------------------------------------
# chunk / sampling index math
# --------------------------------------------------------------------------

def test_view_as_windows():
    out = view_as_windows_1d(np.arange(10), 4, 3)
    np.testing.assert_array_equal(out, [[0, 1, 2, 3], [3, 4, 5, 6], [6, 7, 8, 9]])


def test_split_into_chunks_reflect_pads_tail():
    vid = np.array(["a"] * 10 + ["b"] * 8)
    chunks = split_into_chunks(vid, seqlen=8, stride=8, pad=True)
    # video a: 10 frames -> padded to 16 (reflect) -> 2 windows
    assert chunks[0] == list(range(8))
    assert chunks[1] == [8, 9, 8, 7, 6, 5, 4, 3]  # reflect pad
    # video b: exactly 8 -> 1 window with global indices 10..17
    assert chunks[2] == list(range(10, 18))
    assert len(chunks) == 3


def test_split_into_chunks_skips_short_video_without_pad():
    vid = np.array(["a"] * 3 + ["b"] * 8)
    chunks = split_into_chunks(vid, seqlen=8, stride=8, pad=False)
    assert chunks == [list(range(3, 11))]


def test_split_preserves_video_order_by_first_occurrence():
    vid = np.array(["z"] * 8 + ["a"] * 8)  # 'z' first in data, later alphabetically
    chunks = split_into_chunks(vid, seqlen=8, stride=8, pad=True)
    assert chunks[0] == list(range(8))
    assert chunks[1] == list(range(8, 16))


def test_gen_sample_index_modes():
    full = list(range(128))
    rng = np.random.RandomState(0)
    det = gen_sample_index(full, 16, 8, False, False, rng)
    assert det == list(range(0, 128, 8))
    rs = gen_sample_index(full, 16, 8, False, True, rng)
    assert len(rs) == 16 and all(rs[i + 1] - rs[i] == 8 for i in range(15))
    rnd = gen_sample_index(full, 16, 8, True, False, rng)
    assert len(rnd) == 16
    for i, v in enumerate(rnd):
        assert 8 * i <= v < 8 * (i + 1)


# --------------------------------------------------------------------------
# keypoint conversion / flip
# --------------------------------------------------------------------------

def test_spin_flip_table_matches_reference():
    """flip_name-derived spin permutation must equal the reference's explicit
    flipped joint list (/root/reference/lib/data_utils/kp_utils.py:285-340)."""
    flipped = get_joint_names("spin", flip=True)
    expected = [
        'OP Nose', 'OP Neck', 'OP LShoulder', 'OP LElbow', 'OP LWrist',
        'OP RShoulder', 'OP RElbow', 'OP RWrist', 'OP MidHip',
        'OP LHip', 'OP LKnee', 'OP LAnkle', 'OP RHip', 'OP RKnee', 'OP RAnkle',
        'OP LEye', 'OP REye', 'OP LEar', 'OP REar',
        'OP RBigToe', 'OP RSmallToe', 'OP RHeel',
        'OP LBigToe', 'OP LSmallToe', 'OP LHeel',
        'lankle', 'lknee', 'lhip', 'rhip', 'rknee', 'rankle',
        'lwrist', 'lelbow', 'lshoulder', 'rshoulder', 'relbow', 'rwrist',
        'neck', 'headtop', 'hip', 'thorax',
        'Spine (H36M)', 'Jaw (H36M)', 'Head (H36M)',
        'nose', 'reye', 'leye', 'rear', 'lear',
    ]
    assert flipped == expected


def test_convert_kps_identity_and_flip(rng):
    kp = rng.randn(2, 49, 3).astype(np.float32)
    same = convert_kps(kp, "spin", "spin")
    np.testing.assert_array_equal(same, kp)
    flipped = convert_kps(kp, "spin", "spin", flip=True)
    # double flip is identity
    np.testing.assert_array_equal(convert_kps(flipped, "spin", "spin", flip=True), kp)
    # right shoulder <-> left shoulder swapped
    i_r = SPIN_JOINT_NAMES.index("OP RShoulder")
    i_l = SPIN_JOINT_NAMES.index("OP LShoulder")
    np.testing.assert_array_equal(flipped[:, i_r], kp[:, i_l])


def test_convert_kps_h36m_to_spin_zero_fills(rng):
    kp = rng.randn(3, 17, 3).astype(np.float32)
    out = convert_kps(kp, "h36m", "spin")
    assert out.shape == (3, 49, 3)
    # OP joints absent from h36m stay zero
    assert np.all(out[:, 0] == 0)  # OP Nose
    # h36m 'hip' maps to spin index 39
    np.testing.assert_array_equal(out[:, 39], kp[:, 0])


def test_keypoint_2d_hflip_involution(rng):
    kp = rng.rand(4, 49, 3).astype(np.float32) * 224
    back = keypoint_2d_hflip(keypoint_2d_hflip(kp.copy(), 224), 224)
    np.testing.assert_allclose(back, kp, atol=1e-5)


def test_keypoint_3d_hflip_preserves_pelvis(rng):
    kp = rng.randn(2, 49, 4).astype(np.float32)
    out = keypoint_3d_hflip(kp.copy())
    pelvis_in = (kp[:, 27, :] + kp[:, 28, :]) / 2
    pelvis_out = (out[:, 27, :] + out[:, 28, :]) / 2
    np.testing.assert_allclose(pelvis_out[:, :3], pelvis_in[:, :3], atol=1e-5)


def test_smpl_pose_hflip_double_is_identity_except_hand_joints(rng):
    pose = (rng.randn(3, 72) * 0.3).astype(np.float32)
    back = smpl_pose_hflip(smpl_pose_hflip(pose.copy()))
    # the reference's loop skips joint 23, which breaks the round-trip for
    # both hand joints (22 takes from 23, 23 never swapped); 0..21 restore
    np.testing.assert_allclose(back[:, :66], pose[:, :66], atol=1e-6)
    # global orient (joint 0): x kept, y/z double-negated back
    np.testing.assert_allclose(back[:, :3], pose[:, :3], atol=1e-6)


# --------------------------------------------------------------------------
# transforms + datasets + loaders
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def video_db(tmp_path_factory):
    return make_video_db(tmp_path_factory.mktemp("viddb"))


@pytest.fixture(scope="module")
def image_db(tmp_path_factory):
    return make_image_db(tmp_path_factory.mktemp("imgdb"))


class _CfgD:
    HEIGHT = WIDTH = 32
    ROT_JITTER = 10
    SIZE_JITTER = 0.1
    RANDOM_CROP_P = 0.2
    RANDOM_CROP_SIZE = 0.5
    COLOR_JITTER = 0.3
    ERASE_PROB = 0.3
    ERASE_PART = 0.5
    ERASE_FILL = True
    ERASE_KP = True
    ERASE_MARGIN = 0.1
    RANDOM_FLIP = 0.5


def test_video_dataset_train_item(video_db):
    tf = build_train_transforms(_CfgD)
    ds = VideoDataset("testds", "train", tf, seqlen=4, sample_pool=16,
                      overlap=0.5, random_sample=True, db=video_db, verbose=False)
    item = ds.__getitem__(0, rng=np.random.RandomState(0))
    assert item["images"].shape == (4, 32, 32, 3)
    assert item["kp_2d"].shape == (4, 49, 3)
    assert item["kp_3d"].shape == (4, 49, 4)
    assert item["theta"].shape == (4, 85)
    assert item["w_smpl"].shape == (4,)
    # normalized keypoints
    assert np.abs(item["kp_2d"][..., :2]).max() < 3.0
    # deterministic given the same rng seed
    item2 = ds.__getitem__(0, rng=np.random.RandomState(0))
    np.testing.assert_array_equal(item["images"], item2["images"])


def test_video_dataset_eval_item_valid_mask(video_db):
    tf = build_eval_transforms(32, 32)
    ds = VideoDataset("testds", "test", tf, seqlen=8, sample_pool=8,
                      overlap=0, random_sample=False, db=video_db, verbose=False)
    item = ds.__getitem__(len(ds) - 1, rng=np.random.RandomState(0))
    assert item["valid"].dtype == bool
    assert item["valid"][0] == True  # noqa: E712
    assert "paths" in item and len(item["paths"]) == 8


def test_image_dataset_item(image_db):
    tf = build_train_transforms(_CfgD)
    ds = ImageDataset("testimg", "train", tf, db=image_db, verbose=False)
    item = ds.__getitem__(3, rng=np.random.RandomState(0))
    assert item["image"].shape == (32, 32, 3)
    assert item["theta"].shape == (85,)
    assert item["kp_2d"].shape == (49, 3)


def test_sharded_loader_covers_all_and_shards_evenly(video_db):
    tf = build_eval_transforms(32, 32)
    ds = VideoDataset("testds", "test", tf, seqlen=4, sample_pool=4,
                      overlap=0, random_sample=False, db=video_db, verbose=False)
    # two shards must cover >= the whole dataset with equal step counts
    seen = []
    lens = []
    for rank in range(2):
        ld = ShardedLoader(ds, batch_size=2, shuffle=False, rank=rank,
                           world_size=2, drop_last=False, prefetch=0)
        batches = list(ld)
        lens.append(len(batches))
        for b in batches:
            seen.extend(b["index"].ravel().tolist())
    assert lens[0] == lens[1]
    assert set(seen) >= set(range(len(ds)))


def test_sharded_loader_epoch_reshuffles(video_db):
    tf = build_eval_transforms(32, 32)
    ds = VideoDataset("testds", "train", tf, seqlen=2, sample_pool=4,
                      overlap=0, random_sample=True, db=video_db, verbose=False)
    ld = ShardedLoader(ds, batch_size=4, shuffle=True, prefetch=0)
    ld.set_epoch(0)
    i0 = ld._shard_indices()
    ld.set_epoch(1)
    i1 = ld._shard_indices()
    assert not np.array_equal(i0, i1)
    assert sorted(i0.tolist()) == sorted(i1.tolist())


def test_sharded_loader_worker_processes_match_inline(video_db):
    """num_workers>0 (multi-process fetch) yields byte-identical batches in
    identical order to the inline path — the deterministic per-(epoch, index)
    rng makes worker assignment invisible."""
    tf = build_eval_transforms(32, 32)
    ds = VideoDataset("testds", "train", tf, seqlen=4, sample_pool=4,
                      overlap=0, random_sample=False, db=video_db, verbose=False)
    inline = ShardedLoader(ds, batch_size=2, shuffle=True, prefetch=0)
    multi = ShardedLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    inline.set_epoch(3)
    multi.set_epoch(3)
    a = list(inline)
    b = list(multi)
    assert len(a) == len(b) and len(a) > 0
    for ba, bb in zip(a, b):
        assert set(ba) == set(bb)
        for k in ba:
            if isinstance(ba[k], np.ndarray):
                np.testing.assert_array_equal(ba[k], bb[k])


def test_sharded_loader_worker_error_propagates(video_db, monkeypatch):
    class Boom:
        def __len__(self):
            return 8

        def __getitem__(self, i, rng=None):
            raise ValueError("boom")

    # pin the fork start method: the subject here is error propagation, and
    # the locally-defined Boom class cannot pickle under the forkserver
    # default that kicks in once another test has initialized a JAX backend
    monkeypatch.setenv("MAED_LOADER_MP", "fork")
    ld = ShardedLoader(Boom(), batch_size=2, num_workers=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(ld)


def test_collate_mixed_types():
    s = [{"a": np.ones(3), "b": "x"}, {"a": np.zeros(3), "b": "y"}]
    out = collate(s)
    assert out["a"].shape == (2, 3)
    assert out["b"] == ["x", "y"]


def test_fused_native_crop_matches_cv2_path(video_db):
    """The C++ fused crop+normalize must match the cv2+numpy eval path to
    within cv2's fixed-point bilinear quantization."""
    from maed_tpu import native

    if not native.native_available():
        pytest.skip("native clip_ops not built")
    fused = build_eval_transforms(32, 32, fused=True)
    plain = build_eval_transforms(32, 32, fused=False)
    ds_f = VideoDataset("t", "test", fused, seqlen=4, sample_pool=4, overlap=0,
                        random_sample=False, db=video_db, verbose=False)
    ds_p = VideoDataset("t", "test", plain, seqlen=4, sample_pool=4, overlap=0,
                        random_sample=False, db=video_db, verbose=False)
    a = ds_f.__getitem__(0, rng=np.random.RandomState(0))
    b = ds_p.__getitem__(0, rng=np.random.RandomState(0))
    assert np.abs(a["images"] - b["images"]).max() < 0.05
    np.testing.assert_allclose(a["kp_2d"], b["kp_2d"], atol=1e-5)


def test_concat_dataset(video_db, image_db):
    tf = build_eval_transforms(32, 32)
    d1 = VideoDataset("a", "test", tf, seqlen=2, sample_pool=2, overlap=0,
                      random_sample=False, db=video_db, verbose=False)
    d2 = VideoDataset("b", "test", tf, seqlen=2, sample_pool=2, overlap=0,
                      random_sample=False, db=video_db, verbose=False)
    cat = ConcatDataset([d1, d2])
    assert len(cat) == len(d1) + len(d2)
    item = cat.__getitem__(len(d1))  # first item of d2
    assert item["images"].shape[0] == 2


def test_native_jpeg_decode_crop_matches_cv2_path(tmp_path):
    """The C++ threaded JPEG-decode + crop pipeline == cv2-decode + native
    crop, within JPEG-decoder IDCT tolerance (libjpeg vs cv2's decoder can
    differ by a couple of 8-bit LSBs per pixel)."""
    import cv2

    from maed_tpu import native
    from maed_tpu.data.transforms import FusedCropNormalize

    if not (native.native_available() and native.has_jpeg_decode()):
        pytest.skip("native jpeg decode unavailable")

    rng = np.random.RandomState(0)
    T = 4
    frames, blobs = [], []
    for _ in range(T):
        img = rng.randint(0, 255, (90, 120, 3), np.uint8)
        img = cv2.GaussianBlur(img, (5, 5), 2)  # compress-friendly content
        ok, enc = cv2.imencode(".jpg", cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                               [cv2.IMWRITE_JPEG_QUALITY, 95])
        assert ok
        blob = enc.tobytes()
        dec = cv2.cvtColor(
            cv2.imdecode(np.frombuffer(blob, np.uint8), cv2.IMREAD_COLOR),
            cv2.COLOR_BGR2RGB)
        frames.append(dec)
        blobs.append(blob)
    bbox = np.tile(np.array([60.0, 45.0, 50.0, 50.0], np.float32), (T, 1))
    kp = rng.rand(T, 49, 3).astype(np.float32) * 50

    tf = FusedCropNormalize(64, 64)
    r = np.random.RandomState(0)
    out_bytes = tf({"clip": blobs, "bbox": bbox, "kp_2d": kp.copy()}, r)
    out_arrays = tf({"clip": frames, "bbox": bbox, "kp_2d": kp.copy()}, r)
    assert out_bytes["clip"].shape == (T, 64, 64, 3)
    # 3 uint8 LSBs in normalized units ~= 3/255/0.225
    np.testing.assert_allclose(out_bytes["clip"], out_arrays["clip"], atol=0.06)
    np.testing.assert_allclose(out_bytes["kp_2d"], out_arrays["kp_2d"])


def test_video_dataset_eval_uses_jpeg_bytes_path(video_db):
    """End-to-end: the eval pipeline feeds raw JPEG bytes from disk to the
    native decoder (wants_jpeg_bytes plumbing through Compose/VideoDataset)."""
    from maed_tpu import native

    if not (native.native_available() and native.has_jpeg_decode()):
        pytest.skip("native jpeg decode unavailable")

    tf = build_eval_transforms(32, 32)
    assert tf.wants_jpeg_bytes
    ds = VideoDataset("testds", "test", tf, seqlen=4, sample_pool=4,
                      overlap=0, random_sample=False, db=video_db, verbose=False)
    item = ds.__getitem__(0, rng=np.random.RandomState(0))
    assert item["images"].shape == (4, 32, 32, 3)
    assert np.isfinite(item["images"]).all()
