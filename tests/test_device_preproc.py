"""DEVICE_PREPROC (uint8 shipping + in-jit normalize): the on-device
preprocessing stage (north star: BASELINE.json "clip decode/crop/resize/
normalize moved into an on-device preprocessing stage").

Contract under test: the host pipeline keeps frames uint8 end-to-end (the
augmentations already operate on uint8), ships 1/4 the host->device bytes,
and the model ImageNet-normalizes INSIDE its jit (ops/image.device_normalize
dispatching on the static input dtype). The uint8 path must reproduce the
f32 host-normalize path exactly (same uint8 crop, same f32 arithmetic).

Host path being replaced: /root/reference/lib/data_utils/transforms/
basic.py:28-117 (ToTensor+Normalize) after crop.py:88-92.
"""

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maed_tpu.data.dataset import VideoDataset
from maed_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    StackNormalize,
    build_eval_transforms,
    build_train_transforms,
)
from maed_tpu.ops.image import device_normalize
from tests.fixtures import make_video_db


@pytest.fixture(scope="module")
def video_db(tmp_path_factory):
    return make_video_db(tmp_path_factory.mktemp("dp_vid"), n_videos=1,
                         frames_per_video=12, img_size=48)


def _host_normalize(u8):
    return (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def test_device_normalize_dispatch():
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, (2, 3, 8, 8, 3), dtype=np.uint8)
    dev = np.asarray(jax.jit(device_normalize)(jnp.asarray(u8)))
    # XLA fuses the normalize into FMAs: last-ulp-only differences vs numpy
    np.testing.assert_allclose(dev, _host_normalize(u8), rtol=2e-7, atol=2e-7)
    # float inputs pass through UNCHANGED (the pre-round-5 contract: every
    # f32 caller keeps an identical graph)
    f32 = _host_normalize(u8)
    out = np.asarray(jax.jit(device_normalize)(jnp.asarray(f32)))
    assert np.array_equal(out, f32)


def test_native_u8_crop_matches_cv2():
    from maed_tpu import native

    if not native.has_u8_crop():
        pytest.skip("native u8 crop not built")
    rng = np.random.RandomState(1)
    frames = [rng.randint(0, 256, (40, 56, 3), dtype=np.uint8) for _ in range(5)]
    trans = np.stack([
        np.array([[0.8, 0.0, 1.5 + 0.3 * i], [0.0, 0.8, -2.0 + 0.5 * i]])
        for i in range(5)
    ])
    u8 = native.clip_crop_u8(frames, trans, 32, 32)
    assert u8.dtype == np.uint8 and u8.shape == (5, 32, 32, 3)
    ref = np.stack([
        cv2.warpAffine(f, t, (32, 32), flags=cv2.INTER_LINEAR,
                       borderMode=cv2.BORDER_CONSTANT)
        for f, t in zip(frames, trans)
    ])
    # cv2 uses fixed-point bilinear; the native float path rounds within 1 LSB
    assert np.abs(u8.astype(int) - ref.astype(int)).max() <= 1


def test_stack_normalize_device_mode():
    rng = np.random.RandomState(2)
    frames = [rng.randint(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(3)]
    kp = rng.rand(3, 49, 3).astype(np.float32) * 16
    inst = {"clip": frames, "kp_2d": kp}
    host = StackNormalize(16)(dict(inst))
    dev = StackNormalize(16, device_normalize=True)(dict(inst))
    assert dev["clip"].dtype == np.uint8
    assert np.array_equal(_host_normalize(dev["clip"]), host["clip"])
    np.testing.assert_array_equal(dev["kp_2d"], host["kp_2d"])


@pytest.mark.parametrize("fused", [True, False])
def test_eval_pipeline_u8_equals_f32(video_db, fused):
    """The uint8 eval pipeline, after in-jit normalize, must match the f32
    host pipeline (bit-equal on the cv2 fallback; within the native float-
    warp-vs-uint8-rounding half-LSB on the native path)."""
    tf_dev = build_eval_transforms(32, 32, fused=fused, device_normalize=True)
    tf_f32 = build_eval_transforms(32, 32, fused=fused, device_normalize=False)
    kw = dict(seqlen=4, sample_pool=4, overlap=0, random_sample=False,
              db=video_db, verbose=False)
    a = VideoDataset("t", "test", tf_dev, **kw).__getitem__(
        0, rng=np.random.RandomState(0))
    b = VideoDataset("t", "test", tf_f32, **kw).__getitem__(
        0, rng=np.random.RandomState(0))
    assert a["images"].dtype == np.uint8
    assert b["images"].dtype == np.float32
    # half a uint8 LSB in normalized units: 0.5/255/std
    atol = 0.5 / 255.0 / float(IMAGENET_STD.min()) + 1e-6
    np.testing.assert_allclose(_host_normalize(a["images"]), b["images"],
                               atol=atol)
    np.testing.assert_allclose(a["kp_2d"], b["kp_2d"], atol=1e-6)


def test_train_pipeline_u8_bit_equal(video_db):
    """Train stack (crop/erase/flip all uint8) + device normalize is
    BIT-equal to the host-normalize stack under the same augmentation rng."""
    class _D:
        HEIGHT = WIDTH = 32
        ROT_JITTER = 20; SIZE_JITTER = 0.2
        RANDOM_CROP_P = 0.3; RANDOM_CROP_SIZE = 0.5
        COLOR_JITTER = 0.3; ERASE_PROB = 0.3; ERASE_PART = 0.5
        ERASE_FILL = True; ERASE_KP = True; ERASE_MARGIN = 0.1
        RANDOM_FLIP = 0.5

    class _DDev(_D):
        DEVICE_PREPROC = True

    kw = dict(seqlen=4, sample_pool=8, overlap=0, random_sample=True,
              db=video_db, verbose=False)
    a = VideoDataset("t", "train", build_train_transforms(_DDev), **kw
                     ).__getitem__(1, rng=np.random.RandomState(7))
    b = VideoDataset("t", "train", build_train_transforms(_D), **kw
                     ).__getitem__(1, rng=np.random.RandomState(7))
    assert a["images"].dtype == np.uint8
    assert np.array_equal(_host_normalize(a["images"]), b["images"])
    np.testing.assert_array_equal(a["kp_2d"], b["kp_2d"])
    np.testing.assert_array_equal(a["theta"], b["theta"])


def test_model_dispatch_u8_equals_f32():
    """MAED on a uint8 clip == MAED on the host-normalized f32 clip: the
    in-jit normalize feeds the encoder identical values."""
    from maed_tpu.models import MAED
    from maed_tpu.utils.smpl_io import synthetic_smpl_model

    smpl = synthetic_smpl_model(num_verts=120)
    model = MAED(encoder="ste", num_blocks=1, num_heads=2, st_mode="parallel",
                 decoder="ktd", hidden_dim=32)
    rng = np.random.RandomState(3)
    u8 = rng.randint(0, 256, (1, 2, 32, 32, 3), dtype=np.uint8)
    f32 = _host_normalize(u8)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(f32), smpl)
    out_f = jax.jit(lambda v, x: model.apply(v, x, smpl))(variables, jnp.asarray(f32))
    out_u = jax.jit(lambda v, x: model.apply(v, x, smpl))(variables, jnp.asarray(u8))
    # the in-jit normalize differs from numpy by 1 ulp (XLA FMA fusion);
    # the default LOW matmul precision amplifies that to ~1e-5 absolute
    for k in out_f:
        np.testing.assert_allclose(np.asarray(out_u[k]), np.asarray(out_f[k]),
                                   rtol=2e-3, atol=2e-4, err_msg=k)


def test_train_step_u8_equals_f32():
    """One optimizer step from a uint8 batch matches the f32 batch step."""
    from maed_tpu.core.loss import LossWeights
    from maed_tpu.models import MAED
    from maed_tpu.parallel.train_step import (
        init_train_state, make_optimizer, make_train_step,
    )
    from maed_tpu.utils.smpl_io import synthetic_smpl_model

    class _O:
        LR, WD, WARMUP_EPOCH, WARMUP_FACTOR, MILESTONES = 1e-3, 0.0, 1, 0.1, [9]
        OPTIM, MOMENTUM = "adam", 0.9
        GRAD_ACCUM_STEPS = 1

    smpl = synthetic_smpl_model(num_verts=120)
    model = MAED(encoder="ste", num_blocks=1, num_heads=2, st_mode="parallel",
                 decoder="ktd", hidden_dim=32)
    tx = make_optimizer(_O(), steps_per_epoch=10)
    rng = np.random.RandomState(4)
    u8 = rng.randint(0, 256, (2, 2, 32, 32, 3), dtype=np.uint8)
    tgt = {
        "kp_2d": rng.rand(2, 2, 49, 3).astype(np.float32),
        "kp_3d": rng.rand(2, 2, 49, 4).astype(np.float32),
        "theta": (rng.rand(2, 2, 85) * 0.1).astype(np.float32),
        "w_smpl": np.ones((2, 2), np.float32),
    }
    state = init_train_state(model, tx, jnp.asarray(_host_normalize(u8)), smpl,
                             jax.random.PRNGKey(0))
    step = make_train_step(model, tx, smpl, LossWeights(), donate=False)
    vid_u = {"images": u8, "target_3d": tgt, "target_2d": None}
    vid_f = {"images": _host_normalize(u8), "target_3d": tgt, "target_2d": None}
    su, mu = step(state, vid_u, None)
    sf, mf = step(state, vid_f, None)
    np.testing.assert_allclose(float(mu["loss"]), float(mf["loss"]),
                               rtol=1e-4, atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4),
        su.params, sf.params)


def test_device_crop_pack_schema(video_db):
    """DEVICE_CROP: the dataset ships RAW uint8 frames + affines; keypoints
    match the host-cropped pipeline exactly (same affine on host)."""
    tf_pack = build_eval_transforms(32, 32, device_crop=True)
    tf_f32 = build_eval_transforms(32, 32, fused=False)
    kw = dict(seqlen=4, sample_pool=4, overlap=0, random_sample=False,
              db=video_db, verbose=False)
    a = VideoDataset("t", "test", tf_pack, **kw).__getitem__(
        0, rng=np.random.RandomState(0))
    b = VideoDataset("t", "test", tf_f32, **kw).__getitem__(
        0, rng=np.random.RandomState(0))
    assert a["images"].dtype == np.uint8
    assert a["images"].shape == (4, 48, 48, 3)      # RAW source frames
    assert a["trans"].shape == (4, 2, 3)
    np.testing.assert_allclose(a["kp_2d"], b["kp_2d"], atol=1e-5)
    # the in-jit separable warp reproduces the host crop to bilinear accuracy
    from maed_tpu.ops.image import apply_device_preproc

    dev = np.asarray(jax.jit(
        lambda p: apply_device_preproc(p, 32, 32)
    )({"frames": a["images"][None], "trans": a["trans"][None]}))[0]
    assert np.abs(dev - b["images"]).max() < 0.05


def test_evaluator_device_crop_protocol(video_db):
    """The full windowed eval protocol (stride/merge/dedup) over the
    DEVICE_CROP pack must score the same frames as the f32 pipeline: a probe
    apply_fn returns per-frame pixel statistics of the IN-JIT crop, which
    must line up frame-for-frame with the host crop's statistics."""
    from maed_tpu.core.evaluate import Evaluator
    from maed_tpu.data.loaders import ShardedLoader
    from maed_tpu.ops.image import apply_device_preproc
    from maed_tpu.utils.smpl_io import synthetic_smpl_model

    def probe_apply(variables, images, J_regressor=None):
        x = apply_device_preproc(images, 32, 32)     # (N, T, 32, 32, 3) f32
        m = x.mean(axis=(2, 3))                       # (N, T, 3)
        N, T = m.shape[:2]
        kp3 = jnp.broadcast_to(m[:, :, None, :], (N, T, 49, 3))
        return {
            "theta": jnp.zeros((N, T, 85), jnp.float32),
            "verts": jnp.broadcast_to(m[:, :, None, :], (N, T, 8, 3)),
            "kp_2d": kp3[..., :2],
            "kp_3d": kp3,
            "rotmat": jnp.zeros((N, T, 24, 3, 3), jnp.float32),
        }

    kw = dict(seqlen=0, sample_pool=8, overlap=0, random_sample=False,
              random_start=False, db=video_db, verbose=False)
    results = {}
    for mode, tf in [
        ("pack", build_eval_transforms(32, 32, device_crop=True)),
        ("f32", build_eval_transforms(32, 32, fused=False)),
    ]:
        ds = VideoDataset("t", "val", tf, **kw)
        loader = ShardedLoader(ds, 2, shuffle=False, drop_last=False)
        ev = Evaluator(synthetic_smpl_model(num_verts=8))
        ev.inference(probe_apply, loader, seqlen=4, interp=1,
                     dataset_name="t", batch_size=2, verbose=False,
                     variables={"params": {}}, allow_missing_regressor=True)
        results[mode] = np.concatenate(ev.accumulators["pred_j3d"], axis=0)
    assert results["pack"].shape == results["f32"].shape
    # same frames in the same order; values differ only by the separable-
    # warp-vs-cv2 bilinear quantization
    np.testing.assert_allclose(results["pack"], results["f32"], atol=0.02)


def test_get_data_loaders_ship_u8(video_db, tmp_path):
    """With DATASET.DEVICE_PREPROC=True (the real-config default), every
    loader ships uint8 images."""
    from maed_tpu.core.config import get_cfg_defaults
    from maed_tpu.data.loaders import get_data_loaders

    cfg = get_cfg_defaults()
    assert cfg.DATASET.DEVICE_PREPROC  # default-on in the real schema
    cfg.NUM_WORKERS = 0
    cfg.DATASET.WIDTH = cfg.DATASET.HEIGHT = 32
    cfg.DATASET.SEQLEN = 2
    cfg.DATASET.SAMPLE_POOL = 4
    cfg.TRAIN.DATASETS_2D = []
    cfg.TRAIN.DATASETS_3D = ["t"]
    cfg.TRAIN.DATASETS_IMG = []
    cfg.TRAIN.DATASET_EVAL = "t"
    cfg.TRAIN.BATCH_SIZE_3D = 2
    cfg.EVAL.BATCH_SIZE = 1
    cfg.EVAL.SAMPLE_POOL = 4
    loaders = get_data_loaders(
        cfg, db_overrides={"t": video_db, "t_val": video_db}, verbose=False)
    tr = next(iter(loaders["train_3d"]))
    assert tr["images"].dtype == np.uint8
    va = next(iter(loaders["valid"]))
    assert va["images"].dtype == np.uint8
    # flipping the knob restores the f32 reference contract
    cfg.DATASET.DEVICE_PREPROC = False
    loaders = get_data_loaders(
        cfg, db_overrides={"t": video_db, "t_val": video_db}, verbose=False)
    assert next(iter(loaders["train_3d"]))["images"].dtype == np.float32
