"""Model-layer tests: SAME-conv/GroupNorm torch parity, KTD ancestor chain,
decoder and MAED end-to-end shapes on a synthetic SMPL model."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from maed_tpu.models.ktd import ANCESTOR_INDEX, KTD
from maed_tpu.models.maed import MAED
from maed_tpu.models.resnetv2 import StdConv, max_pool_same
from maed_tpu.models.spin import IterativeRegressor
from maed_tpu.utils.smpl_io import synthetic_smpl_model


def test_ancestor_index_matches_smpl_tree():
    """The derived table must equal the reference's hard-coded chains
    (/root/reference/lib/models/ktd.py:10-35)."""
    expected = [
        [], [0], [0], [0], [0, 1], [0, 2], [0, 3], [0, 1, 4], [0, 2, 5],
        [0, 3, 6], [0, 1, 4, 7], [0, 2, 5, 8], [0, 3, 6, 9], [0, 3, 6, 9],
        [0, 3, 6, 9], [0, 3, 6, 9, 12], [0, 3, 6, 9, 13], [0, 3, 6, 9, 14],
        [0, 3, 6, 9, 13, 16], [0, 3, 6, 9, 14, 17], [0, 3, 6, 9, 13, 16, 18],
        [0, 3, 6, 9, 14, 17, 19], [0, 3, 6, 9, 13, 16, 18, 20],
        [0, 3, 6, 9, 14, 17, 19, 21],
    ]
    assert ANCESTOR_INDEX == expected


def torch_std_conv_same(x_nchw, w_oihw, stride, eps=1e-5):
    """Oracle: weight-standardized conv with TF SAME padding in torch."""
    std, mean = torch.std_mean(w_oihw, dim=[1, 2, 3], keepdim=True, unbiased=False)
    w = (w_oihw - mean) / (std + eps)
    ih, iw = x_nchw.shape[-2:]
    kh, kw = w.shape[-2:]
    pad_h = max((int(np.ceil(ih / stride)) - 1) * stride + kh - ih, 0)
    pad_w = max((int(np.ceil(iw / stride)) - 1) * stride + kw - iw, 0)
    x = F.pad(x_nchw, [pad_w // 2, pad_w - pad_w // 2, pad_h // 2, pad_h - pad_h // 2])
    return F.conv2d(x, w, None, stride)


def test_stdconv_same_matches_torch(rng):
    # odd input size + stride 2 exercises the asymmetric SAME padding
    for hw, k, s in [(15, 7, 2), (14, 3, 2), (8, 3, 1), (7, 1, 1)]:
        x = rng.randn(2, hw, hw, 5).astype(np.float32)
        conv = StdConv(6, (k, k), (s, s))
        params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        with jax.default_matmul_precision("highest"):
            got = np.asarray(conv.apply({"params": params}, jnp.asarray(x)))

        w_hwio = np.asarray(params["kernel"])
        w_oihw = torch.from_numpy(np.transpose(w_hwio, (3, 2, 0, 1)).copy())
        want = torch_std_conv_same(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()), w_oihw, s
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, atol=1e-4), (hw, k, s)


def test_maxpool_same_matches_torch(rng):
    for hw in [15, 14, 7]:
        x = rng.randn(2, hw, hw, 4).astype(np.float32)
        got = np.asarray(max_pool_same(jnp.asarray(x), 3, 2))
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
        pad = max((int(np.ceil(hw / 2)) - 1) * 2 + 3 - hw, 0)
        xt = F.pad(xt, [pad // 2, pad - pad // 2] * 2, value=-float("inf"))
        want = F.max_pool2d(xt, 3, 2).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_ktd_decoder_output(rng):
    model = synthetic_smpl_model(num_verts=200)
    feat = jnp.asarray(rng.randn(6, 32).astype(np.float32))
    ktd = KTD(hidden_dim=64)
    params = ktd.init(jax.random.PRNGKey(0), feat, model)["params"]
    out = ktd.apply({"params": params}, feat, model)
    assert out["theta"].shape == (6, 85)
    assert out["verts"].shape == (6, 200, 3)
    assert out["kp_2d"].shape == (6, 49, 2)
    assert out["kp_3d"].shape == (6, 49, 3)
    assert out["rotmat"].shape == (6, 24, 3, 3)
    # 24 per-joint regressors with ancestor-conditioned input dims
    for j, anc in enumerate(ANCESTOR_INDEX):
        assert params[f"joint_reg{j}"]["kernel"].shape == (64 + 6 * len(anc), 6)


def test_ktd_with_eval_regressor(rng):
    model = synthetic_smpl_model(num_verts=150)
    J_reg = jnp.asarray(rng.rand(14, 150).astype(np.float32))
    feat = jnp.asarray(rng.randn(3, 16).astype(np.float32))
    ktd = KTD(hidden_dim=32)
    params = ktd.init(jax.random.PRNGKey(0), feat, model)["params"]
    out = ktd.apply({"params": params}, feat, model, J_regressor=J_reg)
    assert out["kp_3d"].shape == (3, 14, 3)
    assert out["kp_2d"].shape == (3, 14, 2)


def test_iterative_decoder(rng):
    model = synthetic_smpl_model(num_verts=100)
    feat = jnp.asarray(rng.randn(4, 16).astype(np.float32))
    reg = IterativeRegressor(hidden_dim=32)
    params = reg.init(jax.random.PRNGKey(0), feat, model)["params"]
    out = reg.apply({"params": params}, feat, model)
    assert out["theta"].shape == (4, 85)
    assert out["rotmat"].shape == (4, 24, 3, 3)
    # fc1 consumes [feat || pose(144) || shape(10) || cam(3)]
    assert params["fc1"]["kernel"].shape == (16 + 144 + 10 + 3, 32)


def test_maed_ste_end_to_end_shapes(rng):
    """Full MAED (tiny ViT config, 32x32 frames) on a synthetic SMPL model."""
    model = synthetic_smpl_model(num_verts=120)
    maed = MAED(encoder="ste", num_blocks=1, num_heads=2, st_mode="parallel",
                decoder="ktd", hidden_dim=32)
    # 32x32 input -> hybrid stem gives 2x2 feature map -> 4 patches
    x = jnp.asarray(rng.randn(2, 4, 32, 32, 3).astype(np.float32))
    variables = maed.init(jax.random.PRNGKey(0), x, model)
    out = maed.apply(variables, x, model)
    assert out["theta"].shape == (2, 4, 85)
    assert out["verts"].shape == (2, 4, 120, 3)
    assert out["kp_2d"].shape == (2, 4, 49, 2)
    assert out["kp_3d"].shape == (2, 4, 49, 3)
    assert out["rotmat"].shape == (2, 4, 24, 3, 3)


def test_maed_cnn_encoder_shapes(rng):
    model = synthetic_smpl_model(num_verts=80)
    maed = MAED(encoder="cnn", decoder="iterative", hidden_dim=32)
    x = jnp.asarray(rng.randn(1, 1, 32, 32, 3).astype(np.float32))
    variables = maed.init(jax.random.PRNGKey(0), x, model)
    out = maed.apply(variables, x, model)
    assert out["theta"].shape == (1, 1, 85)
    assert "batch_stats" in variables
