"""AOT serving export (utils/export.py): serialize -> deserialize -> call
must reproduce the direct flax apply (same platform, params baked in as
constants; the export pipeline may fuse differently, so equality is tight
allclose rather than bit-exact), and the artifact must be self-contained
(callable without the model object)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maed_tpu.models import MAED
from maed_tpu.utils.export import export_eval_forward, load_exported
from maed_tpu.utils.smpl_io import synthetic_smpl_model


@pytest.fixture(scope="module")
def tiny_setup():
    smpl = synthetic_smpl_model(num_verts=120)
    model = MAED(encoder="ste", num_blocks=1, num_heads=2, st_mode="parallel",
                 decoder="ktd", hidden_dim=32)
    x = np.random.RandomState(0).randn(2, 4, 32, 32, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), smpl)
    return model, variables, smpl, x


def test_export_roundtrip_matches_apply(tiny_setup):
    model, variables, smpl, x = tiny_setup
    blob = export_eval_forward(model, variables, smpl, batch_size=2, seqlen=4,
                               height=32, width=32, platforms=("cpu",))
    assert isinstance(blob, bytes) and len(blob) > 1000

    fwd = load_exported(blob)
    assert fwd.platforms == ("cpu",)
    got = fwd(x)
    want = model.apply(variables, jnp.asarray(x), smpl, deterministic=True)
    for k in ("theta", "verts", "kp_2d", "kp_3d", "rotmat"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=2e-2, atol=1e-4, err_msg=k)


def test_export_u8_input_contract(tiny_setup):
    """--input_dtype u8: the artifact takes RAW uint8 crops, normalizes
    in-graph, and matches the f32 artifact fed the host-normalized values
    (the DEVICE_PREPROC serving contract; clients ship 1/4 the bytes)."""
    model, variables, smpl, _ = tiny_setup
    u8 = np.random.RandomState(3).randint(0, 256, (2, 4, 32, 32, 3),
                                          dtype=np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    f32 = (u8.astype(np.float32) / 255.0 - mean) / std

    blob_u8 = export_eval_forward(model, variables, smpl, batch_size=2,
                                  seqlen=4, height=32, width=32,
                                  platforms=("cpu",), input_dtype="u8")
    blob_f32 = export_eval_forward(model, variables, smpl, batch_size=2,
                                   seqlen=4, height=32, width=32,
                                   platforms=("cpu",))
    fwd_u8 = load_exported(blob_u8)
    assert str(fwd_u8.in_avals[-1].dtype) == "uint8"
    got = fwd_u8(u8)
    want = load_exported(blob_f32)(f32)
    for k in ("theta", "verts", "kp_2d", "kp_3d", "rotmat"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=2e-2, atol=2e-4, err_msg=k)


def test_export_bakes_regressor(tiny_setup):
    model, variables, smpl, x = tiny_setup
    jreg = np.abs(np.random.RandomState(1).rand(17, 120)).astype(np.float32)
    jreg /= jreg.sum(axis=1, keepdims=True)
    blob = export_eval_forward(model, variables, smpl, batch_size=2, seqlen=4,
                               height=32, width=32, J_regressor=jreg,
                               platforms=("cpu",))
    got = load_exported(blob)(x)
    want = model.apply(variables, jnp.asarray(x), smpl,
                       J_regressor=jnp.asarray(jreg), deterministic=True)
    np.testing.assert_allclose(np.asarray(got["kp_3d"]),
                               np.asarray(want["kp_3d"]),
                               rtol=2e-2, atol=1e-4)


def test_export_rejects_wrong_shape(tiny_setup):
    model, variables, smpl, x = tiny_setup
    blob = export_eval_forward(model, variables, smpl, batch_size=2, seqlen=4,
                               height=32, width=32, platforms=("cpu",))
    fwd = load_exported(blob)
    with pytest.raises(Exception):
        fwd(x[:1])  # batch 1 != exported batch 2


def test_export_args_mode_roundtrip(tiny_setup):
    """bake_params=False: params travel as a flat numpy dict (saved/loaded
    via npz), the program stays small, outputs match the baked artifact."""
    import io

    model, variables, smpl, x = tiny_setup
    baked = export_eval_forward(model, variables, smpl, batch_size=2,
                                seqlen=4, height=32, width=32,
                                platforms=("cpu",))
    blob, flat = export_eval_forward(model, variables, smpl, batch_size=2,
                                     seqlen=4, height=32, width=32,
                                     platforms=("cpu",), bake_params=False)
    assert len(blob) < len(baked) / 2  # constants moved out of the program

    # npz round-trip (the CLI's on-disk format for the param side-file)
    buf = io.BytesIO()
    np.savez(buf, **flat)
    buf.seek(0)
    loaded = np.load(buf)

    fwd = load_exported(blob)
    got = fwd(loaded, x)
    want = load_exported(baked)(x)
    for k in ("theta", "verts", "kp_3d"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=2e-2, atol=1e-4, err_msg=k)
