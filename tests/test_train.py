"""Train-step tests: LR schedule parity with the reference LambdaLR, a full
jitted update on a tiny MAED, mixed video+image weighting, checkpoint
save/load policies, and a data-parallel sharded step on the 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from maed_tpu.core.loss import LossWeights
from maed_tpu.models import MAED
from maed_tpu.parallel.mesh import make_mesh, param_shardings, shard_batch
from maed_tpu.parallel.train_step import (
    init_train_state,
    make_optimizer,
    make_train_step,
    warmup_milestone_schedule,
)
from maed_tpu.utils.smpl_io import synthetic_smpl_model


class _Optim:
    OPTIM = "Adam"
    LR = 1e-3
    WD = 1e-5
    MOMENTUM = 0.9
    WARMUP_EPOCH = 2
    WARMUP_FACTOR = 0.1
    MILESTONES = [4, 6]


def torch_ref_lambda(epoch, warmup_epoch, warmup_factor, milestones):
    if epoch < warmup_epoch:
        return (epoch + 1) * warmup_factor
    return 0.1 ** len([m for m in milestones if m <= epoch])


def test_schedule_matches_reference_lambda():
    steps_per_epoch = 10
    sched = warmup_milestone_schedule(1.0, 2, 0.1, [4, 6], steps_per_epoch)
    for epoch in range(8):
        want = torch_ref_lambda(epoch, 2, 0.1, [4, 6])
        got = float(sched(jnp.asarray(epoch * steps_per_epoch + 3)))
        assert got == pytest.approx(want), epoch


def _tiny_setup(rng_seed=0):
    model = MAED(encoder="ste", num_blocks=1, num_heads=2, st_mode="parallel",
                 decoder="ktd", hidden_dim=32)
    smpl = synthetic_smpl_model(num_verts=64)
    tx = make_optimizer(_Optim, steps_per_epoch=10)
    sample = jnp.zeros((2, 2, 32, 32, 3), jnp.float32)
    state = init_train_state(model, tx, sample, smpl, jax.random.PRNGKey(rng_seed))
    step = make_train_step(model, tx, smpl, LossWeights(), donate=False)
    return model, smpl, tx, state, step


def _kp2d(rng, *shape):
    kp = rng.randn(*shape, 49, 3).astype(np.float32)
    kp[..., 2] = 1.0  # confidence in [0, 1]
    return kp


def _vid_batch(rng, n2d=1, n3d=1, T=2):
    n = n2d + n3d
    return {
        "images": rng.randn(n, T, 32, 32, 3).astype(np.float32),
        "target_3d": {
            "kp_2d": _kp2d(rng, n3d, T),
            "kp_3d": np.concatenate(
                [rng.randn(n3d, T, 49, 3), np.ones((n3d, T, 49, 1))], axis=3
            ).astype(np.float32),
            "theta": (rng.randn(n3d, T, 85) * 0.1).astype(np.float32),
            "w_smpl": np.ones((n3d, T), np.float32),
        },
        "target_2d": {"kp_2d": _kp2d(rng, n2d, T)},
    }


def _img_batch(rng, n=2):
    return {
        "image": rng.randn(n, 32, 32, 3).astype(np.float32),
        "kp_2d": _kp2d(rng, n),
        "kp_3d": np.concatenate(
            [rng.randn(n, 49, 3), np.ones((n, 49, 1))], axis=2
        ).astype(np.float32),
        "theta": (rng.randn(n, 85) * 0.1).astype(np.float32),
        "w_smpl": np.ones((n,), np.float32),
    }


def test_train_step_video_only(rng):
    _, _, _, state, step = _tiny_setup()
    batch = _vid_batch(rng)
    new_state, metrics = step(state, batch, None)
    assert float(metrics["loss"]) > 0 and np.isfinite(float(metrics["loss"]))
    # params actually changed
    delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params)
    assert max(jax.tree.leaves(delta)) > 0
    assert int(new_state.step) == 1
    for k in ("loss_kp_2d", "loss_kp_3d", "loss_pose", "loss_shape", "loss_norm"):
        assert k in metrics


def test_train_step_mixed_video_image(rng):
    _, _, _, state, step = _tiny_setup()
    vid = _vid_batch(rng)
    img = _img_batch(rng)
    _, metrics = step(state, vid, img)
    assert np.isfinite(float(metrics["loss"]))
    # weighting: nt_vid = 2*2 = 4, nt_img = 2 -> w_vid = 2/3
    # (verified structurally: both parts contribute to merged loss dict)
    assert float(metrics["loss_kp_2d"]) > 0


def test_loss_decreases_on_repeated_batch(rng):
    """Overfit check: repeating one batch must reduce the loss."""

    class _FastOptim(_Optim):
        LR = 3e-3
        WARMUP_EPOCH = 0
        MILESTONES = []

    model = MAED(encoder="ste", num_blocks=1, num_heads=2, st_mode="parallel",
                 decoder="ktd", hidden_dim=32)
    smpl = synthetic_smpl_model(num_verts=64)
    tx = make_optimizer(_FastOptim, steps_per_epoch=1000)
    sample = jnp.zeros((2, 2, 32, 32, 3), jnp.float32)
    state = init_train_state(model, tx, sample, smpl, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, smpl, LossWeights(), donate=False)

    batch = _vid_batch(rng)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, None)
        losses.append(float(metrics["loss"]))
    assert min(losses[-3:]) < losses[0], losses


def test_checkpoint_roundtrip_and_policies(tmp_path, rng):
    from maed_tpu.utils.checkpoint import (
        load_checkpoint,
        load_eval_params,
        load_pretrained_params,
        save_checkpoint,
    )

    _, _, _, state, step = _tiny_setup()
    new_state, _ = step(state, _vid_batch(rng), None)
    save_checkpoint(
        str(tmp_path), {"params": new_state.params, "epoch": np.asarray(3),
                        "performance": np.asarray(51.2)},
        is_best=True, name="epoch_3",
    )
    ckpt = load_checkpoint(str(tmp_path / "epoch_3"))
    assert int(ckpt["epoch"]) == 3
    best = load_checkpoint(str(tmp_path / "model_best"))
    assert float(best["performance"]) == pytest.approx(51.2)

    # pretrained policy drops the decoder
    fresh, _, _, fresh_state, _ = _tiny_setup(rng_seed=7)
    loaded = load_pretrained_params(fresh_state.params, ckpt["params"])
    enc_diff = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        loaded["encoder"], ckpt["params"]["encoder"]))
    assert max(enc_diff) == 0  # encoder copied
    dec_diff = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(np.asarray(a) - np.asarray(b)).max()),
        loaded["decoder"], fresh_state.params["decoder"]))
    assert max(dec_diff) == 0  # decoder untouched

    # eval policy loads everything
    loaded_all = load_eval_params(fresh_state.params, ckpt["params"])
    dec_diff2 = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(np.asarray(a) - np.asarray(b)).max()),
        loaded_all["decoder"], ckpt["params"]["decoder"]))
    assert max(dec_diff2) == 0


def test_train_step_cnn_batch_stats(rng):
    """Stage-1 path: ResNet50 encoder with BatchNorm running stats updated
    through the jitted step (the reference's SyncBatchNorm-adjacent path)."""
    model = MAED(encoder="cnn", decoder="iterative", hidden_dim=32)
    smpl = synthetic_smpl_model(num_verts=64)
    tx = make_optimizer(_Optim, steps_per_epoch=10)
    sample = jnp.zeros((2, 1, 32, 32, 3), jnp.float32)
    state = init_train_state(model, tx, sample, smpl, jax.random.PRNGKey(0))
    assert state.batch_stats, "cnn encoder must carry batch_stats"
    step = make_train_step(model, tx, smpl, LossWeights(), has_batch_stats=True,
                           donate=False)
    img = _img_batch(rng, n=2)
    new_state, metrics = step(state, None, img)
    assert np.isfinite(float(metrics["loss"]))
    # running stats actually moved
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.batch_stats,
        new_state.batch_stats))
    assert max(diffs) > 0


def test_remat_matches_no_remat(rng):
    """remat changes memory, not math: gradients must be identical."""
    smpl = synthetic_smpl_model(num_verts=64)
    x = jnp.asarray(rng.randn(1, 2, 32, 32, 3).astype(np.float32))

    def grads_for(remat):
        model = MAED(encoder="ste", num_blocks=1, num_heads=2,
                     st_mode="parallel", decoder="ktd", hidden_dim=32,
                     remat=remat)
        v = model.init(jax.random.PRNGKey(0), x, smpl)

        def loss(params):
            out = model.apply({"params": params}, x, smpl)
            return jnp.sum(out["kp_3d"] ** 2)

        # highest precision: the env's bf16-default matmuls round differently
        # across the (different) remat fusion, masking the equality
        with jax.default_matmul_precision("highest"):
            return jax.grad(loss)(v["params"])

    g0 = grads_for(False)
    g1 = grads_for(True)
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-6)),
        g0, g1))
    assert max(diffs) < 1e-3, max(diffs)


def test_dp_sharded_train_step(rng):
    """The full train step over an 8-device ('dp','tp') mesh."""
    assert len(jax.devices()) == 8
    mesh = make_mesh(dp=4, tp=2)
    model, smpl, tx, state, step = _tiny_setup()

    shardings = param_shardings(state.params, mesh)
    params = jax.tree.map(jax.device_put, state.params, shardings)
    state = state._replace(params=params)

    batch = _vid_batch(rng, n2d=2, n3d=2, T=2)  # batch 4 over dp=4
    with mesh:
        batch_dev = shard_batch(batch, mesh)
        new_state, metrics = step(state, batch_dev, None)
    assert np.isfinite(float(metrics["loss"]))
    # qkv kernel sharded over tp
    qkv = new_state.params["encoder"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert not qkv.sharding.is_fully_replicated


def test_multislice_dcn_mesh_matches_flat_dp(rng):
    """A ('dcn','dp','tp') multi-slice mesh (outer data parallelism across
    slice boundaries — the reference's 2-node layout) must produce the same
    loss and updated params as the flat ('dp','tp') mesh: same program, the
    gradient reduction just becomes hierarchical."""
    assert len(jax.devices()) == 8
    model, smpl, tx, state, step = _tiny_setup()
    batch = _vid_batch(rng, n2d=2, n3d=2, T=2)  # batch 4 over 2x2 data axes

    results = []
    for mesh in (make_mesh(dp=4, tp=2), make_mesh(dcn=2, dp=2, tp=2)):
        shardings = param_shardings(state.params, mesh)
        st = state._replace(
            params=jax.tree.map(jax.device_put, state.params, shardings))
        with mesh:
            new_state, metrics = step(st, shard_batch(batch, mesh), None)
        psum = sum(float(jnp.sum(jnp.abs(p)))
                   for p in jax.tree.leaves(new_state.params))
        results.append((float(metrics["loss"]), psum))

    assert results[0][0] == pytest.approx(results[1][0], rel=1e-6)
    assert results[0][1] == pytest.approx(results[1][1], rel=1e-6)


class _AccumOptim(_Optim):
    GRAD_ACCUM_STEPS = 2


def test_grad_accumulation_update_matches_big_batch():
    """k micro-batches through make_optimizer(GRAD_ACCUM_STEPS=k) apply ONE
    update equal to the big-batch step on the averaged gradient (the exact
    semantics that reproduce the reference's 8-GPU global batch on fewer
    chips, /root/reference/scripts/run.sh + per-GPU batches in configs)."""
    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3) / 7.0}
    g1 = {"w": jnp.full((2, 3), 0.25, jnp.float32)}
    g2 = {"w": jnp.linspace(-1.0, 1.0, 6, dtype=jnp.float32).reshape(2, 3)}
    g_mean = jax.tree.map(lambda a, b: (a + b) / 2.0, g1, g2)

    tx_k = make_optimizer(_AccumOptim, steps_per_epoch=10)
    s = tx_k.init(params)
    u1, s = tx_k.update(g1, s, params)
    assert all(float(jnp.abs(u).max()) == 0.0 for u in jax.tree.leaves(u1)), \
        "first micro-step must not touch params"
    u2, s = tx_k.update(g2, s, params)

    tx_1 = make_optimizer(_Optim, steps_per_epoch=5)  # same updates-per-epoch
    u_full, _ = tx_1.update(g_mean, tx_1.init(params), params)

    got = jax.tree.map(lambda a, b: a + b, u1, u2)
    np.testing.assert_allclose(got["w"], u_full["w"], rtol=1e-6, atol=1e-8)


def test_grad_accumulation_through_jitted_train_step(rng):
    """Wiring through the real jitted step: with GRAD_ACCUM_STEPS=2 the first
    call leaves params bit-unchanged (grads only accumulate), the second
    applies the update; the MultiSteps opt_state survives the TrainState
    donation/tree plumbing."""
    model = MAED(encoder="ste", num_blocks=1, num_heads=2, st_mode="parallel",
                 decoder="ktd", hidden_dim=32)
    smpl = synthetic_smpl_model(num_verts=64)
    tx = make_optimizer(_AccumOptim, steps_per_epoch=10)
    sample = jnp.zeros((2, 2, 32, 32, 3), jnp.float32)
    state = init_train_state(model, tx, sample, smpl, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, smpl, LossWeights(), donate=False)

    p0 = jax.tree.map(np.asarray, state.params)
    mid, metrics = step(state, _vid_batch(rng), None)
    assert np.isfinite(float(metrics["loss"]))
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(mid.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    final, _ = step(mid, _vid_batch(rng), None)
    changed = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree.leaves(mid.params), jax.tree.leaves(final.params))
    )
    assert changed, "second micro-step must apply the accumulated update"


def test_async_checkpoint_write(tmp_path, rng):
    """async_write=True must snapshot-before-return (caller may mutate its
    buffers immediately), land the identical bytes on disk, and surface a
    failed background write at the next synchronization point."""
    import maed_tpu.utils.checkpoint as ckpt_mod
    from maed_tpu.utils.checkpoint import (
        load_checkpoint, save_checkpoint, wait_pending_saves,
    )

    params = {"w": np.arange(8, dtype=np.float32)}
    save_checkpoint(str(tmp_path), {"params": params, "epoch": np.asarray(1)},
                    is_best=True, name="epoch_1", async_write=True)
    params["w"] += 100.0  # mutate AFTER the call returned: must not leak in
    wait_pending_saves()
    got = load_checkpoint(str(tmp_path / "epoch_1"))
    np.testing.assert_array_equal(got["params"]["w"],
                                  np.arange(8, dtype=np.float32))
    best = load_checkpoint(str(tmp_path / "model_best"))
    assert int(best["epoch"]) == 1

    # a second async save serializes behind the first and overwrites
    save_checkpoint(str(tmp_path), {"params": {"w": params["w"]},
                                    "epoch": np.asarray(2)},
                    name="epoch_1", async_write=True)
    got = load_checkpoint(str(tmp_path / "epoch_1"))  # load = sync point
    assert int(got["epoch"]) == 2
    assert not ckpt_mod._pending and not ckpt_mod._pending_error

    # background-writer failure is re-raised at the next sync point
    orig = ckpt_mod._checkpointer

    class _Boom:
        def save(self, *a, **k):
            raise RuntimeError("disk full")

    ckpt_mod._checkpointer = lambda: _Boom()
    try:
        save_checkpoint(str(tmp_path), {"epoch": np.asarray(3)},
                        name="epoch_3", async_write=True)
        with pytest.raises(RuntimeError, match="disk full"):
            wait_pending_saves()
    finally:
        ckpt_mod._checkpointer = orig
    assert not ckpt_mod._pending and not ckpt_mod._pending_error
