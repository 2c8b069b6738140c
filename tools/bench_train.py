"""Benchmark the full train step on the real chip.

Default composition mirrors the reference's per-GPU stage-2 recipe
(train.py / configs/config_stage2.yaml): 3 2D-video + 4 3D-video clips of
16 frames plus 7 images per step — both forwards, weighted loss, backward,
Adam update in one executable. --stage1 switches to the stage-1 recipe
(configs/config_stage1.yaml: image-only, resnet50 'cnn' encoder,
BATCH_SIZE_IMG=128). Prints ms/step and frames/s.

Usage: python tools/bench_train.py [--stage1] [--remat] [--dtype bf16|f32]

--learn N switches from timing to a LEARNING soak (VERDICT r3 next #2): N
real stage-2 steps at flagship scale (6x768, 224px, bf16 + pallas-LBS custom
VJP + donation — the exact shipped training path) over a fixed set of
self-consistent batches (targets derived from the SMPL forward, not noise),
recording the full loss trajectory to --out as JSON and asserting sustained
decrease (mean of last 10% < 0.8x mean of first 10%). Run it once per dtype
and compare the two trajectories to bound the bf16-vs-f32 divergence — the
training-numerics bug class (custom-VJP gradient, bf16 drift) that a tiny
CPU overfit test cannot see. Round-4 reference curves: doc/design.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--stage1", action="store_true",
                    help="stage-1 recipe: image-only batch 128, cnn encoder")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--cost", action="store_true",
                    help="print the compiled step's FLOP/byte cost_analysis")
    ap.add_argument("--donate", action="store_true",
                    help="donate the state buffers (the production Trainer "
                    "path) — lets XLA update params/opt-state in place")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--learn", type=int, default=0,
                    help="run N learning steps over fixed self-consistent "
                    "batches and record the loss trajectory (see module "
                    "docstring); 0 = timing mode")
    ap.add_argument("--out", default="",
                    help="--learn: write the trajectory JSON here")
    ap.add_argument("--n_batches", type=int, default=4,
                    help="--learn: distinct batches cycled during the soak")
    ap.add_argument("--smoke", action="store_true",
                    help="--learn wiring check at tiny scale (1 block, 64px) "
                    "on CPU; records the trajectory but skips the sustained-"
                    "decrease assert (too few steps to demand it)")
    ap.add_argument("--trace", default="",
                    help="capture a jax.profiler trace of the timed loop to "
                    "this dir (feed to tools/trace_ops.py for the per-op "
                    "device-time rollup)")
    ap.add_argument("--u8", action="store_true",
                    help="feed device-resident uint8 frames (the shipped "
                    "DATASET.DEVICE_PREPROC train contract: ImageNet "
                    "normalize fuses into the step's jit) — isolates the "
                    "in-jit normalize cost from the 4x-smaller H2D that "
                    "the e2e runs measure")
    args = ap.parse_args()

    # honor JAX_PLATFORMS=cpu (the image's sitecustomize pins axon otherwise;
    # without this a "CPU smoke" silently runs on — and contends for — the TPU)
    from maed_tpu.utils.platform import honor_env_platform

    honor_env_platform()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from maed_tpu.core.loss import LossWeights
    from maed_tpu.models import MAED
    from maed_tpu.parallel.train_step import (
        init_train_state, make_optimizer, make_train_step,
    )
    from maed_tpu.utils.smpl_io import find_smpl_model

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    if args.smoke:
        model = MAED(encoder="ste", num_blocks=1, num_heads=2,
                     st_mode="parallel", decoder="ktd", hidden_dim=64,
                     dtype=dtype)
    elif args.stage1:
        # configs/config_stage1.yaml: cnn (torchvision resnet50) encoder,
        # iterative decoder is NOT used there either — stage 1 trains ktd
        # on image batches only (reference lib/models/maed.py:35-37)
        model = MAED(encoder="cnn", decoder="ktd", hidden_dim=1024,
                     dtype=dtype)
    else:
        model = MAED(encoder="ste", num_blocks=6, num_heads=12,
                     st_mode="parallel", decoder="ktd", hidden_dim=1024,
                     remat=args.remat, dtype=dtype)
    smpl = find_smpl_model()

    class _O:
        LR, WD, WARMUP_EPOCH, WARMUP_FACTOR, MILESTONES = 5e-5, 0.0, 2, 0.1, [30]
        OPTIM, MOMENTUM = "adam", 0.9

    tx = make_optimizer(_O(), steps_per_epoch=500)
    rng = np.random.RandomState(0)
    n2d, n3d, nimg, T, res = 3, 4, 7, 16, 224
    if args.stage1:
        n2d, n3d, nimg = 0, 0, 128  # BATCH_SIZE_IMG, config_stage1.yaml
    if args.smoke:
        n2d, n3d, nimg, T, res = 1, 2, 2, 4, 64
    def _frames(*shape):
        if args.u8:
            return jnp.asarray(
                rng.randint(0, 256, shape).astype(np.uint8))
        return jnp.asarray(rng.randn(*shape).astype(np.float32))

    vid = None if n2d + n3d == 0 else {
        "images": _frames(n2d + n3d, T, res, res, 3),
        "target_2d": {"kp_2d": jnp.asarray(rng.rand(n2d, T, 49, 3).astype(np.float32))},
        "target_3d": {
            "kp_2d": jnp.asarray(rng.rand(n3d, T, 49, 3).astype(np.float32)),
            "kp_3d": jnp.asarray(rng.rand(n3d, T, 49, 4).astype(np.float32)),
            "theta": jnp.asarray(rng.rand(n3d, T, 85).astype(np.float32)),
            "w_smpl": jnp.ones((n3d, T), np.float32),
        },
    }
    img = {
        "image": _frames(nimg, res, res, 3),
        "kp_2d": jnp.asarray(rng.rand(nimg, 49, 3).astype(np.float32)),
        "kp_3d": jnp.asarray(rng.rand(nimg, 49, 4).astype(np.float32)),
        "theta": jnp.asarray(rng.rand(nimg, 85).astype(np.float32)),
        "w_smpl": jnp.ones((nimg,), np.float32),
    }
    sample = (img["image"][:1, None] if vid is None
              else vid["images"][:1, :2])
    state = init_train_state(model, tx, sample, smpl, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, smpl, LossWeights(),
                           has_batch_stats=bool(state.batch_stats),
                           donate=args.donate)

    if args.learn:
        _run_learning_soak(args, step, state, smpl, n2d, n3d, nimg, T, res)
        return

    # print EVERY kernel gate so an A/B log header can never claim defaults
    # while a non-default kernel was active
    knobs = {k: os.environ.get(k, "<default>") for k in (
        "MAED_FUSED_MLP", "MAED_FUSED_MLP_TRAIN", "MAED_FUSED_QKV",
        "MAED_FUSED_QKV_TRAIN", "MAED_FUSED_GATE", "MAED_FUSED_GN",
        "MAED_FUSED_ATTENTION", "MAED_PALLAS_ATTENTION", "MAED_TEMPORAL_V2",
        "MAED_PALLAS_LN", "MAED_PALLAS_LBS")}
    print(f"device={jax.devices()[0]} dtype={dtype.__name__} remat={args.remat} "
          f"knobs={knobs}", file=sys.stderr)
    state, metrics = step(state, vid, img)
    _ = float(np.asarray(metrics["loss"]))

    if args.cost:
        # byte/FLOP budget of the whole compiled step (the eval-side budget
        # in doc/design.md pinned that forward as memory-bound; this is the
        # training analogue). cost_analysis keys: flops, bytes accessed.
        ca = step.lower(state, vid, img).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = ca.get("flops", 0.0)
        byts = ca.get("bytes accessed", 0.0)
        print(f"cost_analysis: {flops / 1e12:.2f} TFLOP "
              f"({flops / 156e12 * 1e3:.1f} ms at 156 TF/s), "
              f"{byts / 2**30:.1f} GiB accessed "
              f"({byts / 800e9 * 1e3:.1f} ms at 800 GB/s)")

    import contextlib

    prof = (jax.profiler.trace(args.trace) if args.trace
            else contextlib.nullcontext())
    with prof:
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, metrics = step(state, vid, img)
        _ = float(np.asarray(metrics["loss"]))
        dt = (time.perf_counter() - t0) / args.iters
    frames = (n2d + n3d) * T + nimg
    print(f"train step {dt * 1e3:.1f} ms -> {frames / dt:.0f} frames/s "
          f"(loss {float(np.asarray(metrics['loss'])):.3f})")


def _consistent_targets(rng, smpl, n, T):
    """Self-consistent (theta, kp_3d, kp_2d) for n*T frames: targets come
    from the SMPL forward itself (smooth pose tracks -> native 49-joint bank
    -> weak-perspective projection), so the loss composition is the real
    geometry, not noise, and zero loss is actually reachable."""
    import jax
    import jax.numpy as jnp

    from maed_tpu.ops.geometry import weak_perspective_projection
    from maed_tpu.ops.smpl import smpl_forward

    # smooth tracks: anchor poses + cosine ease (matches real motion stats)
    anchors = rng.randn(n, 4, 72).astype(np.float32) * 0.4
    t = np.linspace(0, 3, T)
    i0 = np.minimum(t.astype(int), 2)
    w = (0.5 - 0.5 * np.cos(np.pi * (t - i0)))[None, :, None].astype(np.float32)
    pose = (1 - w) * anchors[:, i0] + w * anchors[:, i0 + 1]  # (n, T, 72)
    shape = np.repeat(rng.randn(n, 1, 10).astype(np.float32) * 0.3, T, axis=1)
    cam = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (n, T, 1))

    out = jax.jit(lambda p, s: smpl_forward(
        smpl, s.reshape(-1, 10), pose_axis_angle=p.reshape(-1, 72))["joints"]
    )(jnp.asarray(pose), jnp.asarray(shape))
    joints = np.asarray(out).reshape(n, T, 49, 3)
    kp2d = np.asarray(weak_perspective_projection(
        jnp.asarray(joints), jnp.asarray(cam)))
    conf = np.ones((n, T, 49, 1), np.float32)
    return {
        "theta": np.concatenate([cam, pose, shape], axis=-1),
        "kp_3d": np.concatenate([joints, conf], axis=-1),
        "kp_2d": np.concatenate([kp2d, conf], axis=-1),
    }


def _learn_batch(seed, smpl, n2d, n3d, nimg, T, res):
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    if n2d + n3d == 0:
        # stage-1 composition has no video half — mirror the timing path's
        # `vid = None` convention (a zero-row dict means mean-of-empty NaNs)
        vid = None
    else:
        tgt3 = _consistent_targets(rng, smpl, n3d, T)
        tgt2 = _consistent_targets(rng, smpl, n2d, T)
        vid = {
            "images": jnp.asarray(rng.randn(n2d + n3d, T, res, res, 3).astype(np.float32)),
            "target_2d": {"kp_2d": jnp.asarray(tgt2["kp_2d"])},
            "target_3d": {
                "kp_2d": jnp.asarray(tgt3["kp_2d"]),
                "kp_3d": jnp.asarray(tgt3["kp_3d"]),
                "theta": jnp.asarray(tgt3["theta"]),
                "w_smpl": jnp.ones((n3d, T), np.float32),
            },
        }
    tgti = _consistent_targets(rng, smpl, nimg, 1)
    img = {
        "image": jnp.asarray(rng.randn(nimg, res, res, 3).astype(np.float32)),
        "kp_2d": jnp.asarray(tgti["kp_2d"][:, 0]),
        "kp_3d": jnp.asarray(tgti["kp_3d"][:, 0]),
        "theta": jnp.asarray(tgti["theta"][:, 0]),
        "w_smpl": jnp.ones((nimg,), np.float32),
    }
    return vid, img


def _run_learning_soak(args, step, state, smpl, n2d, n3d, nimg, T, res):
    """N real train steps over a fixed batch set; loss trajectory to JSON."""
    import json

    batches = [_learn_batch(1000 + k, smpl, n2d, n3d, nimg, T, res)
               for k in range(args.n_batches)]
    print(f"[learn] {args.learn} steps over {args.n_batches} fixed batches, "
          f"dtype={args.dtype} donate={args.donate}", file=sys.stderr)
    losses = []  # device scalars; fetched once at the end (no per-step sync)
    t0 = time.perf_counter()
    for i in range(args.learn):
        vid, img = batches[i % len(batches)]
        state, metrics = step(state, vid, img)
        losses.append(metrics["loss"])
        if (i + 1) % 50 == 0:
            print(f"[learn] step {i + 1}: loss "
                  f"{float(np.asarray(losses[-1])):.4f}", file=sys.stderr)
    losses = [float(np.asarray(l)) for l in losses]
    dt = time.perf_counter() - t0

    k = max(1, args.learn // 10)
    head, tail = float(np.mean(losses[:k])), float(np.mean(losses[-k:]))
    result = {
        "dtype": args.dtype, "steps": args.learn, "n_batches": args.n_batches,
        "donate": args.donate, "head_mean": head, "tail_mean": tail,
        "ratio": tail / head, "wall_s": dt, "losses": losses,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f)
    print(f"[learn] loss {head:.4f} -> {tail:.4f} "
          f"(ratio {tail / head:.3f}) in {dt:.0f}s")
    if args.smoke:
        print("[learn] smoke mode: wiring OK, skipping the sustained-"
              "decrease assert")
        return
    assert tail < 0.8 * head, (
        f"no sustained learning at flagship scale: first-decile mean {head:.4f}"
        f" -> last-decile mean {tail:.4f} (need < 0.8x)")
    print("[learn] PASS — sustained loss decrease at flagship scale")


if __name__ == "__main__":
    main()
