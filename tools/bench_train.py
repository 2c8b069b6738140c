"""Benchmark the full train step on the real chip.

Default composition mirrors the reference's per-GPU stage-2 recipe
(train.py / configs/config_stage2.yaml): 3 2D-video + 4 3D-video clips of
16 frames plus 7 images per step — both forwards, weighted loss, backward,
Adam update in one executable. --stage1 switches to the stage-1 recipe
(configs/config_stage1.yaml: image-only, resnet50 'cnn' encoder,
BATCH_SIZE_IMG=128). Prints ms/step and frames/s.

Usage: python tools/bench_train.py [--stage1] [--remat] [--dtype bf16|f32]
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
    ap.add_argument("--trace", default="",
                    help="capture a jax.profiler trace of the timed loop to "
                    "this dir (feed to tools/trace_ops.py for the per-op "
                    "device-time rollup)")
    args = ap.parse_args()

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
    if args.stage1:
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
    n2d, n3d, nimg, T = 3, 4, 7, 16
    if args.stage1:
        n2d, n3d, nimg = 0, 0, 128  # BATCH_SIZE_IMG, config_stage1.yaml
    vid = None if n2d + n3d == 0 else {
        "images": jnp.asarray(rng.randn(n2d + n3d, T, 224, 224, 3).astype(np.float32)),
        "target_2d": {"kp_2d": jnp.asarray(rng.rand(n2d, T, 49, 3).astype(np.float32))},
        "target_3d": {
            "kp_2d": jnp.asarray(rng.rand(n3d, T, 49, 3).astype(np.float32)),
            "kp_3d": jnp.asarray(rng.rand(n3d, T, 49, 4).astype(np.float32)),
            "theta": jnp.asarray(rng.rand(n3d, T, 85).astype(np.float32)),
            "w_smpl": jnp.ones((n3d, T), np.float32),
        },
    }
    img = {
        "image": jnp.asarray(rng.randn(nimg, 224, 224, 3).astype(np.float32)),
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


if __name__ == "__main__":
    main()
