"""AOT export of the eval forward for production serving.

Serializes the jitted MAED inference step (images -> SMPL predictions) to a
self-contained StableHLO artifact via `jax.export`. A serving host then
deserializes and calls it with ZERO Python model code, flax, or checkpoint
plumbing — the params are baked in as constants, weight standardization is
pre-folded. Exported from a TPU-backed process, the executable is exactly
the one `bench.py` measures (165 clips/s/chip on v5e). Cross-platform
lowering also lets a CPU dev box build a TPU artifact (`--platform tpu`),
with one caveat: the pallas-fused kernels gate on the BUILD process's
backend, so a CPU-built TPU artifact contains the plain-XLA paths —
functionally identical, a few percent slower (export warns when this
happens; build on a TPU host for the benchmarked executable).

The reference has no serving story (its eval path re-instantiates the torch
model from source every run); this is the TPU-native deployment analogue of
its `eval.py --checkpoint` load path (/root/reference/eval.py:26-35).

CLI:
    python -m maed_tpu.utils.export --cfg configs/config_stage2.yaml \
        --checkpoint ckpt.pth.tar --batch 8 --out maed_serve.bin \
        [--platform tpu|cpu]
Serving:
    from maed_tpu.utils.export import load_exported
    fwd = load_exported(open("maed_serve.bin", "rb").read())
    preds = fwd(images)          # (B, T, H, W, 3) float32, same normalize
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


def export_eval_forward(
    model,
    variables: dict,
    smpl_model,
    batch_size: int,
    seqlen: int,
    height: int = 224,
    width: int = 224,
    J_regressor: Optional[np.ndarray] = None,
    platforms: Sequence[str] = ("tpu",),
) -> bytes:
    """Serialize the eval forward (params baked in) to StableHLO bytes.

    `variables` should hold already-folded params (see
    `utils.checkpoint.fold_weight_standardization`) so the exported graph
    runs the standardize_ws=False fast path. One artifact per (batch,
    seqlen) shape — TPU-native static shapes; export several batch sizes
    for a bucketed server.
    """
    if "tpu" in platforms and jax.default_backend() != "tpu":
        import sys

        print("WARNING: exporting a TPU artifact from a non-TPU process — "
              "the pallas-fused kernels gate on the build backend and will "
              "be lowered as their plain-XLA equivalents (correct, slightly "
              "slower). Build on a TPU host for the benchmarked executable.",
              file=sys.stderr)
    jreg = None if J_regressor is None else jnp.asarray(J_regressor)

    @functools.partial(jax.jit)
    def fwd(images):
        return model.apply(variables, images, smpl_model, J_regressor=jreg,
                           deterministic=True)

    spec = jax.ShapeDtypeStruct((batch_size, seqlen, height, width, 3),
                                jnp.float32)
    exported = jax_export.export(fwd, platforms=list(platforms))(spec)
    return bytes(exported.serialize())


def load_exported(blob: bytes):
    """Deserialize an exported artifact into a plain callable.

    The callable runs on whatever devices the current process sees
    (jit-dispatched via `Exported.call`); inputs must match the exported
    (batch, seqlen, H, W, 3) f32 spec exactly.
    """
    exported = jax_export.deserialize(blob)

    def fwd(images):
        return exported.call(jnp.asarray(images, jnp.float32))

    fwd.in_avals = exported.in_avals
    fwd.platforms = exported.platforms
    return fwd


def main():
    import argparse

    from maed_tpu.utils.platform import honor_env_platform

    honor_env_platform()

    from maed_tpu.core.builder import build_eval_model
    from maed_tpu.core.config import get_cfg_defaults, update_cfg
    from maed_tpu.core.evaluate import load_eval_regressor

    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=None)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--platform", default="tpu", choices=("tpu", "cpu"))
    ap.add_argument("--eval_ds", default="3dpw",
                    help="bakes this dataset's eval regressor into the "
                    "artifact ('' for the model's native joint bank)")
    ap.add_argument("--allow_synthetic_smpl", action="store_true")
    args = ap.parse_args()

    cfg = update_cfg(args.cfg) if args.cfg else get_cfg_defaults()
    model, variables, smpl = build_eval_model(
        cfg, checkpoint=args.checkpoint,
        allow_synthetic_smpl=args.allow_synthetic_smpl,
    )
    d = cfg.DATASET

    jreg = load_eval_regressor(args.eval_ds) if args.eval_ds else None
    blob = export_eval_forward(
        model, variables, smpl, args.batch, cfg.EVAL.SEQLEN,
        d.HEIGHT, d.WIDTH, J_regressor=jreg, platforms=(args.platform,),
    )
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out}: {len(blob) / 2**20:.1f} MiB, "
          f"platform={args.platform}, "
          f"spec=({args.batch}, {cfg.EVAL.SEQLEN}, {d.HEIGHT}, {d.WIDTH}, 3)")


if __name__ == "__main__":
    main()
