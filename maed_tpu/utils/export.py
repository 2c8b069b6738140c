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
    bake_params: bool = True,
    input_dtype: str = "f32",
):
    """Serialize the eval forward to StableHLO bytes.

    `variables` should hold already-folded params (see
    `utils.checkpoint.fold_weight_standardization`) so the exported graph
    runs the standardize_ws=False fast path. One artifact per (batch,
    seqlen) shape — TPU-native static shapes; export several batch sizes
    for a bucketed server.

    bake_params=True returns `bytes` with the params embedded as program
    constants (single-file artifact, call with just images). The flagship's
    ~300 MiB of constants can exceed program-size limits of remote-compile
    proxies, so bake_params=False exports the params as ARGUMENTS instead:
    returns (bytes, param_arrays_dict) where the dict maps flat '/'-joined
    leaf names to numpy arrays (no flax/pytree machinery needed server-side)
    and the callable takes (param_arrays_dict, images).
    """
    if "tpu" in platforms and jax.default_backend() != "tpu":
        import sys

        print("WARNING: exporting a TPU artifact from a non-TPU process — "
              "the pallas-fused kernels gate on the build backend and will "
              "be lowered as their plain-XLA equivalents (correct, slightly "
              "slower). Build on a TPU host for the benchmarked executable.",
              file=sys.stderr)
    jreg = None if J_regressor is None else jnp.asarray(J_regressor)
    # input_dtype='u8': the artifact takes RAW uint8 crops and normalizes
    # in-graph (DEVICE_PREPROC serving contract) — clients POST 1/4 the
    # bytes; 'f32' keeps the original pre-normalized contract
    img_spec = jax.ShapeDtypeStruct(
        (batch_size, seqlen, height, width, 3),
        jnp.uint8 if input_dtype in ("u8", "uint8") else jnp.float32)

    if bake_params:
        @functools.partial(jax.jit)
        def fwd(images):
            return model.apply(variables, images, smpl_model,
                               J_regressor=jreg, deterministic=True)

        exported = jax_export.export(fwd, platforms=list(platforms))(img_spec)
        return bytes(exported.serialize())

    # args-mode: a FLAT dict of leaves is the cross-host param container —
    # deterministic ordering, no flax pytree registration required to call
    flat = _flatten_variables(variables)

    @functools.partial(jax.jit)
    def fwd(flat_params, images):
        return model.apply(_unflatten_variables(flat_params, variables),
                           images, smpl_model, J_regressor=jreg,
                           deterministic=True)

    param_spec = {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
                  for k, v in flat.items()}
    exported = jax_export.export(fwd, platforms=list(platforms))(
        param_spec, img_spec)
    host_flat = {k: np.asarray(v) for k, v in flat.items()}
    return bytes(exported.serialize()), host_flat


def _flatten_variables(variables) -> dict:
    """Nested variables tree -> {'params/encoder/.../kernel': array} dict."""
    out = {}

    def visit(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                visit(f"{prefix}/{k}" if prefix else str(k), v)
        else:
            out[prefix] = node

    visit("", variables)
    return out


def _unflatten_variables(flat: dict, template: dict):
    """Inverse of _flatten_variables against the exporting tree's shape."""
    out = {}

    def build(prefix, node):
        if isinstance(node, dict):
            return {k: build(f"{prefix}/{k}" if prefix else str(k), v)
                    for k, v in node.items()}
        return flat[prefix]

    return {k: build(str(k), v) for k, v in template.items()}


def load_exported(blob: bytes):
    """Deserialize an exported artifact into a plain callable.

    The callable runs on whatever devices the current process sees
    (jit-dispatched via `Exported.call`). Baked artifacts are called as
    fwd(images); args-mode artifacts as fwd(flat_params_dict, images) with
    the dict returned by export (or np.load of the CLI's .params.npz).
    Inputs must match the exported specs exactly.
    """
    exported = jax_export.deserialize(blob)
    # the artifact's own image spec decides the cast (f32 legacy artifacts
    # and u8 DEVICE_PREPROC artifacts both load through this one entry)
    img_dtype = exported.in_avals[-1].dtype

    if len(exported.in_avals) == 1:
        def fwd(images):
            return exported.call(jnp.asarray(images, img_dtype))
    else:
        def fwd(flat_params, images):
            return exported.call(dict(flat_params),
                                 jnp.asarray(images, img_dtype))

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
    ap.add_argument("--batch", type=int, default=[8], nargs="+",
                    help="exported batch size(s); several -> one artifact "
                    "per size (<out> for the first, <out>.b<N> for the "
                    "rest) for serve.py's bucketed routing")
    ap.add_argument("--platform", default="tpu", choices=("tpu", "cpu"))
    ap.add_argument("--dtype", default="bf16", choices=("bf16", "f32"),
                    help="activation dtype baked into the artifact; bf16 is "
                    "the benchmarked serving config, f32 matches eval.py")
    ap.add_argument("--eval_ds", default="3dpw",
                    help="bakes this dataset's eval regressor into the "
                    "artifact ('' for the model's native joint bank)")
    ap.add_argument("--allow_synthetic_smpl", action="store_true")
    ap.add_argument("--input_dtype", default="u8", choices=("u8", "f32"),
                    help="image input contract: 'u8' (default) takes raw "
                    "uint8 crops and normalizes in-graph — clients ship 1/4 "
                    "the bytes (DATASET.DEVICE_PREPROC serving analogue); "
                    "'f32' keeps the pre-normalized legacy contract")
    ap.add_argument("--no_bake", action="store_true",
                    help="export params as arguments instead of program "
                    "constants: writes <out> (small program) + "
                    "<out>.params.npz; serve as fwd(np.load(npz), images). "
                    "Use when the baked program exceeds a compile-proxy "
                    "size limit")
    args = ap.parse_args()

    cfg = update_cfg(args.cfg) if args.cfg else get_cfg_defaults()
    model, variables, smpl = build_eval_model(
        cfg, checkpoint=args.checkpoint,
        allow_synthetic_smpl=args.allow_synthetic_smpl, dtype=args.dtype,
    )
    d = cfg.DATASET

    jreg = load_eval_regressor(args.eval_ds) if args.eval_ds else None
    for i, batch in enumerate(args.batch):
        out = args.out if i == 0 else f"{args.out}.b{batch}"
        result = export_eval_forward(
            model, variables, smpl, batch, cfg.EVAL.SEQLEN,
            d.HEIGHT, d.WIDTH, J_regressor=jreg, platforms=(args.platform,),
            bake_params=not args.no_bake, input_dtype=args.input_dtype,
        )
        extra = ""
        if args.no_bake:
            blob, flat = result
            if i == 0:  # params identical across buckets: one side-file
                np.savez(args.out + ".params.npz", **flat)
                extra = f" + {args.out}.params.npz"
        else:
            blob = result
        with open(out, "wb") as f:
            f.write(blob)
        print(f"wrote {out}: {len(blob) / 2**20:.1f} MiB{extra}, "
              f"platform={args.platform}, dtype={args.dtype}, "
              f"spec=({batch}, {cfg.EVAL.SEQLEN}, {d.HEIGHT}, {d.WIDTH}, 3)")


if __name__ == "__main__":
    main()
