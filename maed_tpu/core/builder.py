"""Build an inference-ready MAED from a config + checkpoint.

The single implementation of the eval-side load contract shared by
`eval.py` and `maed_tpu.utils.export` (parity target: the reference's model
construction + checkpoint load in /root/reference/eval.py:18-40): construct
the model from cfg, init the param/batch_stats trees, load an orbax dir or
a torch .pth(.tar) (converted on the fly), and fold weight standardization
into the kernels so inference runs the standardize_ws=False fast path.
"""

from __future__ import annotations

import jax
import numpy as np

from maed_tpu.models import MAED
from maed_tpu.utils.checkpoint import (
    fold_weight_standardization,
    load_checkpoint,
    load_eval_params,
)
from maed_tpu.utils.smpl_io import find_smpl_model


def load_any_checkpoint_params(path: str, params, batch_stats=None):
    """orbax dir or torch .pth(.tar) -> (param tree, batch_stats tree)."""
    if path.endswith((".pth", ".pth.tar", ".pt", ".tar")):
        from maed_tpu.utils.torch_convert import convert_torch_checkpoint

        conv = convert_torch_checkpoint(path, params)
        params = load_eval_params(params, conv["params"])
        if conv["batch_stats"]:
            batch_stats = (
                load_eval_params(batch_stats, conv["batch_stats"])
                if batch_stats else conv["batch_stats"]
            )
        return params, batch_stats
    ckpt = load_checkpoint(path)
    src = ckpt["params"] if "params" in ckpt else ckpt
    params = load_eval_params(params, src)
    if isinstance(ckpt, dict) and ckpt.get("batch_stats"):
        batch_stats = ckpt["batch_stats"]
    return params, batch_stats


def build_eval_model(cfg, checkpoint: str = "",
                     allow_synthetic_smpl: bool = False, dtype=None):
    """(model, variables, smpl_model) ready for `model.apply(variables, ...)`.

    StdConv weight standardization is folded into the loaded kernels, so
    the returned model runs the standardize_ws=False fast path (the config
    bench.py measures; identical outputs, ~20% faster hybrid stem).
    `dtype` sets the activation dtype ('bf16'/'f32' strings or a jnp dtype);
    default f32 matches the reference eval protocol, bf16 is the serving/
    bench configuration (~2x the throughput on TPU, metric drift < 0.1 mm).
    """
    import jax.numpy as jnp

    if isinstance(dtype, str):
        dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[dtype]
    enc, dec = cfg.MODEL.ENCODER, cfg.MODEL.DECODER
    is_ste = enc.BACKBONE.lower() == "ste"
    model = MAED(
        encoder=enc.BACKBONE, num_blocks=enc.NUM_BLOCKS,
        num_heads=enc.NUM_HEADS, st_mode=enc.SPA_TEMP_MODE,
        decoder=dec.BACKBONE, hidden_dim=dec.HIDDEN_DIM,
        standardize_ws=not is_ste,
        **({"dtype": dtype} if dtype is not None else {}),
    )
    smpl = find_smpl_model(allow_synthetic=allow_synthetic_smpl)

    d = cfg.DATASET
    sample = np.zeros((1, cfg.EVAL.SEQLEN, d.HEIGHT, d.WIDTH, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), sample, smpl)
    params = variables["params"]
    batch_stats = variables.get("batch_stats") or None
    if checkpoint:
        params, batch_stats = load_any_checkpoint_params(
            checkpoint, params, batch_stats)
    if is_ste:
        params = fold_weight_standardization(params)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return model, variables, smpl
