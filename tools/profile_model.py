"""Decompose the flagship eval forward into component timings on the real
chip (or CPU). Mirrors bench.py's config: bf16, standardize_ws=False,
batch 8 x 16 x 224 x 224.

Usage: python tools/profile_model.py [--parts stem,blocks,decoder,model]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


from maed_tpu.utils.timing import timeit  # tunnel-safe (fetch-synced)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default="model,stem,tokens,block,decoder")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bf16")
    args = ap.parse_args()
    parts = set(args.parts.split(","))

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import flax.linen as nn

    from maed_tpu.models import MAED
    from maed_tpu.models.resnetv2 import ResNetV2
    from maed_tpu.models.vit import Block
    from maed_tpu.utils.checkpoint import fold_weight_standardization
    from maed_tpu.utils.smpl_io import find_smpl_model

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    B, T = args.batch, 16
    BT = B * T
    rng = np.random.RandomState(0)
    print(f"device={jax.devices()[0]} BT={BT} dtype={dtype.__name__}")

    results = {}

    if "model" in parts:
        model = MAED(encoder="ste", num_blocks=6, num_heads=12, st_mode="parallel",
                     decoder="ktd", hidden_dim=1024, standardize_ws=False, dtype=dtype)
        smpl = find_smpl_model()
        x = jnp.asarray(rng.randn(B, T, 224, 224, 3).astype(np.float32))
        J_reg = jnp.asarray(rng.rand(14, smpl.v_template.shape[0]).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x[:1, :2], smpl)
        variables = {"params": fold_weight_standardization(variables["params"])}
        fwd = jax.jit(lambda v, im: model.apply(v, im, smpl, J_regressor=J_reg))
        results["full_model"] = timeit(fwd, (variables, x))

    if "stem" in parts:
        stem = ResNetV2(layers=(3, 4, 9), preact=False, standardize=False, dtype=dtype)
        xf = jnp.asarray(rng.randn(BT, 224, 224, 3).astype(np.float32))
        sv = stem.init(jax.random.PRNGKey(0), xf[:2])
        f = jax.jit(lambda v, im: stem.apply(v, im))
        results["stem_full"] = timeit(f, (sv, xf))

        # per-stage: stem conv+pool, then each stage on its input shape
        from maed_tpu.models.resnetv2 import GroupNormAct, ResNetStage, StdConv, max_pool_same

        class StemOnly(nn.Module):
            @nn.compact
            def __call__(self, x):
                y = StdConv(64, (7, 7), (2, 2), standardize=False, dtype=dtype,
                            name="stem_conv")(x)
                y = GroupNormAct(dtype=dtype, name="stem_norm")(y)
                return max_pool_same(y, 3, 2)

        so = StemOnly()
        sov = so.init(jax.random.PRNGKey(0), xf[:2])
        f = jax.jit(lambda v, im: so.apply(v, im))
        results["stem_conv_pool"] = timeit(f, (sov, xf))

        stage_shapes = [(64, 56, 256, 3, 1), (256, 56, 512, 4, 2), (512, 28, 1024, 9, 2)]
        for i, (cin, hw, cout, depth, stride) in enumerate(stage_shapes):
            st = ResNetStage(out_chs=cout, depth=depth, stride=stride, preact=False,
                             standardize=False, dtype=dtype)
            xi = jnp.asarray(rng.randn(BT, hw, hw, cin).astype(np.float32)).astype(dtype)
            stv = st.init(jax.random.PRNGKey(0), xi[:2])
            f = jax.jit(lambda v, im, st=st: st.apply(v, im))
            results[f"stage{i}"] = timeit(f, (stv, xi))

    if "block" in parts:
        tokens = jnp.asarray(rng.randn(BT, 197, 768).astype(np.float32)).astype(dtype)
        blk = Block(768, 12, st_mode="parallel", dtype=dtype)
        bv = blk.init(jax.random.PRNGKey(0), tokens, 16, True)
        f = jax.jit(lambda v, t: blk.apply(v, t, 16, True))
        results["block_parallel_x1"] = timeit(f, (bv, tokens))

        # 6 chained blocks (what the model runs)
        def six(v, t):
            for _ in range(6):
                t = blk.apply(v, t, 16, True)
            return t
        f = jax.jit(six)
        results["block_parallel_x6"] = timeit(f, (bv, tokens))

        # pieces
        from maed_tpu.models.vit import Mlp, StAttention
        ln = nn.LayerNorm(epsilon=1e-6, dtype=dtype)
        lv = ln.init(jax.random.PRNGKey(0), tokens)
        f = jax.jit(lambda v, t: ln.apply(v, t))
        results["layernorm_x1"] = timeit(f, (lv, tokens))

        att = StAttention(768, 12, st_mode="parallel", dtype=dtype)
        av = att.init(jax.random.PRNGKey(0), tokens, 16, True)
        f = jax.jit(lambda v, t: att.apply(v, t, 16, True))
        results["attn_parallel"] = timeit(f, (av, tokens))

        att_s = StAttention(768, 12, st_mode="vanilla", dtype=dtype)
        asv = att_s.init(jax.random.PRNGKey(0), tokens, 16, True)
        f = jax.jit(lambda v, t: att_s.apply(v, t, 16, True))
        results["attn_spatial_only"] = timeit(f, (asv, tokens))

        mlp = Mlp(3072, 768, dtype=dtype)
        mv = mlp.init(jax.random.PRNGKey(0), tokens)
        f = jax.jit(lambda v, t: mlp.apply(v, t))
        results["mlp"] = timeit(f, (mv, tokens))

        # raw qkv matmul for reference
        w = jnp.asarray(rng.randn(768, 2304).astype(np.float32)).astype(dtype)
        f = jax.jit(lambda t, w: jnp.einsum("bnc,cd->bnd", t, w))
        results["qkv_matmul_raw"] = timeit(f, (tokens, w))

    if "decoder" in parts:
        from maed_tpu.models.ktd import KTD
        smpl = find_smpl_model()
        feat = jnp.asarray(rng.randn(BT, 768).astype(np.float32)).astype(dtype)
        ktd = KTD(hidden_dim=1024)
        kv = ktd.init(jax.random.PRNGKey(0), feat[:2], smpl)
        f = jax.jit(lambda v, x: ktd.apply(v, x, smpl))
        results["ktd_smpl"] = timeit(f, (kv, feat))

    tf = {"full_model": None}
    print()
    for k, v in results.items():
        print(f"{k:24s} {v * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
