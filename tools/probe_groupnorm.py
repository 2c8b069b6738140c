"""Microbench: fused GroupNorm pallas kernel vs the XLA formulation at the
exact hybrid-stem shapes of the flagship eval step (batch 128 frames, 224px).

Each variant is applied `--chain` times back-to-back inside ONE jit (with a
cheap feedback mix so XLA cannot collapse the chain) — per-dispatch tunnel
overhead (~0.9 ms) otherwise swamps sub-ms kernels.

Usage: python tools/probe_groupnorm.py  (on the real TPU)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# (shape, relu, residual, count) — every GN site in the ResNetV2 (3,4,9) stem
# at batch 8 clips x 16 frames; count = instances per eval forward.
SHAPES = [
    ((128, 112, 112, 64), True, False, 1),    # stem_norm
    ((128, 56, 56, 64), True, False, 6),      # stage0 mid norms
    ((128, 56, 56, 256), True, True, 3),      # stage0 norm3+res+relu
    ((128, 28, 28, 128), True, False, 8),     # stage1 mid
    ((128, 28, 28, 512), True, True, 4),      # stage1 norm3
    ((128, 14, 14, 256), True, False, 18),    # stage2 mid
    ((128, 14, 14, 1024), True, True, 9),     # stage2 norm3
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--chain", type=int, default=8)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from maed_tpu.ops import groupnorm as gn

    print("device:", jax.devices()[0].device_kind)
    rng = np.random.RandomState(0)
    dtype = jnp.bfloat16

    def bench(f, x, s, b, res):
        jf = jax.jit(f)
        out = jf(x, s, b, res)
        _ = np.asarray(out.ravel()[:4])  # sync through the tunnel
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jf(x, s, b, res)
        _ = np.asarray(out.ravel()[:4])
        return (time.perf_counter() - t0) / args.iters / args.chain * 1e3, out

    def chain(one):
        def run(x, s, b, res):
            y = x
            for _ in range(args.chain):
                o = one(y, s, b, res)
                y = x + o * jnp.asarray(1e-3, x.dtype)
            return o
        return run

    tot_xla = tot_pal = 0.0
    for shape, relu, has_res, count in SHAPES:
        C = shape[-1]
        x = jax.device_put(jnp.asarray(rng.randn(*shape), dtype))
        s = jax.device_put(jnp.asarray(rng.randn(C), jnp.float32))
        b = jax.device_put(jnp.asarray(rng.randn(C), jnp.float32))
        res = jax.device_put(jnp.asarray(rng.randn(*shape), dtype)) if has_res else None

        f_ref = chain(lambda a, sc, bi, r: gn.groupnorm_reference(a, sc, bi, 32, 1e-5, relu, r))
        f_pal = chain(lambda a, sc, bi, r: gn.fused_groupnorm(a, sc, bi, 32, 1e-5, relu, r))
        try:
            t_pal, o_pal = bench(f_pal, x, s, b, res)
        except Exception as e:  # lowering wall — report and continue
            print(f"{str(shape):24s} pallas FAILED: {str(e)[:140]}")
            continue
        t_ref, o_ref = bench(f_ref, x, s, b, res)
        err = float(jnp.max(jnp.abs(
            o_ref.astype(jnp.float32) - o_pal.astype(jnp.float32))))
        print(f"{str(shape):24s} x{count:2d}  xla {t_ref:7.3f} ms  pallas {t_pal:7.3f} ms"
              f"  (err {err:.4f})")
        tot_xla += t_ref * count
        tot_pal += t_pal * count
    print(f"step totals (sum over counts): xla {tot_xla:.3f} ms  pallas {tot_pal:.3f} ms")


if __name__ == "__main__":
    main()
