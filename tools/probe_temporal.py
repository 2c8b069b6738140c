"""Microbench the temporal-attention branch at the flagship shape.

Compares XLA's einsum formulation against the head-pair pallas kernel
(ops/st_attention.py::temporal_attention_fused) across nb stacking factors,
isolated from the rest of the model so each variant is a ~1 min compile
instead of a 15 min full-model build.

Usage: python tools/probe_temporal.py [--iters 50]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--chain", type=int, default=6,
                    help="apply the branch N times back-to-back (one jit), "
                    "mirroring the 6-block model")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from maed_tpu.ops import st_attention as st

    B, T, N, h, d = 8, 16, 197, 12, 64
    BT = B * T
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(
        rng.randn(BT, N, 3, h, d).astype(np.float32), jnp.bfloat16)
    scale = d ** -0.5

    def bench(name, fn):
        f = jax.jit(fn)
        out = f(qkv)
        _ = np.asarray(out[0, 0, :4])  # sync through the tunnel
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(qkv)
        _ = np.asarray(out[0, 0, :4])
        dt = (time.perf_counter() - t0) / args.iters / args.chain * 1e3
        print(f"{name:28s} {dt:7.3f} ms/branch")
        return out, dt

    def chain(branch):
        def run(x):
            y = x
            for _ in range(args.chain):
                o = branch(y)
                # feed the output back through a cheap mix so XLA cannot
                # collapse the chain; keeps qkv shape
                y = y + o.reshape(BT, N, 1, h, d) * 1e-3
            return o
        return run

    ref, t_ref = bench("xla einsum (btc)",
                       chain(lambda q: st.temporal_reference_btc(q, T, scale)))

    for nb in (4, 8, 16):
        fn = chain(functools.partial(st._temporal_v2_pallas,
                                     seqlen=T, scale=scale, nb=nb))
        try:
            out, dt = bench(f"v2 head-pair nb={nb}", fn)
            err = float(jnp.max(jnp.abs(
                out.astype(jnp.float32) - ref.astype(jnp.float32))))
            print(f"{'':28s} max|err| vs einsum = {err:.4f}")
        except Exception as e:  # noqa: BLE001
            print(f"v2 nb={nb} FAILED: {str(e)[:160]}")

    # v1 (head-leading output) for the record
    def v1(q):
        out = st._temporal_pallas(q, T, scale)  # (h, BT, N, d)
        return jnp.transpose(out, (1, 2, 0, 3)).reshape(BT, N, h * d)

    try:
        out, dt = bench("v1 + transpose", chain(v1))
        err = float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - ref.astype(jnp.float32))))
        print(f"{'':28s} max|err| vs einsum = {err:.4f}")
    except Exception as e:  # noqa: BLE001
        print(f"v1 FAILED: {str(e)[:160]}")


if __name__ == "__main__":
    main()
