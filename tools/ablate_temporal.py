"""Compare formulations of the per-token temporal attention (the slow branch
of parallel st_mode): 6 chained applications, fetch-synced timing.

Usage: python tools/ablate_temporal.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.ablate_block import _sync, timeit


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    dtype = jnp.bfloat16
    BT, N, C, h, T = 128, 197, 768, 12, 16
    d = C // h
    B = BT // T
    scale = d ** -0.5
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(BT, N, h, d).astype(np.float32)).astype(dtype)
    k = jnp.asarray(rng.randn(BT, N, h, d).astype(np.float32)).astype(dtype)
    v = jnp.asarray(rng.randn(BT, N, h, d).astype(np.float32)).astype(dtype)

    def current(q, k, v):
        tt = lambda a: a.reshape(B, T, N, h, d)
        lg = jnp.einsum("bqnhd,bknhd->bnhqk", tt(q), tt(k)) * scale
        p = jax.nn.softmax(lg.astype(jnp.float32), -1).astype(dtype)
        return jnp.einsum("bnhqk,bknhd->bqnhd", p, tt(v)).reshape(BT, N, h * d)

    def pretrans(q, k, v):
        # one explicit relayout to batch-leading (B, N, h, T, d)
        tt = lambda a: jnp.transpose(a.reshape(B, T, N, h, d), (0, 2, 3, 1, 4))
        qt, kt, vt = tt(q), tt(k), tt(v)
        lg = jnp.einsum("bnhqd,bnhkd->bnhqk", qt, kt) * scale
        p = jax.nn.softmax(lg.astype(jnp.float32), -1).astype(dtype)
        o = jnp.einsum("bnhqk,bnhkd->bnhqd", p, vt)
        return jnp.transpose(o, (0, 3, 1, 2, 4)).reshape(BT, N, h * d)

    def vpu(q, k, v):
        # broadcast-multiply-reduce, no MXU: logits (B,T,T,N,h)
        tt = lambda a: a.reshape(B, T, N, h, d)
        qt, kt, vt = tt(q), tt(k), tt(v)
        lg = (qt[:, :, None] * kt[:, None]).sum(-1) * scale  # (B,T,T,N,h)
        p = jax.nn.softmax(lg.astype(jnp.float32), 2).astype(dtype)
        o = (p[..., None] * vt[:, None]).sum(2)  # (B,T,N,h,d)
        return o.reshape(BT, N, h * d)

    variants = {"current": current, "pretrans": pretrans, "vpu": vpu}
    print(f"device={jax.devices()[0]}")
    ref = None
    for name, fn in variants.items():
        def chain(q, k, v, fn=fn):
            x = q
            for _ in range(6):
                x = fn(x, k, v).reshape(BT, N, h, d)
            return x
        f = jax.jit(chain)
        out = f(q, k, v)
        a = np.asarray(out.astype(jnp.float32))
        if ref is None:
            ref = a
        else:
            err = np.abs(a - ref).max()
            assert err < 0.15, (name, err)
        dt = timeit(f, (q, k, v))
        print(f"{name:12s} {dt * 1e3:8.2f} ms   ({dt * 1e3 / 6:5.2f}/branch)")


if __name__ == "__main__":
    main()
