"""In-jit ablation of the ViT block chain: time 6-block variants with pieces
removed to attribute the per-block cost (dispatch overhead cancels since every
variant is one jit of 6 blocks).

Usage: python tools/ablate_block.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


from maed_tpu.utils.timing import fetch_sync as _sync, timeit  # noqa: F401


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import flax.linen as nn
    import jax.numpy as jnp

    dtype = jnp.bfloat16
    BT, N, C, h, T = 128, 197, 768, 12, 16
    d = C // h
    B = BT // T
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(BT, N, C).astype(np.float32)).astype(dtype)

    kw = lambda n: dict(dtype=dtype, name=n)

    class Variant(nn.Module):
        mode: str = "full"

        @nn.compact
        def __call__(self, x):
            m = self.mode
            for i in range(6):
                y = x
                if "noln" not in m:
                    y = nn.LayerNorm(epsilon=1e-6, dtype=dtype, name=f"n1_{i}")(y)
                if "noattn" not in m:
                    qkv = nn.Dense(3 * C, dtype=dtype, name=f"qkv_{i}")(y)
                    qkv = qkv.reshape(BT, N, 3, h, d)
                    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
                    outs = []
                    if "pallast" in m:
                        from maed_tpu.ops.st_attention import temporal_attention

                        lg = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d ** -0.5)
                        p = jax.nn.softmax(lg.astype(jnp.float32), -1).astype(dtype)
                        ot = temporal_attention(qkv, T, d ** -0.5)  # (h,BT,N,d)
                        if "hb" in m:
                            # head-leading end-to-end: spatial out in hbqd,
                            # gate + proj consume (h, BT, N, d) directly
                            os_ = jnp.einsum("bhqk,bkhd->hbqd", p, v)
                            al = jnp.concatenate(
                                [os_.mean(2).transpose(1, 0, 2).reshape(BT, 1, C),
                                 ot.mean(2).transpose(1, 0, 2).reshape(BT, 1, C)], -1)
                            al = nn.Dense(2 * C, dtype=dtype, name=f"ts_{i}")(al)
                            al = jax.nn.softmax(al.reshape(BT, 1, C, 2), -1)
                            ah = jnp.transpose(
                                al.reshape(BT, h, d, 2), (3, 1, 0, 2))[:, :, :, None, :]
                            yh = os_ * ah[0] + ot * ah[1]  # (h, BT, N, d)
                            w = self.param(f"pw_{i}", nn.initializers.lecun_normal(),
                                           (C, C), jnp.float32)
                            y = jnp.einsum("hbnd,hdc->bnc", yh,
                                           w.reshape(h, d, C).astype(dtype))
                            x = x + y
                            # skip the common gate/proj tail below
                            outs = None
                        else:
                            outs = [jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(BT, N, C),
                                    jnp.transpose(ot, (1, 2, 0, 3)).reshape(BT, N, C)]
                    if "pallast" not in m and "nospatial" not in m:
                        lg = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d ** -0.5)
                        if "nosm" not in m:
                            p = jax.nn.softmax(lg.astype(jnp.float32), -1).astype(dtype)
                        else:
                            p = lg
                        outs.append(jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(BT, N, C))
                    if "pallast" not in m and "notemporal" not in m:
                        tt = lambda a: a.reshape(B, T, N, h, d)
                        lg = jnp.einsum("bqnhd,bknhd->bnhqk", tt(q), tt(k)) * (d ** -0.5)
                        if "nosm" not in m:
                            p = jax.nn.softmax(lg.astype(jnp.float32), -1).astype(dtype)
                        else:
                            p = lg
                        outs.append(
                            jnp.einsum("bnhqk,bknhd->bqnhd", p, tt(v)).reshape(BT, N, C)
                        )
                    if outs is not None:
                        if len(outs) == 2 and "nogate" not in m:
                            al = jnp.concatenate(
                                [o.mean(axis=1, keepdims=True) for o in outs], -1
                            )
                            al = nn.Dense(2 * C, dtype=dtype, name=f"ts_{i}")(al)
                            al = jax.nn.softmax(al.reshape(BT, 1, C, 2), -1)
                            y = outs[0] * al[..., 0] + outs[1] * al[..., 1]
                        else:
                            y = sum(outs) / len(outs)
                        y = nn.Dense(C, dtype=dtype, name=f"proj_{i}")(y)
                        x = x + y
                if "nomlp" not in m:
                    y = x
                    if "noln" not in m:
                        y = nn.LayerNorm(epsilon=1e-6, dtype=dtype, name=f"n2_{i}")(y)
                    y = nn.Dense(4 * C, dtype=dtype, name=f"fc1_{i}")(y)
                    y = nn.gelu(y, approximate=False)
                    y = nn.Dense(C, dtype=dtype, name=f"fc2_{i}")(y)
                    x = x + y
            return x

    modes = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "full", "noln", "nosm", "notemporal", "notemporal_nogate",
        "nospatial_nogate", "noattn", "nomlp", "noattn_nomlp",
    ]
    print(f"device={jax.devices()[0]} BT={BT} N={N} C={C}")
    for mode in modes:
        v = Variant(mode)
        params = v.init(jax.random.PRNGKey(0), x)
        f = jax.jit(lambda p, t, v=v: v.apply(p, t))
        dt = timeit(f, (params, x))
        print(f"{mode:24s} {dt * 1e3:8.2f} ms   ({dt * 1e3 / 6:5.2f}/block)")


if __name__ == "__main__":
    main()
