"""Tunnel-safe device timing helpers.

jax.block_until_ready can return before the dispatch queue drains over the
remote (axon) TPU tunnel; a 4-byte D2H fetch of a scalar from the LAST output
cannot, since device execution is serialized. Every benchmark in this repo
(bench.py, tools/profile_model.py, tools/ablate_*.py) syncs through here.
"""

from __future__ import annotations

import time


def fetch_sync(out):
    """Force completion of all queued device work; returns a host scalar."""
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, args, iters: int = 20, warmup: int = 2) -> float:
    """Mean seconds per call of fn(*args) over `iters`, fetch-synced."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    fetch_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch_sync(out)
    return (time.perf_counter() - t0) / iters
