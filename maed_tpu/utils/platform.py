"""Platform selection that honors the JAX_PLATFORMS env var.

This image's sitecustomize force-registers the axon TPU backend and pins
jax.config.jax_platforms, which both ignores the user's JAX_PLATFORMS env var
and makes every process fail when the chip is unavailable. Call
honor_env_platform() before any backend use to restore the standard JAX
behavior (explicit env var wins; unset leaves the image default).
"""

from __future__ import annotations

import os


def honor_env_platform():
    import jax

    env = os.environ.get("JAX_PLATFORMS")
    if env is not None and env.strip():
        try:
            jax.config.update("jax_platforms", env.strip())
        except Exception:
            pass
    enable_persistent_cache()


def enable_persistent_cache(path: str | None = None):
    """Point every entry point at a persistent compilation cache.

    Full-model compiles are minutes (10-20 min for the flagship on TPU over
    the remote-compile tunnel, similar on a small CPU host) — without a disk
    cache every CLI invocation pays that again. Honors an explicit
    JAX_COMPILATION_CACHE_DIR; defaults to ~/.cache/jax_tpu_cache — the SAME
    directory bench.py and the tools/ scripts pin, so a bench-warmed compile
    is a hit for eval.py/train.py and vice versa (a split cache repays the
    full-model compile once per entry point). MAED_NO_CACHE=1 opts out
    (e.g. cold-compile benchmarking)."""
    import jax

    if os.environ.get("MAED_NO_CACHE") == "1":
        return
    cache = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
             or os.path.expanduser("~/.cache/jax_tpu_cache"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
