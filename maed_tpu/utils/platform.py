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
