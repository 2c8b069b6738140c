"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the platform env vars before jax initializes its backends, so this
module does it at import time (pytest imports conftest before test modules).
"""

import os
import sys

# HARD override, not setdefault: the image env exports JAX_PLATFORMS=axon.
# Several CLI/tool modules call honor_env_platform() at import time, and
# pytest imports every test module (and whatever they import — demo.py,
# tools/accept_synthetic.py, ...) during COLLECTION, before any backend is
# initialized. With the env var still saying "axon", the first such import
# flipped the live pytest process onto the real TPU tunnel: every test ran
# over the tunnel (slow), 8-device mesh tests failed (1 real chip), and
# jax.export platforms=("cpu",) tests failed. Forcing the env var makes
# every honor_env_platform() call re-pin cpu instead.
os.environ["JAX_PLATFORMS"] = "cpu"
# same reasoning for the compile cache: honor_env_platform() redirects the
# cache dir unless the env var pins it (utils/platform.py).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_test_cache")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and overrides
# JAX_PLATFORMS; pin the platform explicitly so tests really run on the
# virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Single-core VM: persistent compile cache makes repeated test runs bearable.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(autouse=True)
def _reset_pallas_spmd_latch():
    """Tests that build a mesh (dp-sharded Evaluator/Trainer) latch the
    process-wide pallas SPMD kill-switch (ops/pallas_gate); without a reset
    every later test sees the pallas gates forced off — an ordering
    contamination the production latch semantics (one mesh per process)
    never hit."""
    yield
    from maed_tpu.ops import pallas_gate

    pallas_gate.set_mesh_devices(1)
