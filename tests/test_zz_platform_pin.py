"""Suite-wide platform sentinel. The zz_ prefix makes this file collect and
run LAST, so it observes the state every other test left behind.

Round-4 incident this guards against: the image environment exports
JAX_PLATFORMS=axon, and conftest.py used os.environ.setdefault — a no-op —
so the first collection-time import of a module that calls
honor_env_platform() (tests import demo.py, tools/accept_synthetic.py, ...)
re-read the env var and flipped the LIVE pytest process onto the real TPU
tunnel before any backend initialized. Every test then ran over the tunnel:
the 8-device mesh tests failed (one real chip), the jax.export
platforms=("cpu",) tests failed, and everything else quietly "passed" on
hardware the suite never meant to touch. conftest.py now FORCES the env var;
these asserts fail loudly if any future change reintroduces the leak.
"""

import os

import jax


def test_suite_never_left_the_cpu_backend():
    assert os.environ.get("JAX_PLATFORMS") == "cpu"
    assert jax.config.jax_platforms == "cpu"
    assert jax.default_backend() == "cpu"
    assert all(d.platform == "cpu" for d in jax.devices())


def test_honor_env_platform_repins_cpu_in_process():
    """The in-process flip vector itself: with the env var forced by
    conftest, honor_env_platform() must (re)pin cpu, not the image's
    axon default."""
    from maed_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    assert jax.config.jax_platforms == "cpu"
    assert jax.default_backend() == "cpu"


def test_virtual_mesh_still_has_eight_devices():
    """The force-host-device-count flag survived the whole suite: sharding
    tests that ran earlier really had the 8-device CPU mesh they claim."""
    assert len(jax.devices()) == 8
