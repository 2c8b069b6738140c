"""Profiling hooks: jax.profiler traces + async-aware section timing.

The reference's only tracing was wall-clock timers in the tqdm bar
(SURVEY.md §5); here the trainer can capture real device traces: set
MAED_PROFILE_DIR=/path (and optionally MAED_PROFILE_STEPS=N) to trace the
first N train steps of the run, viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import os


def profile_dir() -> str | None:
    return os.environ.get("MAED_PROFILE_DIR") or None


def profile_steps() -> int:
    return int(os.environ.get("MAED_PROFILE_STEPS", "5"))


@contextlib.contextmanager
def maybe_trace(step: int):
    """Trace device activity for the configured window of steps."""
    import jax

    d = profile_dir()
    if d and step == 0:
        jax.profiler.start_trace(d)
    try:
        yield
    finally:
        if d and step == profile_steps() - 1:
            jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in a device trace (no-op cost when not tracing)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
