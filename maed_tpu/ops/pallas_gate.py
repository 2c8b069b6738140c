"""Global pallas kill-switch for SPMD meshes.

pallas_call has no GSPMD partitioning rule: inside a jit that is sharded
over a >1-device mesh it either fails to partition or forces a full
all-gather of its operands per call (advisor finding, round 2). Until the
kernels are wrapped in shard_map and validated on real multi-chip hardware,
every pallas gate consults this module and stands down when the process has
configured a multi-device mesh. Single-chip behaviour (the benchmarked
path) is unchanged.

Callers that build a mesh (train.py, Trainer, Evaluator, dryrun) register
its device count here BEFORE the first trace; jit caches are keyed by the
code path taken, so the flag must not flip between traces of the same
executable — hence a process-wide latch rather than a context manager.
"""

from __future__ import annotations

_mesh_devices = 1


def set_mesh_devices(n: int) -> None:
    """Record the size of the mesh the model will be jitted over."""
    global _mesh_devices
    _mesh_devices = max(int(n), 1)


def register_mesh(mesh) -> None:
    """Convenience: register a jax.sharding.Mesh (or None)."""
    if mesh is not None:
        set_mesh_devices(mesh.size)


def spmd_active() -> bool:
    """True when pallas kernels must stand down (mesh spans >1 device)."""
    return _mesh_devices > 1
