"""Multi-host (multi-process) initialization.

The reference is strictly single-GPU (SURVEY.md §2.3).  TPU-native scaling
design: within a slice, the 1-D data mesh rides ICI; across hosts, the SAME
mesh spans all processes' devices and jax.distributed wires the DCN control
plane.  Gradient psums stay hierarchical (ICI first) because the mesh axis
is laid out over jax.devices() in process order.
"""

from __future__ import annotations

import os

import jax

from .mesh import make_mesh


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Initialize the multi-process runtime.

    With no arguments, relies on the TPU environment's auto-detection
    (GKE/GCE metadata); explicit values support manual bring-up.  Safe to
    call twice (no-op) or single-process (no-op unless explicitly
    configured).

    MUST run before any jax backend use — even jax.process_count() would
    initialize the backend and foreclose distributed startup, so the
    already-initialized check reads the distributed client state directly.
    """
    from jax._src import distributed as _dist
    if _dist.global_state.client is not None:
        return  # already initialized
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR")
    if explicit or num_processes is not None:
        jax.distributed.initialize(
            coordinator_address=explicit,
            num_processes=num_processes, process_id=process_id)
    else:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process / unsupported platform: stay local


def global_batch_mesh(axis_name: str = "data"):
    """1-D mesh over ALL devices of ALL processes (process-major order, so
    intra-host segments of the batch axis communicate over ICI)."""
    return make_mesh(jax.devices(), axis_name=axis_name)


def process_local_batch_slice(global_batch: int) -> tuple[int, int]:
    """(start, size) of this process's slice of a globally sharded batch.

    The mesh lays the batch axis over jax.devices() (process-major), so
    process p owns rows [p*per, (p+1)*per) of every global batch — the
    contract BatchLoader(process_slice=...) and place_batch's
    make_array_from_process_local_data path both rely on."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} processes")
    per = global_batch // n
    return jax.process_index() * per, per
