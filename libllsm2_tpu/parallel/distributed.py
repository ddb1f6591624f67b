"""Multi-host initialization (SURVEY.md section 5 "Distributed
communication backend": the rebuild's scale-out crosses chips over ICI
within a slice and DCN across slices via jax.distributed -- no
hand-written backend).

Single-host runs need none of this; call initialize_multihost() once per
process before building meshes when launched across hosts (e.g. a v5e
multi-host pod slice or multi-slice DCN job).  Meshes built afterwards
span all connected processes' devices.
"""
from __future__ import annotations

import jax


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Wire this process into the cluster (idempotent).

    With no arguments, uses cluster auto-detection (TPU pods export the
    topology via the environment).  jax.distributed handles the rendezvous;
    all collectives thereafter ride ICI/DCN picked by XLA's GSPMD
    partitioner based on the mesh layout.
    """
    # idempotence WITHOUT touching the backend: jax.process_count() would
    # itself initialize XLA, after which jax.distributed.initialize()
    # refuses to run (measured; tests/test_multiprocess.py)
    try:
        from jax._src import distributed as _dist
        if _dist.global_state.client is not None:
            return  # already initialized
    except Exception:
        if jax.process_count() > 1:
            return
    if coordinator_address is not None:
        # explicit cluster spec: failures must propagate (a silently
        # single-process "cluster" would shred throughput and results)
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
        return
    try:
        jax.distributed.initialize()
    except (ValueError, RuntimeError):
        # single-process launch without cluster env: nothing to do
        pass


def global_mesh(frame_parallel: int = 1):
    """Mesh over ALL cluster devices (call after initialize_multihost)."""
    from .mesh import make_mesh
    return make_mesh(len(jax.devices()), frame_parallel=frame_parallel)
