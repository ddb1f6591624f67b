"""Device-mesh and sharding helpers.

The reference has no parallelism at all (single-threaded C; SURVEY.md
section 2 "Parallelism & distributed-communication components").  Scale-out
is therefore a new first-class component of this rebuild, built the TPU way:
a jax.sharding.Mesh with a "batch" axis (data parallelism over utterances,
BASELINE config 5) and a "frame" axis (sequence parallelism over the frame
axis of very long utterances); XLA inserts all collectives.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"
FRAME_AXIS = "frame"
MODEL_AXIS = "model"
PIPE_AXIS = "pipe"
EXPERT_AXIS = "expert"


def make_mesh(n_devices: Optional[int] = None,
              frame_parallel: int = 1) -> Mesh:
    """Mesh over the first n_devices, shaped (batch, frame).

    frame_parallel > 1 carves a frame-parallel sub-axis for sharding the
    frame/sample axis of single long utterances (SURVEY.md section 5
    "Long-context / sequence parallelism").
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    assert n_devices % frame_parallel == 0
    grid = np.array(devs[:n_devices]).reshape(
        n_devices // frame_parallel, frame_parallel)
    return Mesh(grid, (BATCH_AXIS, FRAME_AXIS))


def make_tp_mesh(n_devices: Optional[int] = None,
                 model_parallel: int = 2) -> Mesh:
    """Mesh (batch, model) for tensor-parallel training of the neural
    frame model (models.neural): data parallelism over the batch axis x
    within-layer (Megatron-style) sharding of the hidden dimension over
    the model axis.  XLA/GSPMD inserts the all-gathers/psums implied by
    the parameter shardings (neural.tp_param_specs)."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    assert n_devices % model_parallel == 0
    grid = np.array(devs[:n_devices]).reshape(
        n_devices // model_parallel, model_parallel)
    return Mesh(grid, (BATCH_AXIS, MODEL_AXIS))


def make_pipe_mesh(n_stages: Optional[int] = None) -> Mesh:
    """1-D ("pipe",) mesh for pipeline-parallel training
    (parallel.pipeline): each device holds one contiguous stage of the
    residual trunk; activations hop stages over ICI via ppermute."""
    devs = jax.devices()
    if n_stages is None:
        n_stages = len(devs)
    return Mesh(np.array(devs[:n_stages]), (PIPE_AXIS,))


def make_expert_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D ("expert",) mesh for expert-parallel MoE training
    (parallel.expert): tokens are data-sharded over the same axis the
    experts are sharded over, and dispatch/return ride all_to_all."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    return Mesh(np.array(devs[:n_devices]), (EXPERT_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [B, ...] arrays: batch split over the batch axis."""
    return NamedSharding(mesh, P(BATCH_AXIS))


def batch_frame_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [B, N, ...] arrays: batch x frame split."""
    return NamedSharding(mesh, P(BATCH_AXIS, FRAME_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Place every [B, ...] leaf of a pytree with its batch axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
