"""Frame-axis ("sequence") parallelism for single very long utterances.

The reference's only cross-frame couplings are the phase-propagation
prefix sum and the overlap-add halo (SURVEY.md section 5); both are
XLA-partitionable: the cycle track is a jax.lax.associative_scan (GSPMD
lowers it to per-shard scans + an inter-chip exclusive scan over ICI) and
OLA's halo is a one-hop collective-permute.  So frame parallelism here is
pure sharding annotation: jit the SAME single-utterance pipeline with the
frame axis of the chunk (and the sample axis of the signal) sharded, and
let XLA insert the collectives -- no hand-written communication.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import AnalysisOptions, SynthesisOptions
from ..container import Chunk
from ..models import layer0
from .mesh import FRAME_AXIS


def analyze_frame_sharded(opt: AnalysisOptions, x, f0, mesh) -> Chunk:
    """Single-utterance analysis with the sample/frame axes sharded over
    the mesh's frame axis.  XLA partitions the batched contractions
    frame-wise and handles window overlaps at shard boundaries (the
    pitch-synchronous gathers become halo exchanges)."""
    xs = NamedSharding(mesh, P(FRAME_AXIS))
    x = jax.device_put(jnp.asarray(x, jnp.float32), xs)
    f0 = jax.device_put(jnp.asarray(f0, jnp.float32), xs)
    return layer0._analyze_jit(opt, x, f0)


def synthesize_frame_sharded(sopt: SynthesisOptions, chunk: Chunk, mesh):
    """Single-utterance synthesis with frame-sharded chunk arrays; the
    cycle-track prefix scan and the OLA halo cross shards via XLA
    collectives."""
    fr = NamedSharding(mesh, P(FRAME_AXIS))
    shard = lambda a: None if a is None else jax.device_put(a, fr)
    chunk = Chunk(
        f0=shard(chunk.f0), ampl=shard(chunk.ampl), phse=shard(chunk.phse),
        hm_mask=shard(chunk.hm_mask), psd=shard(chunk.psd),
        edc=shard(chunk.edc), eenv_a=shard(chunk.eenv_a),
        eenv_p=shard(chunk.eenv_p), rd=shard(chunk.rd),
        vtmagn=shard(chunk.vtmagn), vsphse=shard(chunk.vsphse),
        conf=chunk.conf)
    return layer0._synthesize_jit(sopt, chunk)
