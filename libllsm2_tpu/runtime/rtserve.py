"""Multi-stream real-time serving: batch N concurrent synthesis streams
into ONE device dispatch per service tick.

The reference's llsmrt (llsmrt.c -> llsm_rtsynth_buffer) streams a single
voice; serving many concurrent voices there means many independent
buffers, each paying its own per-frame render cost.  On TPU the economics
invert: a dispatch has a fixed overhead (hundreds of microseconds locally,
~225 ms through this image's relay) and the chip is wildly underutilized
by one stream's 2*nhop-sample segment -- so the TPU-native serving shape
is a StreamPool that renders `n_streams x feed_block` hops in a single
batched oscillator-bank dispatch and OLAs each stream's segments into its
own host ring.  This is the analog of batched decoding in LLM serving:
per-stream state stays tiny and host-side, the device step is pure and
shape-stable (one compiled program for the pool's lifetime).

Per-stream output is IDENTICAL to a solo RTSynthesizer run of the same
frames (the pool batches the very same _render_frames program the solo
feed_many path uses -- tests/test_rtserve.py pins bit-equality), including
PbP pulses, phase-propagate mode, and per-stream noise seeds.

Latency: feed_block + 1 hops (service granularity + one lookahead frame).
feed_block is a constructor knob: 4 hops = 25 ms at the 16 kHz defaults
for interactive use; 16+ for throughput serving.

Usage:
    pool = StreamPool(sopt, conf, n_streams=64)
    pool.feed(s, chunk_or_frames)          # per-stream, any granularity
    pool.service()                          # one dispatch, all due streams
    y = pool.fetch(s, pool.readable(s))     # per-stream audio
    pool.end_stream(s)                      # flush tail; stream reusable
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import ChunkConf, SynthesisOptions
from ..container import Chunk
from .rtsynth import RTSynthesizer, _render_frames, _render_pulses


class StreamPool:
    """N independent streaming voices served by one batched device step.

    Args:
      sopt: synthesis options; stream s uses noise seed sopt.noise_seed+s
        (independent noise per voice, each deterministic).
      conf: shared chunk conf (static; compiled into the batched step).
        All streams share one conf -- that is what makes the batch a
        single program.  Pools with mixed confs = multiple StreamPools.
      n_streams: pool width (static batch dimension).
      feed_block: hops rendered per stream per service tick.
      mesh: optional jax.sharding.Mesh — shard the batched render over
        its first axis (pure data parallelism across chips: each device
        renders n_streams/ndev streams' rows; the host rings stay
        per-stream).  Requires n_streams % mesh_size == 0 so every
        device gets whole streams.
    """

    def __init__(self, sopt: SynthesisOptions, conf: ChunkConf,
                 n_streams: int, feed_block: int = 16,
                 capacity_frames: int = 256, phase_mode: str = "absolute",
                 synth_mode: str = "harmonic", mesh=None):
        self.conf = conf
        self.n_streams = int(n_streams)
        self.feed_block = int(feed_block)
        assert self.n_streams >= 1 and self.feed_block >= 1
        self.mesh = mesh
        if mesh is not None:
            ndev = int(np.prod(mesh.devices.shape))
            assert self.n_streams % ndev == 0, (
                f"n_streams={n_streams} must divide over {ndev} devices")
            ax = mesh.axis_names[0]
            self._row_sharding = NamedSharding(mesh, P(ax))
            self._ndev = ndev
        else:
            self._row_sharding = None
            self._ndev = 1
        self.streams = []
        for s in range(self.n_streams):
            so = dataclasses.replace(sopt,
                                     noise_seed=int(sopt.noise_seed) + s)
            rt = RTSynthesizer(so, conf, capacity_frames=capacity_frames,
                               phase_mode=phase_mode, synth_mode=synth_mode)
            rt.feed_block = self.feed_block
            self.streams.append(rt)
        self._q = [[] for _ in range(self.n_streams)]
        self.dispatches = 0   # batched device calls (observability)

    # -- per-stream I/O ---------------------------------------------------
    def feed(self, s: int, frames) -> None:
        """Queue frames for stream s (a Chunk, a frame dict, or a list of
        either).  Rendering happens at the next service() tick."""
        rt = self.streams[s]
        if isinstance(frames, Chunk):
            self._q[s].extend(RTSynthesizer.chunk_frames_np(frames))
            return
        if isinstance(frames, dict):
            frames = [frames]
        self._q[s].extend(rt._frame_fields(f) for f in frames)

    def readable(self, s: int) -> int:
        return self.streams[s].readable()

    def fetch(self, s: int, n: int) -> np.ndarray:
        return self.streams[s].fetch(n)

    def queued(self, s: int) -> int:
        """Frames queued but not yet rendered for stream s."""
        rt = self.streams[s]
        return len(self._q[s]) + (1 if rt._pending is not None else 0)

    def _put(self, a: np.ndarray):
        """Host batch row-block -> device(s): row-sharded over the mesh
        when one is set (GSPMD partitions the render along the batch
        dim; no collectives — the render is per-row independent)."""
        if self._row_sharding is None:
            return jnp.asarray(a)
        return jax.device_put(a, self._row_sharding)

    # -- the batched tick ---------------------------------------------------
    def _due(self, s: int) -> bool:
        """Stream s can render a full feed_block this tick (block frames
        plus one lookahead available, counting the held-over pending)."""
        rt = self.streams[s]
        need = self.feed_block + (0 if rt._pending is not None else 1)
        return len(self._q[s]) >= need

    def service(self) -> int:
        """Render one feed_block for every due stream in ONE batched
        dispatch (plus one shared pulse dispatch in PbP mode).  Returns
        the number of streams rendered; call repeatedly to drain deep
        queues."""
        MB = self.feed_block
        conf = self.conf
        due = [s for s in range(self.n_streams) if self._due(s)]
        if not due:
            return 0
        per = []   # (s, rt, queue, M, ins, pulse_jobs)
        for s in due:
            rt = self.streams[s]
            if rt._pending is not None:
                queue = [rt._pending] + self._q[s][:MB]
                self._q[s] = self._q[s][MB:]
            else:
                queue = self._q[s][:MB + 1]
                self._q[s] = self._q[s][MB + 1:]
            ins, M, pulse_jobs = rt._assemble_group(queue, rt._prev_f0)
            per.append((s, rt, queue, M, ins, pulse_jobs))

        # one batched render: [n_streams * MB] rows, zero rows for idle
        # streams -- the batch shape is STATIC so the pool runs one
        # compiled program for its whole lifetime
        S = self.n_streams
        batch = {k: np.zeros((S * MB,) + per[0][4][k].shape[1:],
                             np.float32)
                 for k in RTSynthesizer._FIELDS}
        for row, (_, _, _, _, ins, _) in enumerate(per):
            for k in RTSynthesizer._FIELDS:
                batch[k][row * MB:(row + 1) * MB] = ins[k]
        segs = np.asarray(_render_frames(
            conf, *(self._put(batch[k]) for k in RTSynthesizer._FIELDS)))
        self.dispatches += 1

        # one shared pulse dispatch (PbP streams), static pooled budget
        all_jobs = []
        counts = []
        for (_, rt, _, _, _, pulse_jobs) in per:
            all_jobs.extend(pulse_jobs)
            counts.append(len(pulse_jobs))
        pulses = None
        if all_jobs:
            # the shared dispatch renders EVERY stream's pulses on stream
            # 0's spectral grid -- a stream whose sopt was mutated to a
            # different pbp_oversample would silently render on the wrong
            # grid (and wrong guard/irfft sizes), so refuse instead
            os0 = self.streams[0].sopt.pbp_oversample
            for (s, rt, _, _, _, pj) in per:
                if pj and rt.sopt.pbp_oversample != os0:
                    raise ValueError(
                        f"stream {s} has pbp_oversample="
                        f"{rt.sopt.pbp_oversample} != pool's {os0}; all "
                        "pooled streams must share one spectral grid")
            budget = S * self.streams[0]._pulse_budget()
            budget = -(-budget // self._ndev) * self._ndev
            args = RTSynthesizer._pack_pulse_jobs(conf, all_jobs, budget)
            pulses = np.asarray(_render_pulses(
                conf, *(self._put(a) for a in args),
                self.streams[0].sopt.pbp_oversample))
            self.dispatches += 1

        off = 0
        for row, (s, rt, queue, M, ins, pulse_jobs) in enumerate(per):
            pl = pulses[off:off + counts[row]] if pulses is not None \
                else None
            off += counts[row]
            rt._commit_group(segs[row * MB:row * MB + M], M, pl,
                             pulse_jobs)
            rt._prev_f0 = queue[-2]["f0"]
            rt._pending = queue[-1]
            rt._fed = max(rt._fed, rt._i + 1)
        return len(per)

    def end_stream(self, s: int) -> None:
        """Flush stream s: render any sub-block remainder (solo-path
        dispatches -- tail only) and finalize the ring.  The stream slot
        stays usable: reset it for a new voice with reset_stream()."""
        rt = self.streams[s]
        rest = self._q[s]
        self._q[s] = []
        if rest:
            rt.feed_many(rest)
        rt.flush()

    def reset_stream(self, s: int) -> None:
        """Recycle slot s for a new voice (same conf, same compiled
        programs)."""
        self._q[s] = []
        self.streams[s].reset()
