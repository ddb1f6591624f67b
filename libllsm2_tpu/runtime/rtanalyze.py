"""Streaming (block) analysis: the analysis-side dual of rtsynth.

The reference's llsm_analyze is offline-only (llsmrt.c streams synthesis,
nothing streams analysis); this module adds real-time-capable analysis so
the full live chain analyze -> edit -> rtsynth works on a running input.

Design: every cross-frame operation in the offline pipeline has a finite
horizon in frames (pitch-synchronous windows: ceil(halfwin_max/nhop)
hops; deconvolution band: that + 1; f0-refine smoothing: f0_refine_smooth
// 2; denoiser FIRs: ~frame_rate/cutoff) -- except the noise-band
analytic envelopes, whose brick-wall band filters have 1/t tails.  So a
block of `block_hops` frames analyzed with `halo_hops` of real context on
both sides reproduces the offline result for its central frames to fp
precision (the envelope tail leaks ~1/(pi * halo * nhop) relative
amplitude: -80 dB at the defaults).  One fixed block shape = ONE compiled
program reused for the whole stream -- the TPU-idiomatic form of
streaming (same trick as rtsynth.feed_many).

No phase bookkeeping is needed across blocks: every phase the analysis
emits (harmonic phse, envelope eenv_p) is referenced at the OWN frame's
center against that frame's own fundamental-cycle count, so it is
invariant to where the analysis block starts (verified to ~2e-5 rad in
tests/test_rtanalyze.py -- an earlier design carried a cross-block cycle
offset, which measurement showed both unnecessary and wrong).  Absolute
cross-frame coherence is re-derived downstream exactly as offline:
synthesis and phase_propagate integrate chunk.f0 over the assembled
chunk, and streamed f0 equals offline f0 on emitted frames.

The track denoiser, when enabled, estimates its noise floors per block
rather than globally (the only statistic that is not finite-horizon);
equality tests run with it disabled.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AnalysisOptions
from ..container import Chunk


def concat_frames(chunks) -> Chunk:
    """Plain frame-axis concatenation of chunks (no crossfade -- for
    reassembling streamed blocks; for unit splicing see
    models.edits.concat)."""
    chunks = list(chunks)
    assert chunks, "no chunks to concatenate"
    assert all(c.conf == chunks[0].conf for c in chunks)
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *chunks)


class RTAnalyzer:
    """Streaming analyzer: feed (samples, f0 frames), get analyzed frames
    back with `2 * halo_hops + block_hops` hops of latency.

    Like the reference's llsm_analyze, F0 is an input (any tracker works;
    ops.f0 for a built-in one).  Within one feed call, samples and f0
    frames need not be aligned -- both are buffered and blocks run when
    enough of each is available.

      rta = RTAnalyzer(create_aoptions())
      for samples, f0_frames in stream:
          chunk = rta.feed(samples, f0_frames)   # 0+ newly-final frames
          ...
      tail = rta.flush()                         # remaining frames
    """

    def __init__(self, opt: AnalysisOptions, block_hops: int = 64,
                 halo_hops: int = 48):
        assert not opt.fs_input or abs(
            opt.fs_input - opt.conf.fs) < 1e-9, (
            "feed samples at conf.fs (resample outside the stream loop)")
        self.opt = opt
        self.nhop = opt.conf.nhop
        self.block = int(block_hops)
        self.halo = int(halo_hops)
        assert self.block >= 1 and self.halo >= 1
        self.nfrm_blk = self.block + 2 * self.halo
        self._x = np.zeros(0, np.float32)       # samples from frame 0 on
        self._f0 = np.zeros(0, np.float32)
        self._emitted = 0                        # frames emitted so far
        self._fed_frames = 0

    def _have(self, n_frames: int) -> bool:
        return (self._fed_frames >= n_frames
                and self._x.shape[0] >= n_frames * self.nhop)

    def _ready(self) -> bool:
        """Is the next block computable from buffered data alone?
        The first block is anchored at the stream start (its left edge IS
        the stream edge, so offline edge semantics apply bit-for-bit) and
        emits block+halo frames; middle blocks slide by `block`."""
        e, H, B = self._emitted, self.halo, self.block
        if e == 0:
            return self._have(self.nfrm_blk)
        return self._have(e + B + H)

    def _run(self, s0: int, ref_in: int, n_take: int) -> Chunk:
        """Analyze block frames [s0, s0+nfrm_blk), emit n_take frames from
        local index ref_in (= global frame self._emitted)."""
        from ..models.layer0 import _analyze_jit

        lo_f = max(s0, 0)
        hi_f = s0 + self.nfrm_blk
        f0_blk = np.zeros(self.nfrm_blk, np.float32)
        avail_f = self._f0[lo_f: min(hi_f, self._fed_frames)]
        f0_blk[lo_f - s0: lo_f - s0 + len(avail_f)] = avail_f
        x_blk = np.zeros(self.nfrm_blk * self.nhop, np.float32)
        lo_s = lo_f * self.nhop
        avail_x = self._x[lo_s: min(hi_f * self.nhop, self._x.shape[0])]
        x_blk[lo_s - s0 * self.nhop:
              lo_s - s0 * self.nhop + len(avail_x)] = avail_x
        chunk = _analyze_jit(self.opt, jnp.asarray(x_blk),
                             jnp.asarray(f0_blk))
        out = jax.tree.map(lambda a: a[ref_in: ref_in + n_take], chunk)
        self._emitted += n_take
        return out

    def _next_block(self) -> Chunk:
        e, H, B = self._emitted, self.halo, self.block
        if e == 0:
            return self._run(s0=0, ref_in=0, n_take=B + H)
        return self._run(s0=e - H, ref_in=H, n_take=B)

    def feed(self, samples=None, f0_frames=None) -> Chunk | None:
        """Buffer new input; return a chunk of newly-final frames (or
        None if no block completed)."""
        if samples is not None:
            self._x = np.concatenate(
                [self._x, np.asarray(samples, np.float32)])
        if f0_frames is not None:
            f0_frames = np.asarray(f0_frames, np.float32)
            self._f0 = np.concatenate([self._f0, f0_frames])
            self._fed_frames += len(f0_frames)
        outs = []
        while self._ready():
            outs.append(self._next_block())
        if not outs:
            return None
        return outs[0] if len(outs) == 1 else concat_frames(outs)

    def flush(self) -> Chunk | None:
        """End of stream: emit the remaining frames.  The final block is
        anchored at the stream END (its right edge is the stream edge),
        so offline edge semantics apply there too; a stream shorter than
        one block falls back to a direct whole-stream analysis (its own
        shape, compiled once)."""
        total = self._fed_frames
        e, H, B = self._emitted, self.halo, self.block
        if e == 0 and total < self.nfrm_blk:
            if total == 0:
                return None
            from ..models.layer0 import _analyze_jit
            f0 = np.zeros(total, np.float32)
            f0[:len(self._f0)] = self._f0[:total]
            x = np.zeros(total * self.nhop, np.float32)
            n = min(self._x.shape[0], total * self.nhop)
            x[:n] = self._x[:n]
            self._emitted = total
            return _analyze_jit(self.opt, jnp.asarray(x), jnp.asarray(f0))
        outs = []
        while total - self._emitted > B + H:
            outs.append(self._next_block())
        if self._emitted < total:
            s0 = total - self.nfrm_blk
            outs.append(self._run(s0=s0, ref_in=self._emitted - s0,
                                  n_take=total - self._emitted))
        if not outs:
            return None
        return outs[0] if len(outs) == 1 else concat_frames(outs)
