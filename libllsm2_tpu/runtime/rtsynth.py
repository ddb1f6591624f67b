"""Streaming (real-time) synthesizer: the llsmrt analog.

Reference: llsmrt.c -> llsm_create_rtsynth_buffer / _feed / _fetch /
_delete (SURVEY.md 3.4).  Architecture here: a jitted per-frame render
step (oscillator bank + WOLA noise shaper on the device) driven by a host
loop, overlap-adding into the native C++ ring buffer
(native/llsm_ring.cpp via runtime/native.py).  One frame of lookahead
reproduces the offline pipeline's linear F0 interpolation between frame
centers, so streaming output converges to the offline render.

Feed accepts one frame of chunk data at a time (dicts or a 1-frame
Chunk); fetch pops finalized samples.  Latency: 2 hops (one lookahead
frame + one OLA half-window).
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

from ..config import ChunkConf, SynthesisOptions
from ..container import Chunk
from ..ops import interp, warp
from .native import OLARing


@functools.partial(jax.jit, static_argnums=(0,))
def _render_frame(conf: ChunkConf, ampl, phse, mask, dc_seg, psd, edc,
                  eenv_a, eenv_p, noise_seg, voiced):
    """Render one frame's [2*nhop] OLA segment (harmonic + noise)."""
    nhop = conf.nhop
    T = 2 * nhop
    K = conf.maxnhar
    kharm = jnp.arange(1, K + 1, dtype=jnp.float32)
    w_ola = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * (jnp.arange(T) + 0.5) / T)
    w_ola = w_ola.astype(jnp.float32)

    ph = kharm[:, None] * dc_seg[None, :]
    ph = ph - jnp.round(ph)
    osc = jnp.cos(2.0 * jnp.pi * ph + phse[:, None])        # [K, T]
    seg_h = jnp.einsum("kt,k->t", osc, ampl * mask) * w_ola * voiced

    # noise: sqrt-Hann WOLA of the supplied white-noise segment
    w = jnp.sqrt(w_ola)
    spec = jnp.fft.rfft(noise_seg * w, n=T)
    nbin = T // 2 + 1
    pos = warp.unwarp_interp_positions(nbin, conf.npsd, conf.fs,
                                       conf.noswarp)
    gain = jnp.sqrt(jnp.maximum(interp.interp1_uniform(psd, pos), 0.0))
    f = jnp.arange(nbin) * conf.fs / T
    edges = conf.chan_edges
    ke = jnp.arange(1, conf.maxnhar_e + 1, dtype=jnp.float32)
    seg_n = jnp.zeros(T, jnp.float32)
    for c in range(conf.nchannel):
        m = ((f >= edges[c]) & (f < edges[c + 1])).astype(jnp.float32)
        band = jnp.fft.irfft(spec * gain * m, n=T) * w
        phc = ke[:, None] * dc_seg[None, :]
        phc = phc - jnp.round(phc)
        env = edc[c] + jnp.einsum(
            "kt,k->t", jnp.cos(2.0 * jnp.pi * phc + eenv_p[c][:, None]),
            eenv_a[c]) * voiced
        # unit-RMS modulator: the PSD already carries the modulation's
        # power, so normalize by sqrt(edc^2 + sum a^2/2), not edc
        # (matches layer0._env_coefs)
        base = jnp.sqrt(edc[c] ** 2
                        + 0.5 * jnp.sum((eenv_a[c] * voiced) ** 2))
        mod = jnp.maximum(env, 0.0) / jnp.maximum(base, 1e-8)
        seg_n = seg_n + band * mod
    return seg_h + seg_n


@functools.partial(jax.jit, static_argnums=(0,))
def _render_frames(conf: ChunkConf, ampl, phse, mask, dc_seg, psd, edc,
                   eenv_a, eenv_p, noise_seg, voiced):
    """Batched render: [M] frames -> [M, 2*nhop] OLA segments in ONE
    device dispatch (reference: llsmrt.c renders per frame; under this
    image's relay a per-frame dispatch costs ~45x realtime, so feed_many
    batches M hops per call -- VERDICT r1 #5)."""
    return jax.vmap(lambda *a: _render_frame(conf, *a))(
        ampl, phse, mask, dc_seg, psd, edc, eenv_a, eenv_p, noise_seg,
        voiced)


@functools.partial(jax.jit, static_argnums=(0, 10))
def _render_pulses(conf: ChunkConf, vtm0, vtm1, wlerp, rd0, rd1, f00, f01,
                   frac, valid, os_: int = 4):
    """Render P glottal pulses with PER-PULSE source/tract parameters
    (streaming PbP mode; reference: llsmrt.c PbP -- SURVEY.md 3.4).

    vtm0/vtm1 [P, nspec] are each pulse's bracketing frames' log VT
    magnitudes and rd0/rd1/f00/f01 [P] those frames' source parameters;
    each frame's COMBINED source-x-tract complex spectrum is built and
    the combination is lerped with wlerp [P] -- the same per-pulse
    interpolation as the offline renderer (models.pbp; see the design
    notes there for why the combined spectrum, and not (rd lerp,
    vt lerp), must be interpolated), so stream == offline holds.
    frac/valid [P].  os_ is the spectral-grid oversampling
    (sopt.pbp_oversample) and each pulse is rendered PULSE_GUARD samples
    into its buffer (callers place rows at onset - PULSE_GUARD), both
    matching the offline renderer.  Returns [P, os_*nfft]."""
    from ..models import layer1 as l1m
    from ..models.pbp import PULSE_GUARD
    from ..ops import lf, spectral

    nfft = os_ * conf.nfft_spec
    nspec = os_ * (conf.nspec - 1) + 1
    fs = conf.fs
    fbins = jnp.linspace(0.0, fs / 2.0, nspec)

    def combined(vtm, rd, f0):
        vt = jnp.exp(
            spectral.upsample_linear(vtm, os_).astype(jnp.complex64)
            + 1j * spectral.upsample_linear(
                spectral.minphase_phase(vtm), os_))          # [P, nspec]
        f0c = jnp.maximum(f0, 1e-2)
        params = lf.lf_from_rd(rd)
        src = lf.lf_spectrum(fbins[None, :] / f0c[:, None],
                             jax.tree.map(lambda a: a[:, None], params))
        src1 = lf.lf_spectrum(jnp.ones_like(f0c), params)
        return vt * src / jnp.maximum(jnp.abs(src1)[:, None], 1e-12)

    w = wlerp[:, None]
    spec_c = (1.0 - w) * combined(vtm0, rd0, f00) \
        + w * combined(vtm1, rd1, f01)                       # [P, nspec]
    lip = (2.0 * jnp.pi * jnp.maximum(fbins, 1e-3)
           * conf.lip_radius / l1m.SPEED_OF_SOUND
           ) * jnp.exp(1j * jnp.pi / 2.0).astype(jnp.complex64)
    period = 1.0 / jnp.maximum((1.0 - wlerp) * f00 + wlerp * f01, 1e-2)
    delay = jnp.exp((-2j * jnp.pi) * fbins[None, :] / fs
                    * (frac[:, None] + PULSE_GUARD))         # [P, nspec]
    spec = (period[:, None] / 2.0 * fs) * spec_c * lip[None, :] * delay
    return jnp.fft.irfft(spec, n=nfft) * valid[:, None]


class RTSynthesizer:
    """Streaming synthesizer (reference: llsm_rtsynth_buffer).

    Args:
      sopt: synthesis options (noise seed).
      conf: chunk conf (static; compiled into the render step).
      capacity_frames: ring capacity in frames.
      phase_mode: "absolute" (frames carry coherent phases, e.g. straight
        from analysis) or "propagate" (frames carry relative phases, e.g.
        from coder decode per-frame; the synthesizer accumulates the
        fundamental cycle count and re-propagates, reference:
        llsm_chunk_phasepropagate applied online).
    """

    def __init__(self, sopt: SynthesisOptions, conf: ChunkConf,
                 capacity_frames: int = 64, phase_mode: str = "absolute",
                 synth_mode: str = "harmonic"):
        assert phase_mode in ("absolute", "propagate")
        assert synth_mode in ("harmonic", "pbp")
        self.sopt = sopt
        self.conf = conf
        self.phase_mode = phase_mode
        self.synth_mode = synth_mode
        self._pulse_cycles = 0.0   # cycle phase for PbP onset placement
        self.nhop = conf.nhop
        # PbP pulses land PULSE_GUARD samples BEFORE their onset (the
        # fractional-delay kernel's acausal tail).  A pulse whose onset
        # falls early in hop i can therefore reach back to
        # i*nhop - PULSE_GUARD, which is BEHIND the previously finalized
        # point (i-1)*nhop whenever nhop <= PULSE_GUARD (e.g. fs=8000 at
        # thop=5 ms -> nhop=40) -- the ring would raise BufferError once
        # the caller reads up to it.  Delay finalization by the guard in
        # PbP mode so the guard head can never cross the finalized point;
        # costs PULSE_GUARD samples of extra latency, output unchanged.
        if synth_mode == "pbp":
            from ..models.pbp import PULSE_GUARD
            self._adv_lag = PULSE_GUARD
        else:
            self._adv_lag = 0
        self.ring = OLARing(capacity_frames * self.nhop)
        self._pending = None      # one-frame lookahead
        self._prev_f0 = 0.0
        self._i = 0               # index of the next frame to render
        self._cycles = 0.0        # fundamental cycles at current center (f64)
        self._fed = 0
        self._noise_memo = None
        self.dispatches = 0       # device render calls (observability)

    # -- helpers ---------------------------------------------------------
    def _noise_block(self, j: int) -> np.ndarray:
        if self._noise_memo is not None and self._noise_memo[0] == j:
            return self._noise_memo[1]
        rng = np.random.default_rng([int(self.sopt.noise_seed), max(j, 0)])
        b = rng.standard_normal(self.nhop).astype(np.float32)
        if j < 0:
            b = np.zeros_like(b)
        self._noise_memo = (j, b)   # frame i+1 re-reads block i
        return b

    @staticmethod
    def _dc_segments(nhop: int, fs: float, f0p, f0c, f0n) -> np.ndarray:
        """Cycle offsets over [-nhop, nhop) for M frames at once with
        the offline pipeline's piecewise-linear F0 (float64 on host,
        mod-1 on device).  f0p/f0c/f0n are [M] float64 arrays; the
        single source of truth for BOTH the per-frame feed path and the
        block/serving assembly (they must stay bit-identical)."""
        t = np.arange(-nhop, nhop, dtype=np.float64)[None, :]
        a = (t + nhop) / nhop
        f_back = f0p[:, None] + (f0c - f0p)[:, None] * a   # t in [-nhop, 0)
        f_fwd = f0c[:, None] + (f0n - f0c)[:, None] * (t / nhop)
        f_t = np.where(t < 0, f_back, f_fwd)               # [M, 2*nhop]
        dc = np.zeros_like(f_t)
        dc[:, nhop:] = (np.cumsum(f_t[:, nhop:], axis=1)
                        - f_t[:, nhop:]) / fs              # exclusive
        back = -np.cumsum(f_t[:, nhop - 1::-1], axis=1) / fs
        dc[:, :nhop] = back[:, ::-1]
        return (dc % 1.0).astype(np.float32)

    def _dc_segment(self, f0_prev, f0_cur, f0_next):
        return self._dc_segments(
            self.nhop, self.conf.fs, np.array([f0_prev], np.float64),
            np.array([f0_cur], np.float64),
            np.array([f0_next], np.float64))[0]

    @staticmethod
    def chunk_frames_np(chunk: Chunk):
        """Split a Chunk into per-frame field dicts with ONE bulk
        host transfer (per-frame Chunk.frame(i) slicing costs ~0.5 ms of
        jax dispatch per frame -- measured dominant in serving feeds)."""
        f0 = np.asarray(chunk.f0)
        cols = dict(ampl=np.asarray(chunk.ampl),
                    phse=np.asarray(chunk.phse),
                    mask=np.asarray(chunk.hm_mask),
                    psd=np.asarray(chunk.psd),
                    edc=np.asarray(chunk.edc),
                    eenv_a=np.asarray(chunk.eenv_a),
                    eenv_p=np.asarray(chunk.eenv_p))
        if chunk.has_layer1:
            rd = np.asarray(chunk.rd)
            vt = np.asarray(chunk.vtmagn)
        out = []
        for i in range(chunk.nfrm):
            d = {k: v[i] for k, v in cols.items()}
            d["f0"] = float(f0[i])
            if chunk.has_layer1:
                d["rd"] = float(rd[i])
                d["vtmagn"] = vt[i]
            out.append(d)
        return out

    def _frame_fields(self, frame):
        if isinstance(frame, Chunk):
            g = lambda a: np.asarray(a)[0]
            d = dict(f0=float(np.asarray(frame.f0)[0]), ampl=g(frame.ampl),
                     phse=g(frame.phse), mask=g(frame.hm_mask),
                     psd=g(frame.psd), edc=g(frame.edc),
                     eenv_a=g(frame.eenv_a), eenv_p=g(frame.eenv_p))
            if frame.has_layer1:
                d["rd"] = float(np.asarray(frame.rd)[0])
                d["vtmagn"] = g(frame.vtmagn)
            return d
        return dict(frame)

    def _render(self, cur, f0_prev, f0_next, nxt=None):
        f0c = cur["f0"] if cur["f0"] > 0 else 0.0
        dc = self._dc_segment(f0_prev if f0_prev > 0 else f0c,
                              f0c, f0_next if f0_next > 0 else f0c)
        i = self._i
        noise = np.concatenate([self._noise_block(i - 1),
                                self._noise_block(i)])
        phse = np.asarray(cur["phse"], np.float32)
        if self.phase_mode == "propagate" and f0c > 0:
            k = np.arange(1, self.conf.maxnhar + 1)
            phse = phse + (2.0 * np.pi) * ((k * self._cycles) % 1.0)
        ampl = np.asarray(cur["ampl"], np.float32)
        if self.synth_mode == "pbp":
            ampl = np.zeros_like(ampl)   # harmonics come from pulses
        seg = _render_frame(
            self.conf, jnp.asarray(ampl, jnp.float32),
            jnp.asarray(phse, jnp.float32),
            jnp.asarray(cur["mask"], jnp.float32), jnp.asarray(dc),
            jnp.asarray(cur["psd"], jnp.float32),
            jnp.asarray(cur["edc"], jnp.float32),
            jnp.asarray(cur["eenv_a"], jnp.float32),
            jnp.asarray(cur["eenv_p"], jnp.float32),
            jnp.asarray(noise), jnp.float32(1.0 if f0c > 0 else 0.0))
        seg = np.asarray(seg)
        self.dispatches += 1
        if self.synth_mode == "pbp" and f0c > 0 and "vtmagn" in cur:
            self._emit_pulses(cur, nxt, f0c)
        pos = i * self.nhop - self.nhop
        if pos < 0:
            seg = seg[-pos:]
            pos = 0
        self.ring.add(seg, pos)
        self.ring.advance(max(0, i * self.nhop - self._adv_lag))
        # advance the cycle accumulator to the next frame center
        self._cycles = (self._cycles
                        + 0.5 * (f0c + (f0_next if f0_next > 0 else f0c))
                        * self.conf.thop) % 1.0
        self._i += 1

    def _pulse_params(self, cur, nxt, f0c, oi, fr):
        """Per-pulse bracketing-frame parameters (mirrors models.pbp:
        lerp the combined spectra toward the NEXT frame when both are
        voiced, else hold the onset frame's).  Returns
        (vt0, vt1, wlerp, rd0, rd1, f00, f01)."""
        w = (oi + fr) / self.nhop
        use_next = (nxt is not None and nxt.get("f0", 0.0) > 0
                    and "vtmagn" in nxt)
        rd0 = float(cur.get("rd", 1.0))
        if not use_next:
            return (cur["vtmagn"], cur["vtmagn"], 0.0,
                    rd0, rd0, f0c, f0c)
        return (cur["vtmagn"], nxt["vtmagn"], w,
                rd0, float(nxt.get("rd", 1.0)), f0c, float(nxt["f0"]))

    def _emit_pulses(self, cur, nxt, f0c: float) -> None:
        """PbP mode: place the glottal pulses whose onsets fall in the hop
        [i*nhop, (i+1)*nhop) and OLA them into the ring."""
        nhop = self.nhop
        i = self._i
        # onsets: cycle phase crosses integers; F0 held constant in-hop
        onsets = self._pulse_onsets(f0c)
        if not onsets:
            return
        # static per-hop pulse budget (distinct P values would each be a
        # fresh tunnel-slow compile)
        P = len(onsets)
        Pmax = int(self.conf.f0_ceil * nhop / self.conf.fs) + 2
        vt0 = np.tile(np.asarray(cur["vtmagn"], np.float32), (Pmax, 1))
        vt1 = vt0.copy()
        wl = np.zeros((Pmax,), np.float32)
        rdv0 = np.ones((Pmax,), np.float32)
        rdv1 = np.ones((Pmax,), np.float32)
        f0v0 = np.full((Pmax,), 100.0, np.float32)
        f0v1 = np.full((Pmax,), 100.0, np.float32)
        fracs = np.zeros((Pmax,), np.float32)
        valid = np.zeros((Pmax,), np.float32)
        for p, (oi, fr) in enumerate(onsets):
            v0, v1, w, rd0, rd1, f00, f01 = self._pulse_params(
                cur, nxt, f0c, oi, fr)
            vt0[p], vt1[p], wl[p] = v0, v1, w
            rdv0[p], rdv1[p], f0v0[p], f0v1[p] = rd0, rd1, f00, f01
            fracs[p], valid[p] = fr, 1.0
        pulses = np.asarray(_render_pulses(
            self.conf, jnp.asarray(vt0), jnp.asarray(vt1),
            jnp.asarray(wl), jnp.asarray(rdv0), jnp.asarray(rdv1),
            jnp.asarray(f0v0), jnp.asarray(f0v1),
            jnp.asarray(fracs), jnp.asarray(valid),
            self.sopt.pbp_oversample))
        self.dispatches += 1
        for p, (oi, _) in enumerate(onsets):
            self._add_pulse(pulses[p], i * nhop + oi)

    # -- public API (reference: llsm_rtsynth_buffer_feed/_fetch) ---------
    def reset(self) -> None:
        """Drop all buffered state (new utterance on the same compiled
        renderer -- the compiled step functions are keyed by conf and
        survive resets)."""
        self.ring = OLARing(self.ring.capacity)
        self._pending = None
        self._prev_f0 = 0.0
        self._i = 0
        self._cycles = 0.0
        self._pulse_cycles = 0.0
        self._fed = 0
        self._noise_memo = None
        self.dispatches = 0

    def feed(self, frame) -> None:
        cur = self._frame_fields(frame)
        if self._pending is not None:
            self._render(self._pending, self._prev_f0, cur["f0"], nxt=cur)
            self._prev_f0 = self._pending["f0"]
        self._pending = cur
        self._fed += 1

    # -- batched feed (VERDICT r1 #5: cut dispatches/frame) ---------------
    feed_block = 16   # frames per compiled render step (static pad size)

    def feed_many(self, frames) -> None:
        """Feed a sequence of frames (or a multi-frame Chunk), rendering
        feed_block hops per device dispatch instead of one.  Output is
        bit-identical to per-frame feed() (same per-frame noise keys,
        same lookahead semantics); only the dispatch count changes:
        ~1 dispatch per feed_block frames (+1 per block in PbP mode).
        """
        if isinstance(frames, Chunk):
            queue = self.chunk_frames_np(frames)
        else:
            queue = [self._frame_fields(f) for f in frames]
        self._fed += len(queue)
        if self._pending is not None:
            queue.insert(0, self._pending)
        if len(queue) < 2:
            self._pending = queue[-1] if queue else self._pending
            return
        self._render_block(queue)
        self._prev_f0 = queue[-2]["f0"]
        self._pending = queue[-1]

    # input-array key order for _render_frames (shared with rtserve)
    _FIELDS = ("ampl", "phse", "mask", "dc", "psd", "edc", "ea", "ep",
               "noise", "voiced")

    def _assemble_group(self, grp, f0_prev):
        """Assemble device inputs for one render group.

        grp: M+1 frame dicts -- grp[:-1] are rendered, grp[-1] is the
        lookahead (linear-F0 target; not rendered here).  Arrays are
        zero-padded to the static feed_block size.  Advances the
        phase-propagation cycle accumulator by M hops (ring/_i are NOT
        touched -- see _commit_group).  Returns (inputs dict, M,
        pulse_jobs); pulse_jobs entries are
        (abs_frame, onset, frac, vt0, vt1, wlerp, rd0, rd1, f00, f01).

        All array work is vectorized over the group's frames: the
        per-frame formulation cost ~0.8 ms of numpy-call overhead per
        stream per tick, which CAPPED a 64-stream serving pool at
        ~50 ms/tick of host assembly (measured; the batched render
        itself is ~7 ms).  The dc/noise/phase blocks below compute the
        same float64 elementwise ops in the same order as the old
        per-frame helpers, so output is BIT-IDENTICAL (pinned by the
        feed_many == feed and pool == solo equality tests)."""
        conf = self.conf
        nhop = self.nhop
        fs = conf.fs
        MB = self.feed_block
        K = conf.maxnhar
        M = len(grp) - 1
        assert 1 <= M <= MB
        # raw and voicing-substituted f0 sequences
        f0_raw = np.array([g["f0"] for g in grp], np.float64)  # [M+1]
        f0c = np.where(f0_raw[:M] > 0, f0_raw[:M], 0.0)        # [M]
        prev_raw = np.concatenate(([f0_prev], f0_raw[:M - 1]))
        f0p = np.where(prev_raw > 0, prev_raw, f0c)
        f0n = np.where(f0_raw[1:M + 1] > 0, f0_raw[1:M + 1], f0c)

        ins = dict(
            ampl=np.zeros((MB, K), np.float32),
            phse=np.zeros((MB, K), np.float32),
            mask=np.zeros((MB, K), np.float32),
            dc=np.zeros((MB, 2 * nhop), np.float32),
            psd=np.zeros((MB, conf.npsd), np.float32),
            edc=np.zeros((MB, conf.nchannel), np.float32),
            ea=np.zeros((MB, conf.nchannel, conf.maxnhar_e), np.float32),
            ep=np.zeros((MB, conf.nchannel, conf.maxnhar_e), np.float32),
            noise=np.zeros((MB, 2 * nhop), np.float32),
            voiced=np.zeros((MB,), np.float32))

        # field stacks: one numpy call per field instead of one per
        # (field, frame)
        if self.synth_mode != "pbp":
            ins["ampl"][:M] = np.stack([g["ampl"] for g in grp[:M]])
        ins["mask"][:M] = np.stack([g["mask"] for g in grp[:M]])
        ins["psd"][:M] = np.stack([g["psd"] for g in grp[:M]])
        ins["edc"][:M] = np.stack([g["edc"] for g in grp[:M]])
        ins["ea"][:M] = np.stack([g["eenv_a"] for g in grp[:M]])
        ins["ep"][:M] = np.stack([g["eenv_p"] for g in grp[:M]])
        ins["voiced"][:M] = (f0c > 0).astype(np.float32)

        # dc: the shared batched cycle-offset helper (also backs the
        # per-frame _dc_segment -- one source of truth)
        ins["dc"][:M] = self._dc_segments(nhop, fs, f0p, f0c, f0n)

        # noise: per-block seeded rng via _noise_block (the single owner
        # of the [seed, j] keying + memo), rows = sliding pairs of
        # consecutive blocks
        i0 = self._i
        blocks = np.empty((M + 1, nhop), np.float32)
        for bj, j in enumerate(range(i0 - 1, i0 + M)):
            blocks[bj] = self._noise_block(j)
        flat = blocks.reshape(-1)
        ins["noise"][:M] = np.lib.stride_tricks.sliding_window_view(
            flat, 2 * nhop)[::nhop][:M]

        # phases (+ propagate-mode cycle ramp); the cycle accumulator is
        # inherently sequential but scalar -- the loop below is float
        # math only, no per-frame numpy
        cyc = np.empty((M,), np.float64)
        c = self._cycles
        for j in range(M):
            cyc[j] = c
            c = (c + 0.5 * (f0c[j] + f0n[j]) * conf.thop) % 1.0
        self._cycles = c
        # cast BEFORE adding the f64 ramp: the per-frame path casts phse
        # to f32 first, and bit-identity must hold for f64 user dicts too
        phse = np.stack([g["phse"] for g in grp[:M]]).astype(np.float32,
                                                             copy=False)
        if self.phase_mode == "propagate":
            kh = np.arange(1, K + 1)
            ramp = (2.0 * np.pi) * ((kh[None, :] * cyc[:, None]) % 1.0)
            ins["phse"][:M] = np.where((f0c > 0)[:, None],
                                       phse + ramp, phse)
        else:
            ins["phse"][:M] = phse

        pulse_jobs = []
        if self.synth_mode == "pbp":
            for j in range(M):
                cur = grp[j]
                if f0c[j] > 0 and "vtmagn" in cur:
                    f0cj = float(f0c[j])
                    nxt = grp[j + 1]
                    for oi, fr in self._pulse_onsets(f0cj):
                        v0, v1, w, rd0, rd1, f00, f01 = self._pulse_params(
                            cur, nxt, f0cj, oi, fr)
                        pulse_jobs.append((i0 + j, oi, fr, v0, v1, w,
                                           rd0, rd1, f00, f01))
        return ins, M, pulse_jobs

    @staticmethod
    def _pack_pulse_jobs(conf: ChunkConf, pulse_jobs, budget: int):
        """Pad pulse jobs to a STATIC budget (each distinct pulse count
        would otherwise be a fresh tunnel-slow compile); returns the
        _render_pulses argument arrays."""
        P = len(pulse_jobs)
        assert P <= budget, (P, budget)
        vt0 = np.zeros((budget, conf.nspec), np.float32)
        vt1 = np.zeros((budget, conf.nspec), np.float32)
        wl = np.zeros((budget,), np.float32)
        rdv0 = np.ones((budget,), np.float32)
        rdv1 = np.ones((budget,), np.float32)
        f0v0 = np.full((budget,), 100.0, np.float32)
        f0v1 = np.full((budget,), 100.0, np.float32)
        frv = np.zeros((budget,), np.float32)
        val = np.zeros((budget,), np.float32)
        if P:
            # one stack per field (a per-job loop costs ~5 us x jobs of
            # numpy-call overhead in a many-stream PbP serving tick)
            vt0[:P] = np.stack([pj[3] for pj in pulse_jobs])
            vt1[:P] = np.stack([pj[4] for pj in pulse_jobs])
            wl[:P] = [pj[5] for pj in pulse_jobs]
            rdv0[:P] = [pj[6] for pj in pulse_jobs]
            rdv1[:P] = [pj[7] for pj in pulse_jobs]
            f0v0[:P] = [pj[8] for pj in pulse_jobs]
            f0v1[:P] = [pj[9] for pj in pulse_jobs]
            frv[:P] = [pj[2] for pj in pulse_jobs]
            val[:P] = 1.0
        return vt0, vt1, wl, rdv0, rdv1, f0v0, f0v1, frv, val

    def _add_pulse(self, pulse, onset_pos: int) -> None:
        """OLA one rendered pulse row into the ring.  The row starts
        PULSE_GUARD samples BEFORE the onset (models.pbp convention for
        the fractional-delay kernel's acausal tail); clip the head when
        that reaches before the stream start."""
        from ..models.pbp import PULSE_GUARD
        pos = onset_pos - PULSE_GUARD
        if pos < 0:
            pulse = pulse[-pos:]
            pos = 0
        self.ring.add(pulse, pos)

    def _commit_group(self, segs, M: int, pulses, pulse_jobs) -> None:
        """OLA M rendered segments (+ this group's pulse rows) into the
        ring and finalize readable samples."""
        nhop = self.nhop
        for j in range(M):
            i = self._i
            pos = i * nhop - nhop
            seg = segs[j]
            if pos < 0:
                seg = seg[-pos:]
                pos = 0
            self.ring.add(seg, pos)
            self._i += 1
        for p, (fi, oi, *_rest) in enumerate(pulse_jobs):
            self._add_pulse(pulses[p], fi * nhop + oi)
        # finalize only up to the last rendered frame's CENTER: its
        # trailing half-window still receives the next frame's overlap
        # (matches the per-frame path's advance(i*nhop)); in PbP mode,
        # hold back PULSE_GUARD samples for the next group's guard heads
        self.ring.advance(max(0, (self._i - 1) * nhop - self._adv_lag))

    def _render_block(self, queue) -> None:
        """Render queue[0..-2] (queue[-1] is the lookahead) in chunks of
        feed_block frames per dispatch."""
        conf = self.conf
        MB = self.feed_block
        m = len(queue) - 1
        for s in range(0, m, MB):
            grp = queue[s:min(s + MB, m) + 1]
            f0_prev = self._prev_f0 if s == 0 else queue[s - 1]["f0"]
            ins, M, pulse_jobs = self._assemble_group(grp, f0_prev)
            segs = np.asarray(_render_frames(
                conf, *(jnp.asarray(ins[k]) for k in self._FIELDS)))
            self.dispatches += 1
            pulses = None
            if pulse_jobs:
                args = self._pack_pulse_jobs(conf, pulse_jobs,
                                             self._pulse_budget())
                pulses = np.asarray(_render_pulses(
                    conf, *(jnp.asarray(a) for a in args),
                    self.sopt.pbp_oversample))
                self.dispatches += 1
            self._commit_group(segs, M, pulses, pulse_jobs)

    def _pulse_budget(self) -> int:
        """Static per-block pulse capacity: f0_ceil cycles over
        feed_block hops, plus slack."""
        return int(self.conf.f0_ceil * self.feed_block * self.nhop
                   / self.conf.fs) + 2

    def _pulse_onsets(self, f0c: float):
        """Advance the pulse-cycle accumulator over one hop; return the
        (integer offset, fractional delay) of each onset in the hop."""
        nhop = self.nhop
        fs = self.conf.fs
        c0 = self._pulse_cycles
        hop_cycles = f0c * nhop / fs
        out = []
        n_cross = int(np.floor(c0 + hop_cycles) - np.floor(c0))
        for p in range(n_cross):
            o = (np.ceil(c0) + p - c0) / f0c * fs
            out.append((int(np.floor(o)), float(o - np.floor(o))))
        self._pulse_cycles = (c0 + hop_cycles) % 1.0
        return out

    def flush(self) -> None:
        """Render the last pending frame (constant-F0 extrapolation)."""
        if self._pending is not None:
            self._render(self._pending, self._prev_f0, self._pending["f0"])
            self.ring.advance(self._i * self.nhop)
            self._prev_f0 = self._pending["f0"]
            self._pending = None

    def readable(self) -> int:
        return self.ring.readable()

    def fetch(self, n: int) -> np.ndarray:
        return self.ring.read(n)


def stream_chunk(sopt: SynthesisOptions, chunk: Chunk, block: int = 0,
                 **kw) -> np.ndarray:
    """Convenience: push a whole chunk through the streaming path and
    collect the output (used by tests to compare against the offline
    renderer).  block > 0 feeds `block` frames per feed_many call (the
    low-dispatch path); block == 0 feeds frame by frame."""
    rt = RTSynthesizer(sopt, chunk.conf, capacity_frames=chunk.nfrm + 8, **kw)
    out = []
    if block > 0:
        for s in range(0, chunk.nfrm, block):
            rt.feed_many([chunk.frame(i)
                          for i in range(s, min(s + block, chunk.nfrm))])
            got = rt.fetch(rt.readable())
            if len(got):
                out.append(got)
    else:
        for i in range(chunk.nfrm):
            rt.feed(chunk.frame(i))
            got = rt.fetch(rt.readable())
            if len(got):
                out.append(got)
    rt.flush()
    got = rt.fetch(rt.readable())
    if len(got):
        out.append(got)
    return np.concatenate(out) if out else np.zeros(0, np.float32)
