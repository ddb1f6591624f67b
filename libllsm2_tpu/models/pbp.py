"""Pulse-by-pulse (PbP) synthesis: render each glottal pulse from the LF
model through the vocal-tract filter (reference: llsmrt.c PbP mode --
SURVEY.md 3.4; BASELINE config 3).

The reference tracks a pulse-phase accumulator sample by sample and fires
a pulse render at every cycle wrap -- inherently data-dependent control
flow.  The TPU-native form precomputes a static maximum pulse budget
(duration * conf.f0_ceil), derives every pulse onset by inverting the
piecewise-linear cumulative-cycle function (a batched interp, no loop),
renders all pulses as one batched spectral-domain synthesis
(LF spectrum x lip radiation x VT minimum-phase envelope -> irfft), and
scatter-adds them at their (sub-sample corrected) onsets with validity
masks.  The noise path is shared with layer-0 synthesis.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fp import CP, FP

from ..config import SynthesisOptions
from ..container import Chunk
from ..ops import harmonics, lf, spectral
from . import layer1
from .layer0 import SynthResult, _synth_noise

# guard samples between the irfft window start and each pulse onset: room
# for the fractional-delay interpolation kernel's acausal tail (shared by
# the offline and streaming pulse renderers)
PULSE_GUARD = 64


def _pulse_onsets(f0: jnp.ndarray, thop: float, p_max: int):
    """Onset times (seconds) of each glottal cycle and validity mask.

    Integrates F0 over frames (trapezoid-free: F0 held per frame), then
    inverts the monotone piecewise-linear cycle count at integers 0..p_max-1.
    """
    n = f0.shape[0]
    d = jnp.where(f0 > 0, f0, 0.0) * thop
    cum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(d)])        # [n+1]
    t_knots = jnp.arange(n + 1, dtype=FP) * thop
    # strictly increasing copy for inversion (flat = unvoiced -> tiny slope)
    cum_inv = cum + jnp.arange(n + 1, dtype=FP) * 1e-6
    p_idx = jnp.arange(p_max, dtype=FP)
    t_on = jnp.interp(p_idx, cum_inv, t_knots)
    valid = p_idx < cum[-1]
    # pulses must land in voiced frames
    frame_of = jnp.clip((t_on / thop).astype(jnp.int32), 0, n - 1)
    valid = valid & (f0[frame_of] > 0)
    return t_on, frame_of, valid


@functools.partial(jax.jit, static_argnums=0)
def _pbp_jit(opt: SynthesisOptions, chunk: Chunk) -> SynthResult:
    conf = chunk.conf
    nhop = conf.nhop
    n = chunk.nfrm
    nx = n * nhop
    os_ = max(int(opt.pbp_oversample), 1)
    nfft = os_ * conf.nfft_spec
    nspec = os_ * (conf.nspec - 1) + 1
    fs = conf.fs

    p_max = int(n * conf.thop * conf.f0_ceil) + 2
    t_on, frame_of, valid = _pulse_onsets(chunk.f0, conf.thop, p_max)

    # Per-pulse parameters: LINEAR interpolation between frame centers at
    # the pulse onset, matching the sinusoidal render's OLA crossfade of
    # adjacent frames (a nearest-frame staircase measured ~5 dB worse on
    # the re-analyzed harmonic-amplitude-track parity oracle,
    # tests/test_pbp.py).  Falls back to the onset frame's value where
    # either neighbor is unvoiced (lerping across a voicing boundary
    # would drag F0/Rd toward garbage).
    # sample point = pulse onset (a pulse-center sample point at
    # t_on + T/2 measured WORSE: track SNR 19.0 vs 22.4)
    fr = t_on / conf.thop
    i0 = jnp.clip(jnp.floor(fr).astype(jnp.int32), 0, n - 2)
    # clamp: when i0 clips at n-2 the raw weight exceeds 1 and would
    # EXTRAPOLATE past the last frame
    wln = jnp.clip(fr - i0.astype(FP), 0.0, 1.0)[:, None]
    both_v = ((chunk.f0[i0] > 0) & (chunk.f0[i0 + 1] > 0))[:, None]

    def lerp(v):
        v2 = v.reshape(n, -1)
        smooth = (1.0 - wln) * v2[i0] + wln * v2[i0 + 1]
        return jnp.where(both_v, smooth, v2[frame_of]).reshape(
            (t_on.shape[0],) + v.shape[1:])

    f0_p = jnp.maximum(lerp(chunk.f0), 1e-2)
    period = 1.0 / f0_p                                        # [P] seconds

    fbins = jnp.linspace(0.0, fs / 2.0, nspec)
    lip = (2.0 * jnp.pi * jnp.maximum(fbins, 1e-3)
           * conf.lip_radius / layer1.SPEED_OF_SOUND) * jnp.exp(
               1j * jnp.pi / 2.0).astype(CP)

    # Per-frame COMBINED source-x-tract complex spectrum, lerped per pulse
    # (spec_frames below).  Two measured design rules:
    #
    # 1. Lerp the COMBINED spectrum, never (rd lerp, vt lerp) separately:
    #    vtmagn embeds -src_logmag(rd_n) at the frame's own rd, so any
    #    per-frame rd ERROR cancels exactly when the frame's own source
    #    multiplies it back -- but a lerped rd's source does NOT cancel
    #    either endpoint's embedded inverse.  On out-of-model sources
    #    (non-LF excitation: no true rd exists) the phase-deviation fit
    #    rails between the grid edges frame to frame, and the
    #    rd-lerp render lost ~9 dB of harmonic-track parity vs the
    #    sinusoidal render at those transitions (tests/test_pbp.py).
    #    Lerping the combined spectra reduces rd flips to a crossfade of
    #    two individually-correct spectra -- the same crossfade the
    #    sinusoidal OLA performs.
    #
    # 2. Sample the envelope by LINEAR interpolation of the log magnitude
    #    and of the coarse-grid minimum phase onto the os-times-finer
    #    grid, exactly as chunk_to_layer0 evaluates harmonics: the
    #    fixed-point correction in chunk_to_layer1 guarantees *linear*
    #    interpolation reproduces the measured amplitudes; cepstral/sinc
    #    interpolation deviates 3-9% near formants (48% of the round-3
    #    parity error sat in ONE formant-adjacent harmonic).  The irfft
    #    grid's own Dirichlet interpolation then only bridges the
    #    os-times-finer cells (os=4 default: sub-1% residual).
    f0_fr = jnp.maximum(chunk.f0, 1e-2)                        # [N]
    params_f = lf.lf_from_rd(chunk.rd)                         # batched [N]
    src_f = lf.lf_spectrum(fbins[None, :] / f0_fr[:, None],
                           jax.tree.map(lambda a: a[:, None], params_f))
    # normalize the source so the fundamental has unit magnitude, matching
    # the layer-1 convention (layer1._source_tables)
    src1_f = lf.lf_spectrum(jnp.ones_like(f0_fr), params_f)
    src_f = src_f / jnp.maximum(jnp.abs(src1_f)[:, None], 1e-12)
    vt_f = jnp.exp(
        spectral.upsample_linear(chunk.vtmagn, os_).astype(CP)
        + 1j * spectral.upsample_linear(
            spectral.minphase_phase(chunk.vtmagn), os_))       # [N, nspec]
    spec_frames = vt_f * src_f
    spec_p = lerp(spec_frames)                                 # [P, nspec]

    # sub-sample alignment: linear phase for the fractional onset delay,
    # PLUS a GUARD shift of C samples.  The fractional-delay Dirichlet
    # kernel is two-sided; without the guard its acausal tail wraps
    # around the irfft window and gets scatter-placed a full nfft LATE --
    # measured on a unit pulse train (vt = src = 1, f0 = 134): harmonic
    # amplitudes wobbled +17% / -4% and collapsed to 0.68 by k = 50;
    # with C = 64 the train is flat to ~1% (the tail still truncates at
    # -46 dB ~ 1/(pi*C)).  (The dominant parity error was the Rd fit's
    # theta-grid quantization, fixed in layer1.fit_rd_phase; this guard
    # removes the next-largest render artifact.)
    GUARD = PULSE_GUARD
    onset_samples = t_on * fs
    onset_int = jnp.floor(onset_samples).astype(jnp.int32)
    frac = (onset_samples - onset_int)[:, None]
    delay = jnp.exp((-2j * jnp.pi) * fbins[None, :] / fs * (frac + GUARD))

    # Continuous-time pulse FT P(f) = (T/2) * A(f) * e^{j phase} gives a
    # periodic train with one-sided harmonic amplitudes A(k f0); sampling
    # p[m] = fs * irfft(P(f_b)) converts the FT to the discrete grid.
    pulse_spec = (period[:, None] / 2.0 * fs) * spec_p * lip[None, :] \
        * delay
    pulses = jnp.fft.irfft(pulse_spec, n=nfft)
    pulses = pulses * valid[:, None]

    # pulse sample m sits at real position onset_int - GUARD + m; scatter
    # into a GUARD-shifted buffer so indices stay non-negative, then
    # slice the real range
    idx = onset_int[:, None] + jnp.arange(nfft)[None, :]
    idx = jnp.clip(idx, 0, nx + GUARD + nfft - 1)
    y_sin = jnp.zeros(nx + GUARD + nfft, FP).at[idx.reshape(-1)].add(
        pulses.reshape(-1))[GUARD:GUARD + nx]

    key = jax.random.PRNGKey(opt.noise_seed)
    cyc = harmonics.sample_cycles(chunk.f0, nhop, fs, nx)
    y_nos = _synth_noise(chunk, cyc, nx, key, fs, nhop,
                         use_pallas=opt.use_pallas,
                         idft=opt.noise_idft)
    return SynthResult(y=y_sin + y_nos, y_sin=y_sin, y_nos=y_nos, fs=fs)


def pbp_synthesize(opt: SynthesisOptions, chunk: Chunk) -> SynthResult:
    """Pulse-by-pulse synthesis from a layer-1 chunk (reference: llsmrt.c
    PbP mode; higher quality under aggressive Rd/F0 edits than the
    sinusoidal path)."""
    assert chunk.has_layer1, "PbP synthesis requires layer-1 parameters"
    return _pbp_jit(opt, chunk)
