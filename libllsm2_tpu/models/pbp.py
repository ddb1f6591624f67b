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
    nfft = conf.nfft_spec
    nspec = conf.nspec
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
    rd_p = lerp(chunk.rd)

    # complex VT spectrum per frame (computed once, lerped per pulse)
    vt_spec = spectral.minphase_spectrum(chunk.vtmagn)         # [N, nspec]
    vt_p = lerp(vt_spec)                                       # [P, nspec]

    fbins = jnp.linspace(0.0, fs / 2.0, nspec)
    lip = (2.0 * jnp.pi * jnp.maximum(fbins, 1e-3)
           * conf.lip_radius / layer1.SPEED_OF_SOUND) * jnp.exp(
               1j * jnp.pi / 2.0).astype(CP)

    params = lf.lf_from_rd(rd_p)                               # batched [P]
    f_norm = fbins[None, :] * period[:, None]                  # [P, nspec]
    src = lf.lf_spectrum(f_norm, jax.tree.map(lambda a: a[:, None], params))
    # normalize the source so the fundamental has unit magnitude, matching
    # the layer-1 convention (layer1._source_tables)
    src1 = lf.lf_spectrum(jnp.ones_like(period),
                          jax.tree.map(lambda a: a, params))
    src = src / jnp.maximum(jnp.abs(src1)[:, None], 1e-12)

    # sub-sample alignment: linear phase for the fractional onset delay
    onset_samples = t_on * fs
    onset_int = jnp.floor(onset_samples).astype(jnp.int32)
    frac = (onset_samples - onset_int)[:, None]
    delay = jnp.exp((-2j * jnp.pi) * fbins[None, :] / fs * frac)

    # Continuous-time pulse FT P(f) = (T/2) * A(f) * e^{j phase} gives a
    # periodic train with one-sided harmonic amplitudes A(k f0); sampling
    # p[m] = fs * irfft(P(f_b)) converts the FT to the discrete grid.
    pulse_spec = (period[:, None] / 2.0 * fs) * vt_p * src * lip[None, :] \
        * delay
    pulses = jnp.fft.irfft(pulse_spec, n=nfft)
    pulses = pulses * valid[:, None]

    idx = onset_int[:, None] + jnp.arange(nfft)[None, :]
    idx = jnp.clip(idx, 0, nx + nfft - 1)
    y_sin = jnp.zeros(nx + nfft, FP).at[idx.reshape(-1)].add(
        pulses.reshape(-1))[:nx]

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
