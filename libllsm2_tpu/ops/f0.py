"""F0 estimation: a pYIN-style tracker in pure JAX.

The reference takes F0 as an *input* to llsm_analyze and obtains it from
the companion libraries libpyin (probabilistic YIN) + libgvps (generalized
Viterbi path search) in its tests/demos (SURVEY.md section 2, libpyin
row).  This module is the rebuild's self-contained equivalent so the
batched corpus config needs no external tracker:

  - YIN difference function for all frames at once (energy terms + one
    batched rfft autocorrelation -- the O(W^2) lag loop becomes FFTs),
  - cumulative-mean-normalized difference (CMNDF),
  - observation probabilities over log-spaced pitch bins + an unvoiced
    state, Viterbi-decoded with a lax.scan (the libgvps analog),
  - parabolic lag refinement.

Everything is static-shape; the whole tracker jits and vmaps over a batch
of utterances.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

from ..fp import FP

from .interp import fetch_frames


class F0Config(NamedTuple):
    fs: float = 16000.0
    nhop: int = 80
    winlen: int = 1024          # analysis window (64 ms @ 16 kHz)
    f0_floor: float = 60.0
    f0_ceil: float = 500.0
    nbins: int = 96             # log-spaced pitch grid for Viterbi
    voicing_threshold: float = 0.45
    transition_semitones: float = 1.2   # stddev of the pitch-jump prior
    switch_penalty: float = 6.0         # -log prob of voicing flips
    hs_weight: float = 5.0      # weight of the harmonic-comb spectral
                                # term in the Viterbi observations
                                # (octave disambiguation; 0 disables)
    hs_harmonics: int = 12      # comb length
    hs_decay: float = 0.9       # per-harmonic comb weight decay
    integration_periods: float = 2.0    # YIN difference-integration span
                                # in periods of f0_floor (0 = legacy
                                # full-window integration, which loses
                                # voicing under F0 glides)


def _difference_function(frames: jnp.ndarray, tau_max: int,
                         span: int | None = None) -> jnp.ndarray:
    """YIN d(tau) for tau in [0, tau_max) for every frame [N, W] at once.

    d(tau) = sum_{j in [s, s+span)} (x_j - x_{j+tau})^2
           = e(s, s+span) + e(s+tau, s+span+tau) - 2*r(tau)
    with running energies e and a cross-correlation r (batched rfft).

    `span` is the fixed integration length (YIN's W'), CENTERED in the
    frame: s = (W - span - tau_max) // 2.  The original full-window form
    (span = W - tau) integrated over ~the whole 64 ms analysis window,
    which destroys periodicity under F0 glides (at 10%/window the lag
    drifts by several samples across the span and the CMNDF minimum
    rises past the voicing threshold: measured voiced-recall collapse to
    ~0.4 on fully voiced glide fixtures).  A ~2-period span matches the
    YIN paper's construction and keeps the lag locally coherent.
    span=None keeps the legacy full-window behavior.
    """
    N, W = frames.shape
    nfft = 1
    while nfft < 2 * W:
        nfft *= 2
    if span is None:
        spec = jnp.fft.rfft(frames, n=nfft)
        r = jnp.fft.irfft(spec * jnp.conj(spec), n=nfft)[:, :tau_max]
        sq = frames**2
        csum = jnp.concatenate(
            [jnp.zeros((N, 1)), jnp.cumsum(sq, axis=-1)], axis=-1)
        tau = jnp.arange(tau_max)
        e0 = jnp.take(csum, W - tau, axis=-1)
        et = csum[:, W:W + 1] - jnp.take(csum, tau, axis=-1)
        return jnp.maximum(e0 + et - 2.0 * r, 0.0)
    span = int(min(span, W - tau_max))
    s = (W - span - tau_max) // 2
    seg = frames[:, s:s + span]
    # r(tau) = sum_j seg_j * frame_{s + j + tau}: cross-correlate the
    # fixed span against the whole frame in the frequency domain
    spec_f = jnp.fft.rfft(frames, n=nfft)
    spec_s = jnp.fft.rfft(seg, n=nfft)
    xc = jnp.fft.irfft(jnp.conj(spec_s) * spec_f, n=nfft)
    r = xc[:, s:s + tau_max]
    sq = frames**2
    csum = jnp.concatenate(
        [jnp.zeros((N, 1)), jnp.cumsum(sq, axis=-1)], axis=-1)
    tau = jnp.arange(tau_max)
    e0 = jnp.sum(seg**2, axis=-1, keepdims=True)
    et = jnp.take(csum, s + span + tau, axis=-1) \
        - jnp.take(csum, s + tau, axis=-1)
    return jnp.maximum(e0 + et - 2.0 * r, 0.0)


def _cmndf(d: jnp.ndarray) -> jnp.ndarray:
    """Cumulative-mean-normalized difference: d'(0)=1,
    d'(tau) = d(tau) * tau / sum_{1..tau} d."""
    tau = jnp.arange(d.shape[-1], dtype=FP)
    csum = jnp.cumsum(d, axis=-1)
    out = d * tau / jnp.maximum(csum, 1e-9)
    return out.at[..., 0].set(1.0)


@functools.partial(jax.jit, static_argnums=0)
def track(cfg: F0Config, x: jnp.ndarray) -> jnp.ndarray:
    """Estimate an F0 track [nfrm] from a signal [nx] (0 = unvoiced).

    nfrm = nx // nhop, frame centers at i*nhop (matching layer-0 analysis).
    """
    fs = cfg.fs
    nhop = cfg.nhop
    nfrm = x.shape[0] // nhop
    centers = jnp.arange(nfrm, dtype=jnp.int32) * nhop
    frames = fetch_frames(x.astype(FP), centers, cfg.winlen // 2)
    frames = frames[:, :cfg.winlen]
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)

    tau_min = int(fs / cfg.f0_ceil)
    tau_max = min(int(fs / cfg.f0_floor) + 2, cfg.winlen - 1)
    span = None
    if cfg.integration_periods > 0.0:
        span = max(int(cfg.integration_periods * fs / cfg.f0_floor),
                   2 * tau_min)
    d = _difference_function(frames, tau_max, span)
    dp = _cmndf(d)                                           # [N, tau_max]

    # observation cost on the log-pitch grid: sample the CMNDF at each
    # bin's (fractional) lag with parabolic interpolation
    f_grid = jnp.exp(jnp.linspace(jnp.log(cfg.f0_floor + 1.0),
                                  jnp.log(cfg.f0_ceil - 1.0), cfg.nbins))
    lag = fs / f_grid                                        # [B]
    i0 = jnp.clip(jnp.floor(lag).astype(jnp.int32), 1, tau_max - 2)
    tfrac = lag - i0
    dp_pad = dp
    g = lambda idx: jnp.take(dp_pad, idx, axis=-1)
    obs = g(i0) * (1.0 - tfrac) + g(i0 + 1) * tfrac          # [N, B]

    # probabilities: low CMNDF -> high voiced likelihood
    beta = 0.1
    logp_v = -obs / beta                                     # [N, B]

    # harmonic-comb spectral score (octave disambiguation; the libgvps
    # Viterbi in the reference consumes pYIN observations only -- under a
    # strong formant at 2*F0 the CMNDF dips at the half/double lag and
    # the tracker octave-errs; a comb over the magnitude spectrum breaks
    # the tie: the true F0's comb catches every harmonic, the octave-up
    # comb misses the odd ones and the octave-down comb averages in the
    # empty midpoints).  TPU-native: sampling |X| at k*f_b is a STATIC
    # linear-interp matrix over the rfft grid -> one [N, nbin] x
    # [nbin, B] matmul, no gathers.
    if cfg.hs_weight > 0.0:
        nfft_hs = 2 * cfg.winlen
        win = jnp.hanning(cfg.winlen).astype(FP)
        mag = jnp.abs(jnp.fft.rfft(frames * win[None, :], n=nfft_hs))
        nbin = nfft_hs // 2 + 1
        df = fs / nfft_hs
        ks = np.arange(1, cfg.hs_harmonics + 1)
        fg = np.exp(np.linspace(np.log(cfg.f0_floor + 1.0),
                                np.log(cfg.f0_ceil - 1.0), cfg.nbins))
        pos = fg[:, None] * ks[None, :] / df                  # [B, Kc]
        wk = cfg.hs_decay ** (ks - 1)
        valid = (fg[:, None] * ks[None, :]) < 0.5 * fs
        i0h = np.clip(np.floor(pos).astype(np.int64), 0, nbin - 2)
        frac = pos - i0h
        comb = np.zeros((nbin, cfg.nbins), np.float32)
        for j in range(cfg.hs_harmonics):
            wv = wk[j] * valid[:, j]
            np.add.at(comb, (i0h[:, j], np.arange(cfg.nbins)),
                      (1.0 - frac[:, j]) * wv)
            np.add.at(comb, (i0h[:, j] + 1, np.arange(cfg.nbins)),
                      frac[:, j] * wv)
        norm = np.maximum((wk[None, :] * valid).sum(axis=1), 1e-6)
        comb = comb / norm[None, :]
        hs = jnp.matmul(mag, jnp.asarray(comb),
                        precision=jax.lax.Precision.HIGHEST)  # [N, B]
        hs_rel = jnp.log(hs + 1e-9) \
            - jnp.log(jnp.max(hs, axis=-1, keepdims=True) + 1e-9)
        logp_v = logp_v + cfg.hs_weight * hs_rel
    best = jnp.min(obs, axis=-1, keepdims=True)
    logp_u = -cfg.voicing_threshold / beta * jnp.ones_like(best)

    logobs = jnp.concatenate([logp_v, logp_u], axis=-1)      # [N, B+1]

    # transition: gaussian prior on semitone jumps + voicing switch penalty
    semi = 12.0 * jnp.log2(f_grid[None, :] / f_grid[:, None])
    lt_vv = -(semi**2) / (2.0 * cfg.transition_semitones**2)
    B = cfg.nbins
    lt = jnp.full((B + 1, B + 1), -cfg.switch_penalty)
    lt = lt.at[:B, :B].set(lt_vv)
    lt = lt.at[B, B].set(0.0)
    lt = lt - jax.scipy.special.logsumexp(lt, axis=1, keepdims=True)

    # Viterbi forward (the libgvps analog: generalized on-line path search
    # becomes one lax.scan with static [B+1] state)
    def fwd(score, lo):
        cand = score[:, None] + lt                           # [B+1, B+1]
        best_prev = jnp.argmax(cand, axis=0)                 # [B+1]
        score_new = jnp.max(cand, axis=0) + lo
        score_new = score_new - jnp.max(score_new)           # renormalize
        return score_new, best_prev

    init = logobs[0] - jnp.max(logobs[0])
    final, back = jax.lax.scan(fwd, init, logobs[1:])

    # backtrace (reverse scan)
    last = jnp.argmax(final)

    def bwd(state, bp):
        prev = bp[state]
        return prev, prev

    _, path_rev = jax.lax.scan(bwd, last, back, reverse=True)
    path = jnp.concatenate([path_rev, jnp.array([last])])    # [N]

    voiced = path < B
    bin_idx = jnp.clip(path, 0, B - 1)

    # refine: parabolic interpolation of the CMNDF around the decoded lag
    lag_sel = jnp.take(lag, bin_idx)
    i0 = jnp.clip(jnp.round(lag_sel).astype(jnp.int32), 1, tau_max - 2)
    take = lambda idx: jnp.take_along_axis(dp, idx[:, None], axis=-1)[:, 0]
    a, b, c = take(i0 - 1), take(i0), take(i0 + 1)
    denom = a - 2.0 * b + c
    delta = jnp.where(jnp.abs(denom) > 1e-12,
                      jnp.clip(0.5 * (a - c) / denom, -1.0, 1.0), 0.0)
    lag_ref = i0.astype(FP) + delta
    f0 = fs / jnp.maximum(lag_ref, 1.0)
    f0 = jnp.clip(f0, cfg.f0_floor, cfg.f0_ceil)
    return jnp.where(voiced, f0, 0.0)


def track_batch(cfg: F0Config, xs: jnp.ndarray) -> jnp.ndarray:
    """vmapped tracker for a padded batch [B, nx] -> [B, nfrm]."""
    return jax.vmap(lambda x: track(cfg, x))(xs)
