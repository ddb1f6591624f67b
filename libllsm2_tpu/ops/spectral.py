"""Spectral primitives: chirp-Z transform, quadratic peak interpolation,
minimum-phase reconstruction (reference: ciglet.h -> czt/iczt, qifft,
minphase).  Everything is static-shape and vmap-safe; phase terms are
range-reduced to cycles-mod-1 before trig so float32 stays accurate on TPU
(chirp phases grow as n^2; see SURVEY.md section 7 "Hard parts").
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fp import CP, FP


def next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _chirp(idx: jnp.ndarray, f_step) -> jnp.ndarray:
    """exp(-1j * pi * f_step * idx^2) with phase range-reduced in cycles.

    idx must be integer-valued and |idx|^2 < 2^24 so the square is exact in
    float32.
    """
    ph = 0.5 * f_step * (idx.astype(FP) ** 2)
    ph = ph - jnp.round(ph)
    return jnp.exp(-2j * jnp.pi * ph.astype(FP))


def czt(x: jnp.ndarray, m: int, f_step) -> jnp.ndarray:
    """Chirp-Z transform along the last axis (Bluestein's algorithm).

    Evaluates S_k = sum_n x_n exp(-2j pi f_step k n) for k = 0..m-1, i.e.
    the DTFT sampled at frequencies k * f_step (in cycles/sample).
    `f_step` may be a traced scalar (pitch-synchronous zoom).  Three FFTs of
    static size; jit/vmap-safe.  Reference: ciglet.h -> czt.
    """
    n = x.shape[-1]
    L = next_pow2(n + m - 1)
    nn = jnp.arange(n)
    kk = jnp.arange(L)
    u = x.astype(CP) * _chirp(nn, f_step)
    # v_j = w^{-j^2/2} arranged circularly so that (u * v)[k] gives the sum.
    j_idx = jnp.where(kk < m, kk, jnp.where(kk >= L - n + 1, kk - L, 0))
    v = jnp.conj(_chirp(j_idx, f_step))
    U = jnp.fft.fft(u, n=L)
    V = jnp.fft.fft(v, n=L)
    conv = jnp.fft.ifft(U * V)[..., :m]
    return conv * _chirp(jnp.arange(m), f_step)


def iczt(X: jnp.ndarray, f_step) -> jnp.ndarray:
    """Inverse chirp-Z transform for the full-circle case (reference:
    ciglet.h -> iczt): x_n = (1/M) sum_k X_k exp(+2j pi f_step k n),
    which inverts czt() exactly when M * f_step == 1 (uniform DFT-like
    sampling; for partial-circle zooms the forward transform is not
    square-invertible)."""
    m = X.shape[-1]
    return jnp.conj(czt(jnp.conj(X), m, f_step)) / m


def qifft(logmag: jnp.ndarray, k: jnp.ndarray):
    """Quadratic interpolation of a spectral peak at integer bin k
    (reference: ciglet.h -> qifft).  Returns (refined_bin, refined_logmag).
    Operates on the last axis; k is clamped to the valid interior."""
    n = logmag.shape[-1]
    k = jnp.clip(k, 1, n - 2)
    a = jnp.take_along_axis(logmag, (k - 1)[..., None], axis=-1)[..., 0]
    b = jnp.take_along_axis(logmag, k[..., None], axis=-1)[..., 0]
    c = jnp.take_along_axis(logmag, (k + 1)[..., None], axis=-1)[..., 0]
    denom = a - 2.0 * b + c
    p = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (a - c) / denom, 0.0)
    p = jnp.clip(p, -0.5, 0.5)
    return k + p, b - 0.25 * (a - c) * p


def spec_to_cepstrum(logmag: jnp.ndarray) -> jnp.ndarray:
    """Real cepstrum from a log-magnitude half-spectrum (nfft//2+1 bins)
    (reference: ciglet.h -> spec2cepstrum)."""
    nspec = logmag.shape[-1]
    return jnp.fft.irfft(logmag, n=2 * (nspec - 1))


def cepstrum_to_spec(ceps: jnp.ndarray) -> jnp.ndarray:
    """Log-magnitude half-spectrum from a real cepstrum (reference:
    ciglet.h -> cepstrum2spec).  Truncate/lifter the cepstrum before
    calling to smooth the envelope."""
    return jnp.fft.rfft(ceps).real


def minphase_phase(logmag: jnp.ndarray) -> jnp.ndarray:
    """Minimum-phase response from a log-magnitude half-spectrum.

    logmag has nspec = nfft//2+1 bins on the rfft grid.  Returns the phase
    (radians) of the minimum-phase system with that magnitude, computed via
    the folded real cepstrum (reference: ciglet.h -> minphase).
    """
    nspec = logmag.shape[-1]
    nfft = 2 * (nspec - 1)
    ceps = jnp.fft.irfft(logmag, n=nfft)
    fold = jnp.concatenate(
        [
            ceps[..., :1],
            2.0 * ceps[..., 1 : nfft // 2],
            ceps[..., nfft // 2 : nfft // 2 + 1],
            jnp.zeros_like(ceps[..., nfft // 2 + 1 :]),
        ],
        axis=-1,
    )
    return jnp.fft.rfft(fold).imag


def minphase_spectrum(logmag: jnp.ndarray) -> jnp.ndarray:
    """Complex minimum-phase half-spectrum exp(logmag + i*minphase)."""
    return jnp.exp(logmag.astype(CP) + 1j * minphase_phase(logmag))


def upsample_linear(v: jnp.ndarray, os: int) -> jnp.ndarray:
    """Linearly upsample the last axis by an integer factor: `n` points
    -> `os*(n-1)+1` points spanning the same interval, EXACT at the
    original points.  Gather-free (reshape of per-cell lerps).

    Used by the pulse-by-pulse renderers to evaluate the vocal-tract
    envelope (log magnitude and minimum phase separately) on the
    os-times-finer pulse-spectrum grid with the SAME linear
    interpolation chunk_to_layer0 uses at the harmonic frequencies --
    the layer-1 fixed-point correction guarantees linear interpolation
    reproduces the measured harmonic amplitudes; cepstral/sinc
    interpolation deviates 3-9% near formants (tests/test_pbp.py)."""
    if os == 1:
        return v
    d = jnp.diff(v, axis=-1)                        # [..., n-1]
    a = jnp.arange(os, dtype=v.dtype) / os          # [os]
    seg = v[..., :-1, None] + d[..., None] * a      # [..., n-1, os]
    return jnp.concatenate(
        [seg.reshape(v.shape[:-1] + (-1,)), v[..., -1:]], axis=-1)


def periodogram(frames: jnp.ndarray, window: jnp.ndarray, nfft: int) -> jnp.ndarray:
    """Windowed periodogram, power-per-bin convention normalized by sum(w^2)
    so that unit-variance white noise gives a flat PSD of 1."""
    wsumsq = jnp.sum(window**2)
    spec = jnp.fft.rfft(frames * window, n=nfft)
    return (spec.real**2 + spec.imag**2) / jnp.maximum(wsumsq, 1e-12)


def instantaneous_frequency(x: jnp.ndarray, centers: jnp.ndarray,
                            freqs: jnp.ndarray, *, fs: float,
                            halfwidth: jnp.ndarray,
                            halfwin_max: int) -> jnp.ndarray:
    """Instantaneous frequency of the component nearest freqs[i] at each
    centers[i] (reference: ciglet.h -> ifdetector / cig_ifdetector).

    Flanagan's derivative-window estimator: with a Hann analysis window h
    and its time derivative h', the IF at analysis frequency f is

        f_inst = f - fs/(2 pi) * Im{X_hd * conj(X_h)} / |X_h|^2

    where X_h / X_hd are windowed DTFT values of x at f using h / h'.
    All frames evaluate in one batched contraction (no per-frame loop);
    window length is pitch-synchronous via the per-frame halfwidth, as in
    the reference's make_ifdetector sizing.

    Args:
      x: [nx] signal.
      centers: [N] integer sample positions.
      freqs: [N] analysis frequencies in Hz (e.g. a coarse F0 track).
      halfwidth: [N] window half-length in samples (~ fs/freq * cycles).
      halfwin_max: static bound on halfwidth.
    Returns: [N] refined frequencies in Hz.
    """
    H = int(halfwin_max)
    W = 2 * H + 1
    n_off = jnp.arange(W, dtype=FP) - H
    xp = jnp.pad(jnp.asarray(x, FP), (H, H + 1))
    idx = centers[:, None] + jnp.arange(W)[None, :]
    frames = xp[idx]                                        # [N, W]

    hw = jnp.clip(jnp.asarray(halfwidth, FP), 2.0, float(H))
    r = n_off[None, :] / hw[:, None]
    inside = (jnp.abs(r) <= 1.0).astype(FP)
    h = (0.5 + 0.5 * jnp.cos(jnp.pi * r)) * inside
    hd = (-0.5 * jnp.pi / hw[:, None]) * jnp.sin(jnp.pi * r) * inside

    ph = (freqs / fs)[:, None] * n_off[None, :]
    ph = 2.0 * jnp.pi * (ph - jnp.round(ph))
    c, s = jnp.cos(ph), jnp.sin(ph)
    xr = frames * c
    xi = -frames * s
    re_h = jnp.sum(xr * h, axis=-1)
    im_h = jnp.sum(xi * h, axis=-1)
    re_d = jnp.sum(xr * hd, axis=-1)
    im_d = jnp.sum(xi * hd, axis=-1)
    num = im_d * re_h - re_d * im_h                 # Im{X_hd * conj(X_h)}
    den = jnp.maximum(re_h ** 2 + im_h ** 2, 1e-20)
    return freqs - fs / (2.0 * jnp.pi) * num / den
