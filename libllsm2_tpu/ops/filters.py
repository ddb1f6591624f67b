"""Filtering primitives (reference: ciglet.h -> winfir/fir1, conv,
biquads, filtfilt, levinson/LPC).  TPU-native forms: FIR via FFT overlap
(one batched rfft product), IIR biquads via lax.scan (the only truly
sequential op -- used off the hot path), Levinson-Durbin via lax.scan with
static order."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fp import FP

from .spectral import next_pow2


def fir1_bandpass(numtaps: int, lo: float, hi: float, fs: float,
                  window: str = "hamming") -> jnp.ndarray:
    """Window-method linear-phase bandpass FIR (reference: ciglet fir1).
    lo=0 gives lowpass, hi=fs/2 gives highpass."""
    from .windows import window_eval

    n = jnp.arange(numtaps, dtype=FP) - (numtaps - 1) / 2.0
    f1, f2 = lo / fs * 2.0, hi / fs * 2.0     # normalized to Nyquist=1

    def sinc_lp(fc):
        return jnp.where(jnp.abs(n) < 1e-9, fc,
                         jnp.sin(jnp.pi * fc * n) / (jnp.pi * n))

    h = sinc_lp(f2) - sinc_lp(f1)
    w = window_eval(window, jnp.arange(numtaps) / (numtaps - 1.0))
    h = h * w
    # normalize passband center gain
    fc = 0.5 * (f1 + f2)
    ref = jnp.sum(h * jnp.cos(jnp.pi * fc * n))
    return h / jnp.maximum(jnp.abs(ref), 1e-9)


def fftfilt(h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Linear convolution via FFT, same length as x (causal, like the
    reference's conv + truncation)."""
    n = x.shape[-1]
    m = h.shape[-1]
    nfft = next_pow2(n + m - 1)
    X = jnp.fft.rfft(x, n=nfft)
    H = jnp.fft.rfft(h, n=nfft)
    y = jnp.fft.irfft(X * H, n=nfft)
    return y[..., :n]


def biquad(x: jnp.ndarray, b, a) -> jnp.ndarray:
    """Direct-form-II-transposed second-order section via lax.scan
    (reference: ciglet biquad filters).  b = (b0,b1,b2), a = (1,a1,a2)."""
    b0, b1, b2 = [FP(v) for v in b]
    _, a1, a2 = [FP(v) for v in a]

    def step(carry, xn):
        z1, z2 = carry
        yn = b0 * xn + z1
        z1n = b1 * xn - a1 * yn + z2
        z2n = b2 * xn - a2 * yn
        return (z1n, z2n), yn

    _, y = jax.lax.scan(step, (FP(0), FP(0)), x)
    return y


def filtfilt_biquad(x: jnp.ndarray, b, a) -> jnp.ndarray:
    """Zero-phase forward-backward biquad (reference: ciglet filtfilt)."""
    y = biquad(x, b, a)
    y = biquad(y[::-1], b, a)[::-1]
    return y


def levinson(r: jnp.ndarray, order: int):
    """Levinson-Durbin recursion (reference: ciglet levinson): toeplitz
    solve of the normal equations from autocorrelation r[0..order].
    Returns (lpc coefficients a[order+1] with a[0]=1, prediction error)."""
    a = jnp.zeros(order + 1).at[0].set(1.0)
    err = r[0]

    def step(carry, i):
        a, err = carry
        idx = jnp.arange(order + 1)
        # acc = sum_{j=1..i-1} a[j] * r[i-j]
        rj = jnp.where((idx >= 1) & (idx <= i - 1),
                       r[jnp.clip(i - idx, 0, order)], 0.0)
        acc = jnp.sum(a * rj)
        k = -(r[i] + acc) / jnp.maximum(err, 1e-12)
        rev = jnp.where((idx >= 1) & (idx <= i - 1),
                        a[jnp.clip(i - idx, 0, order)], 0.0)
        a_new = a + k * rev
        a_new = a_new.at[i].set(k)
        a_new = jnp.where(idx <= i, a_new, 0.0).at[0].set(1.0)
        err_new = err * (1.0 - k * k)
        return (a_new, err_new), None

    (a, err), _ = jax.lax.scan(step, (a, err),
                               jnp.arange(1, order + 1))
    return a, err


def lpc_from_signal(x: jnp.ndarray, order: int):
    """LPC coefficients from a (windowed) signal frame via FFT
    autocorrelation + Levinson (reference: ciglet lpc)."""
    n = x.shape[-1]
    nfft = next_pow2(2 * n)
    spec = jnp.fft.rfft(x, n=nfft)
    r = jnp.fft.irfft(spec * jnp.conj(spec), n=nfft)[: order + 1]
    return levinson(r, order)


def lpc_spectrum(a: jnp.ndarray, gain, nbins: int) -> jnp.ndarray:
    """Magnitude spectrum of the all-pole LPC model on nbins rfft bins."""
    order = a.shape[-1] - 1
    nfft = 2 * (nbins - 1)
    A = jnp.fft.rfft(a, n=nfft)
    return jnp.sqrt(jnp.maximum(gain, 1e-12)) / jnp.maximum(
        jnp.abs(A), 1e-9)
