"""STFT / iSTFT (reference: ciglet.h -> stft/istft) plus DCT and Hilbert
envelope -- completing the reference's general-DSP surface in batched,
static-shape TPU form."""
from __future__ import annotations

import jax.numpy as jnp

from .spectral import next_pow2


def stft(x: jnp.ndarray, nwin: int, nhop: int, nfft: int | None = None):
    """[..., nx] -> complex [..., nfrm, nfft//2+1], Hann window, centers at
    i*nhop (zero-padded edges, matching the analysis frame grid)."""
    nfft = nfft or next_pow2(nwin)
    nx = x.shape[-1]
    nfrm = nx // nhop
    half = nwin // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(half, half + nwin)])
    idx = (jnp.arange(nfrm) * nhop)[:, None] + jnp.arange(nwin)[None, :]
    frames = xp[..., idx]                          # [..., nfrm, nwin]
    w = jnp.hanning(nwin).astype(x.dtype)
    return jnp.fft.rfft(frames * w, n=nfft)


def istft(spec: jnp.ndarray, nwin: int, nhop: int, nx: int) -> jnp.ndarray:
    """Inverse STFT with Hann synthesis window + COLA normalization."""
    frames = jnp.fft.irfft(spec)[..., :nwin]
    w = jnp.hanning(nwin).astype(frames.dtype)
    frames = frames * w
    nfrm = spec.shape[-2]
    half = nwin // 2
    total = nfrm * nhop + nwin
    y = jnp.zeros(spec.shape[:-2] + (total,), frames.dtype)
    wsum = jnp.zeros(total, frames.dtype)
    starts = jnp.arange(nfrm) * nhop
    idx = starts[:, None] + jnp.arange(nwin)[None, :]
    y = y.at[..., idx.reshape(-1)].add(
        frames.reshape(frames.shape[:-2] + (-1,)))
    wsum = wsum.at[idx.reshape(-1)].add(jnp.tile(w**2, nfrm))
    y = y / jnp.maximum(wsum, 1e-8)
    return y[..., half:half + nx]


def dct(x: jnp.ndarray, norm: str = "ortho") -> jnp.ndarray:
    """DCT-II along the last axis via rfft of the even extension
    (reference: ciglet dct)."""
    n = x.shape[-1]
    v = jnp.concatenate([x[..., ::2], x[..., 1::2][..., ::-1]], axis=-1)
    V = jnp.fft.fft(v)
    k = jnp.arange(n)
    factor = 2.0 * jnp.exp(-1j * jnp.pi * k / (2.0 * n))
    out = (V * factor).real
    if norm == "ortho":
        scale = jnp.full((n,), jnp.sqrt(0.5 / n)).at[0].set(jnp.sqrt(0.25 / n))
        out = out * scale
    return out


def hilbert_envelope(x: jnp.ndarray) -> jnp.ndarray:
    """|analytic signal| along the last axis (reference: ciglet hilbert)."""
    n = x.shape[-1]
    nfft = next_pow2(n)
    X = jnp.fft.fft(x, n=nfft)
    f = jnp.fft.fftfreq(nfft)
    m = jnp.where(f > 0, 2.0, jnp.where(f == 0, 1.0, 0.0))
    return jnp.abs(jnp.fft.ifft(X * m))[..., :n]
