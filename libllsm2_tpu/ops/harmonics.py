"""Harmonic analysis and additive (oscillator-bank) synthesis.

The reference estimates per-frame harmonic amplitude/phase with a
pitch-synchronous window and either a chirp-Z zoom or FFT peak-picking
(reference: dsputils.c -> the llsm_harmonic_* CZT and peak-picking paths,
layer0.c -> the per-frame analysis loop).  The TPU-native form evaluates
the windowed DTFT *exactly* at the harmonic frequencies (k+1)*f0 for every
frame at once: the whole frame loop becomes one batched contraction that
XLA tiles onto the MXU; phase arguments are range-reduced to cycles-mod-1
so float32 stays accurate.

Key accuracy property: the pitch-synchronous cosine-family window of length
rel_winsize periods puts its spectral zeros exactly on neighboring
harmonics, so adjacent-harmonic leakage is near zero even in one pass --
this is the same reason the reference sizes windows by 1/F0.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .windows import window_centered


def _phase_cycles(kn: jnp.ndarray, f_over_fs: jnp.ndarray) -> jnp.ndarray:
    """(k*n) * f/fs reduced to [-0.5, 0.5) cycles. kn integer-valued."""
    ph = kn * f_over_fs
    return ph - jnp.round(ph)


def harmonic_analysis(
    x: jnp.ndarray,
    f0: jnp.ndarray,
    centers: jnp.ndarray,
    *,
    fs: float,
    max_k: int,
    halfwin_max: int,
    rel_winsize: float,
    fnyq: float,
    window: str = "hanning",
    chunk: int = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Estimate harmonic amplitudes/phases for every frame.

    Args:
      x: [nx] signal.
      f0: [N] per-frame F0 in Hz (0 = unvoiced; a placeholder is used
          internally and the outputs are masked to zero).
      centers: [N] integer frame centers in samples.
      max_k: number of harmonics (slot k = harmonic (k+1)*f0).
    Returns:
      ampl [N, max_k], phse [N, max_k] (phase at the frame center),
      mask [N, max_k] (1 where the harmonic exists: voiced and below fnyq).
    """
    H = halfwin_max
    W = 2 * H + 1
    n_off = jnp.arange(W, dtype=jnp.float32) - H
    kharm = jnp.arange(1, max_k + 1, dtype=jnp.float32)

    voiced = f0 > 0.0
    f0s = jnp.where(voiced, f0, 100.0)
    halfwidth = jnp.clip(rel_winsize * fs / (2.0 * f0s), 2.0, float(H))
    mask = voiced[:, None] & (kharm[None, :] * f0s[:, None] < fnyq)

    xp = jnp.pad(x, (H, H + 1)).astype(jnp.float32)

    def per_chunk(args):
        c_centers, c_f0, c_hw = args
        idx = c_centers[:, None] + jnp.arange(W)[None, :]
        frames = xp[idx]                                     # [C, W]
        w = window_centered(window, n_off[None, :], c_hw[:, None])  # [C, W]
        xw = frames * w
        f_over_fs = (c_f0 / fs)[:, None, None]               # [C,1,1]
        kn = kharm[None, :, None] * n_off[None, None, :]     # [1,K,W]
        ph = _phase_cycles(kn, f_over_fs)                    # [C,K,W]
        arg = (2.0 * jnp.pi) * ph
        re = jnp.einsum("ckw,cw->ck", jnp.cos(arg), xw)
        im = jnp.einsum("ckw,cw->ck", -jnp.sin(arg), xw)
        wsum = jnp.maximum(jnp.sum(w, axis=-1), 1e-9)        # [C]
        ampl = 2.0 * jnp.sqrt(re**2 + im**2) / wsum[:, None]
        phse = jnp.arctan2(im, re)
        return ampl, phse

    N = centers.shape[0]
    pad = (-N) % chunk
    cs = jnp.pad(centers, (0, pad))
    fz = jnp.pad(f0s, (0, pad), constant_values=100.0)
    hw = jnp.pad(halfwidth, (0, pad), constant_values=2.0)
    cs = cs.reshape(-1, chunk)
    fz = fz.reshape(-1, chunk)
    hw = hw.reshape(-1, chunk)
    ampl, phse = jax.lax.map(per_chunk, (cs, fz, hw))
    ampl = ampl.reshape(-1, max_k)[:N]
    phse = phse.reshape(-1, max_k)[:N]
    m = mask.astype(jnp.float32)
    return ampl * m, phse * m, m


def refine_f0(
    x: jnp.ndarray,
    f0: jnp.ndarray,
    centers: jnp.ndarray,
    *,
    fs: float,
    halfwin_max: int,
    rel_winsize: float,
    window: str = "hanning",
    rel_span: float = 0.02,
    npoints: int = 5,
) -> jnp.ndarray:
    """Refine F0 by maximizing fundamental-partial energy over a small grid
    around the supplied track, with quadratic peak interpolation
    (reference-parity for llsm_aoptions.f0_refine; dsputils.c).
    """
    H = halfwin_max
    W = 2 * H + 1
    n_off = jnp.arange(W, dtype=jnp.float32) - H
    voiced = f0 > 0.0
    f0s = jnp.where(voiced, f0, 100.0)
    halfwidth = jnp.clip(rel_winsize * fs / (2.0 * f0s), 2.0, float(H))
    xp = jnp.pad(x, (H, H + 1)).astype(jnp.float32)
    idx = centers[:, None] + jnp.arange(W)[None, :]
    frames = xp[idx]
    w = window_centered(window, n_off[None, :], halfwidth[:, None])
    xw = frames * w                                           # [N, W]
    ratios = 1.0 + rel_span * jnp.linspace(-1.0, 1.0, npoints)
    cand = f0s[:, None] * ratios[None, :]                     # [N, P]
    ph = _phase_cycles(n_off[None, None, :], (cand / fs)[:, :, None])
    arg = (2.0 * jnp.pi) * ph
    re = jnp.einsum("npw,nw->np", jnp.cos(arg), xw)
    im = jnp.einsum("npw,nw->np", -jnp.sin(arg), xw)
    e = re**2 + im**2                                         # [N, P]
    k = jnp.argmax(e, axis=-1)
    k = jnp.clip(k, 1, npoints - 2)
    a = jnp.take_along_axis(e, (k - 1)[:, None], axis=-1)[:, 0]
    b = jnp.take_along_axis(e, k[:, None], axis=-1)[:, 0]
    c = jnp.take_along_axis(e, (k + 1)[:, None], axis=-1)[:, 0]
    denom = a - 2.0 * b + c
    p = jnp.where(jnp.abs(denom) > 1e-20, 0.5 * (a - c) / denom, 0.0)
    p = jnp.clip(p, -1.0, 1.0)
    kf = k.astype(jnp.float32) + p
    step = ratios[1] - ratios[0]
    refined = f0s * (ratios[0] + kf * step)
    return jnp.where(voiced, refined, 0.0)


def oscillator_bank(
    f0: jnp.ndarray,
    ampl: jnp.ndarray,
    phse: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    fs: float,
    nhop: int,
    chunk: int = 64,
) -> jnp.ndarray:
    """Render per-frame harmonic segments for 50%-overlap Hann OLA.

    Frame i (center c_i) produces segment s_i[t], t = -nhop..nhop-1:
        s_i[t] = hann_ola(t) * sum_k mask*ampl_k*cos(2 pi (k+1) f0 t/fs + phse_k)
    Returns [N, 2*nhop].  This is the jnp reference implementation of the
    fused oscillator bank (the Pallas fast path lives in ops/pallas_osc.py).
    Reference: layer0.c -> the sinusoidal synthesis loop in llsm_synthesize.
    """
    N, K = ampl.shape
    T = 2 * nhop
    t_off = jnp.arange(T, dtype=jnp.float32) - nhop
    kharm = jnp.arange(1, K + 1, dtype=jnp.float32)
    # periodic Hann: sums to 1 at 50% overlap
    w_ola = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * (jnp.arange(T) + 0.5) / T)
    w_ola = w_ola.astype(jnp.float32)

    f0s = jnp.where(f0 > 0.0, f0, 100.0)

    def per_chunk(args):
        c_f0, c_a, c_p, c_m = args
        f_over_fs = (c_f0 / fs)[:, None, None]
        kt = kharm[None, :, None] * t_off[None, None, :]      # [1,K,T]
        ph = kt * f_over_fs
        ph = ph - jnp.round(ph)
        arg = (2.0 * jnp.pi) * ph + c_p[:, :, None]
        osc = jnp.cos(arg)                                    # [C,K,T]
        seg = jnp.einsum("ckt,ck->ct", osc, c_a * c_m)
        return seg * w_ola[None, :]

    pad = (-N) % chunk
    f0c = jnp.pad(f0s, (0, pad), constant_values=100.0).reshape(-1, chunk)
    ac = jnp.pad(ampl, ((0, pad), (0, 0))).reshape(-1, chunk, K)
    pc = jnp.pad(phse, ((0, pad), (0, 0))).reshape(-1, chunk, K)
    mc = jnp.pad(mask, ((0, pad), (0, 0))).reshape(-1, chunk, K)
    segs = jax.lax.map(per_chunk, (f0c, ac, pc, mc))
    return segs.reshape(-1, T)[:N]


def overlap_add_half(segments: jnp.ndarray, nhop: int, nx: int) -> jnp.ndarray:
    """OLA of [N, 2*nhop] segments at centers i*nhop into a length-nx signal.

    Segment i covers samples [i*nhop - nhop, i*nhop + nhop).  Pure reshapes
    -- no scatter -- since the hop is exactly half the segment length.
    """
    N = segments.shape[0]
    a = segments[:, :nhop].reshape(-1)   # lands at blocks i-1
    b = segments[:, nhop:].reshape(-1)   # lands at blocks i
    y = b.at[: (N - 1) * nhop].add(a[nhop:])
    if nx <= N * nhop:
        return y[:nx]
    return jnp.pad(y, (0, nx - N * nhop))
