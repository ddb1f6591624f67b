"""Layer-0 codec: harmonic + noise analysis and synthesis.

TPU-native rebuild of the reference's core entry points (reference:
layer0.c -> llsm_analyze / llsm_synthesize; call stacks in SURVEY.md
sections 3.1/3.2).  The reference's per-frame sequential C loop becomes:

  analysis:  one batched pitch-synchronous zoomed-DFT contraction over all
             frames (ops/harmonics.harmonic_analysis), a full-signal
             residual subtraction, an FFT-domain analytic filterbank for the
             band envelopes, and a batched warped periodogram -- all under
             one jit.
  synthesis: a batched oscillator bank + reshape-only overlap-add for the
             harmonic part, and a WOLA noise shaper (keyed-PRNG per-frame
             noise spectra -> sqrt(PSD) filter -> band split -> temporal
             envelope modulation) for the noise part.

Everything is shape-static: the only data-dependent quantities (window
lengths ~ 1/F0, harmonic counts ~ fnyq/F0) are handled by continuous
window evaluation and validity masks (SURVEY.md section 7 design rules).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..fp import FP

from ..config import AnalysisOptions, ChunkConf, SynthesisOptions
from ..container import Chunk
from ..ops import harmonics, interp, spectral, warp, windows


class SynthResult(NamedTuple):
    """Reference: llsm_output (llsm.h) -- synthesized signal + components."""
    y: jnp.ndarray
    y_sin: jnp.ndarray
    y_nos: jnp.ndarray
    fs: float


# ---------------------------------------------------------------------------
# analysis
# ---------------------------------------------------------------------------

def _env_decimation(conf: ChunkConf, requested: int, nx: int) -> int:
    """Largest valid envelope decimation <= requested (see
    AnalysisOptions.env_decimate): D must be a power of two (the spectrum
    fold in _band_envelopes tiles the next_pow2 FFT grid, so only
    power-of-two D divide it), divide the hop, and every noise channel's
    band must fit inside one alias window so the complex-demodulated
    decimation is exact.  The containment check runs on the ACTUAL FFT-bin
    indices _band_envelopes will fold (nfft = next_pow2(nx)) -- an Hz-grid
    check can disagree with the ceil-rounded bin grid by one bin at an
    m*fs/D boundary and silently zero that channel's envelope."""
    edges = conf.chan_edges
    nfft = spectral.next_pow2(nx)
    D = 1
    while 2 * D <= max(int(requested), 1):
        D *= 2                     # largest power of two <= requested
    while D > 1:
        nfft_d = nfft // D
        ok = conf.nhop % D == 0 and nfft % D == 0
        for c in range(conf.nchannel):
            lo, hi = edges[c], edges[c + 1]
            b_lo = int(-(-lo * nfft // conf.fs))      # as in _band_envelopes
            b_hi = min(int(-(-hi * nfft // conf.fs)), nfft // 2 + 1)
            if b_hi <= b_lo or b_lo // nfft_d != (b_hi - 1) // nfft_d:
                ok = False
        if ok:
            return D
        D //= 2
    return 1


def _band_envelopes(residual: jnp.ndarray, conf: ChunkConf,
                    decimate: int = 1) -> jnp.ndarray:
    """Per-channel temporal amplitude envelopes of the residual via the
    FFT-domain analytic signal (reference: layer0.c noise pass -- bandpass +
    envelope; we use one full-signal FFT and per-band one-sided masks).
    Returns [nchannel, nx // decimate].

    decimate D > 1 (validated by _env_decimation): each band's one-sided
    spectrum is folded into an nfft/D grid and inverted with a small ifft.
    Because the whole band lies in one alias window, the fold is a coherent
    frequency SHIFT of the analytic signal -- |z| (the envelope) is exactly
    the full-rate envelope sampled every D samples; no lowpass needed.
    Cuts both the inverse-FFT cost (D^2 per ifft) and every downstream
    envelope-projection buffer by D (the pipeline is HBM-bound; see
    scripts/cost_analysis.py)."""
    nx = residual.shape[-1]
    nfft = spectral.next_pow2(nx)
    X = jnp.fft.fft(residual, n=nfft)
    edges = conf.chan_edges
    envs = []
    if decimate == 1:
        f = jnp.fft.fftfreq(nfft, 1.0 / conf.fs)
        for c in range(conf.nchannel):
            lo, hi = edges[c], edges[c + 1]
            m = ((f >= lo) & (f < hi)).astype(FP)
            analytic = jnp.fft.ifft(X * m * 2.0)
            envs.append(jnp.abs(analytic)[:nx])
        return jnp.stack(envs, axis=0)
    D = decimate
    nfft_d = nfft // D
    for c in range(conf.nchannel):
        lo, hi = edges[c], edges[c + 1]
        b_lo = int(-(-lo * nfft // conf.fs))          # ceil: first bin >= lo
        b_hi = int(-(-hi * nfft // conf.fs))          # first bin >= hi
        b_hi = min(b_hi, nfft // 2 + 1)
        shift = (b_lo // nfft_d) * nfft_d
        y = jnp.zeros(residual.shape[:-1] + (nfft_d,), X.dtype)
        y = y.at[..., b_lo - shift:b_hi - shift].set(X[..., b_lo:b_hi])
        z = jnp.fft.ifft(2.0 * y) * (1.0 / D)
        envs.append(jnp.abs(z)[..., :nx // D])
    return jnp.stack(envs, axis=0)


def _warped_psd(residual: jnp.ndarray, centers: jnp.ndarray,
                conf: ChunkConf) -> jnp.ndarray:
    """Per-frame PSD of the residual on the warped axis [N, npsd]
    (reference: dsputils.c warped PSD estimation)."""
    nhop = conf.nhop
    winlen = 4 * nhop
    nfft = spectral.next_pow2(winlen)
    # gather-free framing: centers are uniform (i*nhop) and the window is
    # exactly 4 hops, so hop-block slices replace the [N, winlen] gather
    # (measured ~25x slice-vs-gather gap on v5e; docs/STATUS.md)
    nfrm = centers.shape[0]
    frames = harmonics.frame_hops(residual, nfrm, nhop, 2)
    w = jnp.hanning(winlen).astype(FP)
    pgram = spectral.periodogram(frames, w, nfft)           # [N, nfft//2+1]
    band_mat = warp.warped_band_matrix(conf.npsd, nfft // 2 + 1, conf.fs,
                                       conf.noswarp)        # [npsd, nbin]
    return pgram @ band_mat.T


def _shift_rows(v, d: int, n: int):
    """v[i] -> v[i+d] along the leading (frame) axis, zero-padded."""
    if d > 0:
        return jnp.pad(v, ((0, d),) + ((0, 0),) * (v.ndim - 1))[d:]
    if d < 0:
        return jnp.pad(v, ((-d, 0),) + ((0, 0),) * (v.ndim - 1))[:n]
    return v


def _aligned_track(ampl, phse, cyc, centers):
    """Phase-aligned complex amplitude tracks c'_k[i] = a e^{j phi}
    e^{-2 pi j k cyc[c_i]} (mod-1 phase args) and the alignment field."""
    K = ampl.shape[1]
    kharm = jnp.arange(1, K + 1, dtype=FP)
    ph = kharm[None, :] * cyc[centers][:, None]
    ph = ph - jnp.round(ph)
    align = jnp.exp(-2j * jnp.pi * ph)
    return ampl * jnp.exp(1j * phse) * align, align


def _aligned_track_c(cr, ci, cyc, centers):
    """_aligned_track from the raw COMPLEX track (re, im) -- the complex
    handoff variant that skips the a e^{j phi} reconstruction."""
    K = cr.shape[1]
    kharm = jnp.arange(1, K + 1, dtype=FP)
    ph = kharm[None, :] * cyc[centers][:, None]
    ph = ph - jnp.round(ph)
    align = jnp.exp(-2j * jnp.pi * ph)
    return (cr + 1j * ci) * align, align


def _deconv_correction(opt: AnalysisOptions, f0, centers, cyc, ampl, phse,
                       mask, return_complex: bool = False):
    """Analytic amplitude-track deconvolution (hm_correction="deconv").

    What the Gauss-Seidel render+reproject pass actually fixes is NOT
    static inter-harmonic leakage -- the chirped basis is near-orthogonal
    under the pitch-synchronous window (its Gram off-diagonals measure
    ~1e-3) -- but the effect of each harmonic's amplitude track VARYING:
    (a) TEMPORAL smoothing: the ~4-period window averages the track over
    ~+-2 hops; (b) CROSS-HARMONIC coupling: the variation's AM sidebands
    land on the neighbor harmonic's projection.  In the phase-aligned
    complex-track domain c'_k[j] = c_k[j] e^{-2 pi j k cyc[c_j]}, the
    measurement-after-render operator is k-independent and banded:

        T[i, i+d] = sum_n w_i(n) * w_ola(n - d*nhop) / wsum_i   (real;
            rows sum to 1; verified == the measured operator rows to 4
            decimals, even under vibrato)
        X[i, i+d] = sum_n w_i(n) * w_ola(n - d*nhop)
                    * e^{2 pi j cyc(n)} / wsum_i   (couples k -> k+1;
            its conjugate couples k -> k-1; ~0.02 per unit variation)

    so one Neumann step  c' <- 2 c_hat' - S c_hat'  applies 2S - S^2 --
    the exact operator of the Gauss-Seidel pass (hm_passes=2), matching
    it within 0.3 dB on all stressed fixtures -- at the cost of a banded
    matvec along frames instead of a full oscillator render + K-wide
    re-projection (~3 vs 19.5 ms per step, batch 32 x 8 s, v5e).
    Reference: layer0.c has no analog; its single-pass analysis keeps
    the smoothing."""
    conf = opt.conf
    nhop = conf.nhop
    N, K = ampl.shape
    hh = -(-conf.halfwin_max // nhop)
    D = hh + 1                       # |d| band: window +- OLA half-width
    voiced = f0 > 0.0
    f0s = jnp.where(voiced, f0, 100.0)
    halfwidth = jnp.clip(conf.rel_winsize * conf.fs / (2.0 * f0s), 2.0,
                         float(conf.halfwin_max))

    # T bands: overlap of the analysis window (centered at 0, halfwidth
    # per frame) with the render crossfade w_ola centered at d*nhop.
    # w_ola(r) for r in [-nhop, nhop): periodic Hann, matches
    # harmonics.oscillator_bank's OLA window exactly.
    # coarse quadrature: the w_i * w_ola product has < 2 cycles across
    # each nhop-wide band, so a stride-8 midpoint sum gives the bands to
    # ~1e-3 relative -- and the row normalization absorbs the overall
    # quadrature scale exactly.  (The dense [N, 2D+1, 2*nhop] build cost
    # ~9 ms/step at batch 32; this is ~1 ms.)
    stride = max(min(8, nhop), 1)
    nq = (2 * nhop) // stride

    if opt.use_pallas and D <= 128:
        # fully fused path: band build, phase alignment, banded Neumann
        # step and back-conversion all inside one kernel -- only the raw
        # (ampl, phse), the per-frame cyc/halfwidth vectors and the tiny
        # [N, nq] quadrature field of e^{2 pi j cyc} reach HBM.  (The
        # kernel's frame halo is one block, so D must not exceed it;
        # D > 128 would need a hop under 4 samples.)
        from ..ops.pallas_osc import deconv_full_pallas
        C2 = harmonics.frame_hops(cyc, N, nhop, 1, mode="edge")
        # basic strided slice, NOT C2[:, q_idx] fancy indexing: the array
        # index lowers to an XLA gather (~25-100x slower than slices on
        # TPU; CLAUDE.md gotchas)
        ang = 2.0 * jnp.pi * C2[:, stride // 2::stride][:, :nq]
        c_re, c_im = deconv_full_pallas(ampl, phse, cyc[centers],
                                        halfwidth, jnp.cos(ang),
                                        jnp.sin(ang), D, nhop, stride)
        if return_complex:
            # complex handoff to the fused track denoiser: skip the
            # [N, K] sqrt + arctan2 here AND its inverse (a e^{j phi})
            # inside the denoiser's stats kernel.  Masked slots must
            # still be zeroed -- the banded deconv mixes neighbor
            # frames, so dead slots are not exactly zero and would
            # smear into the slow-track FIR.
            return c_re * mask, c_im * mask
        return (jnp.sqrt(c_re**2 + c_im**2) * mask,
                jnp.arctan2(c_im, c_re) * mask)

    r = (-nhop + (jnp.arange(nq, dtype=FP) + 0.5) * stride)
    w_ola = (0.5 + 0.5 * jnp.cos(jnp.pi * r / nhop))[None, None, :]
    d_off = jnp.arange(-D, D + 1, dtype=FP)        # [2D+1]
    n_abs = d_off[None, :, None] * nhop + r[None, None, :]  # [1, 2D+1, nq]
    w_i = windows.window_centered("hanning", n_abs,
                                  halfwidth[:, None, None])
    P = w_i * w_ola                                         # [N, 2D+1, nq]
    # rows sum to (wsum_i / stride) exactly in the limit (w_ola partitions
    # unity at 50% overlap and the bands cover the whole window support),
    # so the row-sum normalization IS the projection's 1/wsum
    tot = jnp.maximum(jnp.sum(P, axis=(1, 2), keepdims=True), 1e-9)
    T_band = jnp.sum(P / tot, axis=-1)                      # [N, 2D+1]

    # cross-harmonic (dk = +-1) coupling: an amplitude track varying
    # across the window creates AM sidebands that the NEIGHBOR harmonic's
    # projection picks up (measured ~0.02 per unit of track variation).
    # In the phase-aligned domain the exponent algebra collapses to the
    # k-INDEPENDENT kernel X[i, i+d] = sum_n w_i w_ola e^{2 pi j cyc(n)}
    # / wsum (absolute mod-1 cycle values at the overlap samples); the
    # dk = -1 kernel is its conjugate.  GS captures this coupling by
    # construction; without it the deconv left 3-7 dB on clean modulated
    # fixtures.
    C2 = harmonics.frame_hops(cyc, N, nhop, 1, mode="edge")  # [N, 2*nhop]
    # strided basic slice (a fancy q_idx index would lower to a gather)
    eq = jnp.exp(2j * jnp.pi
                 * C2[:, stride // 2::stride][:, :nq])   # [N, nq]

    Pn = P / tot
    X_band = jnp.stack([
        jnp.sum(Pn[:, j] * _shift_rows(eq, d, N), axis=-1)
        for j, d in enumerate(range(-D, D + 1))], axis=1)   # [N, 2D+1] cplx

    c, align = _aligned_track(ampl, phse, cyc, centers)     # c_hat' [N, K]

    # one row-shift per band: the three kernels (T on c, X on c_{k+1},
    # conj(X) on c_{k-1}) share the same frame shifts, so shift ONE
    # concatenated [N, 3K] array per d instead of three
    c_up = jnp.pad(c, ((0, 0), (0, 1)))[:, 1:]              # c'_{k+1}
    c_dn = jnp.pad(c, ((0, 0), (1, 0)))[:, :K]              # c'_{k-1}
    cat = jnp.concatenate([c, c_up, c_dn], axis=1)          # [N, 3K]
    Sm = jnp.zeros_like(c)
    Xc_band = jnp.conj(X_band)
    for j, d in enumerate(range(-D, D + 1)):
        sh = _shift_rows(cat, d, N)
        Sm = Sm + T_band[:, j:j + 1] * sh[:, :K] \
            + X_band[:, j:j + 1] * sh[:, K:2 * K] \
            + Xc_band[:, j:j + 1] * sh[:, 2 * K:]
    c2 = 2.0 * c - Sm
    c2 = c2 * jnp.conj(align)
    if return_complex:
        return c2.real * mask, c2.imag * mask
    return jnp.abs(c2) * mask, jnp.angle(c2) * mask


def _track_lowpass(conf: ChunkConf, f0, cyc, centers, ampl, phse, mask,
                   cutoff_hz: float):
    """Opt-in harmonic-track denoiser (AnalysisOptions.track_lowpass_hz):
    Hann-FIR lowpass of each harmonic's phase-aligned complex amplitude
    track along frames, applied only where the whole filter support is
    voiced.  See the config docstring for the measured tradeoff."""
    N = ampl.shape[0]
    frame_rate = 1.0 / conf.thop
    M = int(round(frame_rate / cutoff_hz)) | 1          # odd tap count
    w = jnp.hanning(M + 2)[1:-1].astype(FP)
    w = w / jnp.sum(w)
    c, align = _aligned_track(ampl, phse, cyc, centers)
    voiced = (f0 > 0).astype(FP)
    h = M // 2

    def fir(v):
        out = jnp.zeros_like(v)
        for j in range(M):
            out = out + w[j] * _shift_rows(v, j - h, N)
        return out

    cs = fir(c)
    guard = (fir(voiced[:, None]) > 0.999)              # [N, 1]
    cs = jnp.where(guard, cs, c) * jnp.conj(align)
    return jnp.abs(cs) * mask, jnp.angle(cs) * mask


def _denoise_floor_stats(pp, cs2_m, r2, amp2_m, ok):
    """Shared host-side denoiser statistics (one definition for the jnp
    and fused-Pallas paths -- review finding: the duplicated copies could
    silently desynchronize).  Inputs are per-(frame, k) powers masked by
    nothing (masking happens via `ok`): pp = probe-band incoherent power,
    cs2_m = |c_s|^2 * m, r2 = |r|^2, amp2_m = |c|^2 * m.  Returns
    (v [K] gate floor, wmul [K] coherent-fit weights):

    - v: Winsorized mean of pp over usable frames (robust to real
      transients), zeroed where any guard fails:
      * < 16 usable frames -> floor unknown;
      * floor below -35 dB of the track's slow power -> the track is
        clean and residual true detail is entangled with estimation
        noise (gating measurably hurt clean fixtures);
      * slow track keeps < 10% of the raw track energy -> the phase
        alignment itself failed (e.g. wrong supplied F0) and the
        slow/fast split is meaningless.
    - wmul: excludes noise-dominated tracks (fast power rivaling slow
      power) from the coherent across-k fit -- their residuals otherwise
      leak into m0/m1 and inject noise into the strong tracks (measured
      -10 dB on the voiced-fricative fixture's low band).
    """
    n_ok = jnp.maximum(jnp.sum(ok, axis=0), 1.0)        # [K]
    v = jnp.sum(jnp.where(ok, pp, 0.0), axis=0) / n_ok
    for _ in range(3):
        cl = jnp.minimum(pp, 3.0 * v[None, :])
        v = jnp.sum(jnp.where(ok, cl, 0.0), axis=0) / n_ok
    v = jnp.where(jnp.sum(ok, axis=0) >= 16.0, v, 0.0)
    p_bar = jnp.sum(jnp.where(ok, cs2_m, 0.0), axis=0) / n_ok
    v = jnp.where(v > 10.0**-3.5 * p_bar, v, 0.0)
    p_raw = jnp.sum(jnp.where(ok, amp2_m, 0.0), axis=0) / n_ok
    q = p_bar / jnp.maximum(p_raw, 1e-20)
    v = jnp.where(q > 0.1, v, 0.0)
    f_k = jnp.sum(jnp.where(ok, r2, 0.0), axis=0) / n_ok
    wmul = jnp.clip(1.0 - 2.0 * f_k / jnp.maximum(p_bar, 1e-20),
                    0.0, 1.0)
    return v, wmul


def _spectral_gate(c_s, full, pp, guard, v, mask, thop: float,
                   cutoff_hz: float, a_spec: float, decimate: int = 1):
    """Per-frame-frequency-bin noise gate on the SLOW track component
    (AnalysisOptions.track_denoise_spectral).

    The per-frame time gate cannot touch the slow band (< cutoff_hz):
    real dynamics live there.  But the true slow track spectrum is
    SPARSE in frame frequency (a DC peak plus vibrato/shimmer harmonics)
    while the projection-window-lowpassed noise is spread across all
    bins -- the oracle-headroom experiment (scripts/headroom.py) shows
    ~4 dB of the remaining gap lives between those peaks.  So: FFT each
    track's slow part c_s along frames, estimate its noise level from
    the f-domain probe band of the FULL track (|f| > 2*cutoff, where the
    time-domain floor v already proved the track noisy), extrapolate
    across bins with a noise-shape profile measured from the noisy
    tracks themselves (Winsorized weighted mean -- the shape is the
    window response x FIR response, common to all k), and
    spectral-subtract per bin.

    Gating ONLY c_s (the fast residual keeps the per-frame time gate)
    preserves the time gate's clean-fixture safety: broadband TRUE fast
    dynamics (jitter/shimmer) are spectrally indistinguishable from
    noise, but in the time domain they are impulsive and pass the
    power-ratio gate -- a full-spectrum per-bin gate measurably shaved
    them (clean-stressed no-op violated by 0.36 dB).  Tracks with
    v == 0 (clean by the guarded time-domain statistics) are not gated
    at all -- the protection whose absence killed the round-2 per-bin
    Wiener attempt (config.py track_lowpass_hz note).

    TIME-LOCALITY (round-5 fix of the voiced-fricative regression): the
    per-track statistics (v, lev_k) are whole-utterance, but a track can
    be noisy only PART of the time -- e.g. harmonics k=26..28 of a /z/
    glide in and out of the 3 kHz frication band as F0 moves.  One
    global FFT gate subtracts a flat per-bin level from the WHOLE track,
    which redistributes error into the track's clean spans (measured:
    the overall track error vs truth IMPROVED while the 2.4-2.8 kHz
    render error grew 13x, concentrated exactly in the low-F0 spans
    where those tracks dip below the frication band -- 10.7 dB of
    voiced-band damage, tests/test_voiced_fricative.py).  So the gated
    slow track is BLENDED with the raw one per (frame, k) by a local
    noisiness weight w_loc derived from the frame-smoothed probe power
    pp: full subtraction where the local probe power reaches the
    track's floor v, none where the track is locally clean.  On
    stationary noise lp ~ v everywhere so w_loc ~ 1 and the r4 gains
    are retained (re-measured within 0.1 dB).

    c_s: [N, K] complex slow part.  full: [N, K] complex guarded full
    track where(guard, c_s + r_inc, 0) with r_inc the weighted-fit
    incoherent residual (precomputed by the caller -- in pallas mode it
    comes straight out of the apply kernel, saving the jnp passes).
    pp: [N, K] per-frame incoherent probe power (pass A).
    guard: [N, 1] bool.  v: [K] guarded floor (0 = clean/unknown).
    decimate: frame-axis decimation D for the gate's FFTs.  c_s is
    cutoff_hz-lowpassed, so at D = 4 (Nyquist 25 Hz over a 15 Hz band)
    the gating spectrum is intact; the probe-level measurement lev_k
    lives ABOVE the decimated Nyquist, so it keeps one full-rate FFT
    (of the combined track -- one transform instead of two) and scales
    per-bin by 1/D (a zero-padded FFT's expected per-bin noise power is
    proportional to the number of nonzero samples).  The gated delta is
    band-limited, so block-lerp upsampling reconstructs it; measured
    quality deltas on the full denoiser oracle grid < 0.15 dB at D = 4
    (vs > 1 dB fixture-to-fixture spreads).  Cuts the gate's FFT work
    ~2.4x and its per-bin passes by D.
    Returns the gated slow part (unguarded rows returned as-is).
    """
    import numpy as _np

    N, K = c_s.shape
    D = max(int(decimate), 1)
    NP = 1 << max(int(N - 1).bit_length(), 4)
    f_np = _np.fft.fftfreq(NP, thop)
    hb = jnp.asarray(_np.abs(f_np) > 2.0 * cutoff_hz)       # [NP] static
    nhb = float(max((_np.abs(f_np) > 2.0 * cutoff_hz).sum(), 1))

    if D > 1:
        Nd = (N + D - 1) // D
        # guarded slow track only at the decimated rows ([Nd, K] work,
        # not [N, K]); the full-rate counterpart exists only via `full`
        sg_d = jnp.where(guard[::D], c_s[::D], 0.0)
        NPd = 1 << max(int(Nd - 1).bit_length(), 4)
        # forward transform as a static DFT matmul on the MXU: XLA's
        # TPU FFT is VPU-bound and slow at this [NPd, K] batch shape,
        # while a [NPd, Nd] x [Nd, K] contraction rides the MXU.
        # Single-pass bf16 is safe HERE because every consumer is
        # error-tolerant: Ps feeds the Wiener profile (0.8% power
        # error), and the subtraction delta is reconstructed from
        # (g - 1) * Xs -- see below -- so forward rounding enters the
        # delta only scaled by the gate depth in gated (noise-level)
        # bins, never as a full-track-level residual.
        Wf = jnp.asarray(_np.exp(
            (-2j * _np.pi / NPd) * _np.outer(_np.arange(NPd),
                                             _np.arange(Nd))
        ).astype(_np.complex64))                            # [NPd, Nd]
        Xs = jnp.einsum("pn,nk->pk", Wf, sg_d,
                        precision=jax.lax.Precision.DEFAULT)
        # probe-band level by a DIRECT static high-bin DFT matmul on the
        # MXU (replaces the gate's last full-rate VPU FFT).  This is the
        # only einsum in the codebase deliberately run at DEFAULT
        # (single-pass bf16) precision: input rounding (~2^-8 relative)
        # acts as additive broadband noise on the track at -48 dB whose
        # SQUARED power spreads over all NP bins, biasing the high-bin
        # sum by only ~1.6e-5 * tot -- <2% of lev_k even when the probe
        # fraction is 1e-3.  (The earlier PARSEVAL-COMPLEMENT form
        # "NP*sum|z|^2 minus a low-bin matmul" needed HIGHEST -- the
        # tot-low subtraction cancels catastrophically, amplifying any
        # matmul rounding by tot/probe -- and at 6-pass fp32 emulation
        # its smaller [n_low, N] contraction cost MORE than this
        # [n_high, N] one at one-pass bf16.)
        # every 2nd probe bin: lev_k is a MEAN over ~1400 bins that are
        # only ~1.3x oversampled (NP/N), so half of them estimates it
        # within ~3-4% -- far under the gate's own strength margin --
        # and the [H, N] matmul halves
        high_n = _np.where(_np.abs(f_np) > 2.0 * cutoff_hz)[0][::2]
        Whigh = jnp.asarray(_np.exp(
            (-2j * _np.pi / NP) * _np.outer(high_n, _np.arange(N))
        ).astype(_np.complex64))                            # [H/2, N] const
        X_high = jnp.einsum("ln,nk->lk", Whigh, full,
                            precision=jax.lax.Precision.DEFAULT)
        lev_k = jnp.sum(X_high.real**2 + X_high.imag**2,
                        axis=0) / (float(max(len(high_n), 1)) * D)
    else:
        sg = jnp.where(guard, c_s, 0.0)
        Xs = jnp.fft.fft(sg, n=NP, axis=0)                  # [NP, K]
        Xfull = jnp.fft.fft(full, n=NP, axis=0)
        Pfull = Xfull.real**2 + Xfull.imag**2
        lev_k = jnp.sum(jnp.where(hb[:, None], Pfull, 0.0),
                        axis=0) / nhb
    Ps = Xs.real**2 + Xs.imag**2
    # spectral engagement is STRICTER than the time gate's (-35 dB
    # relative): the floor v on clean-but-stressed tracks is residual
    # TRUE dynamics (coherence-fit mismatch of jitter/shimmer), and
    # subtracting it from the slow band shaves real content.  Measured
    # separation: clean-stressed tracks sit at v/p_bar <= -16.8 dB
    # (occasional weak-track outliers), noisy-fixture tracks at medians
    # -11..+4 dB -- the -15 dB threshold plus the >= 3-track profile
    # guard below disengages every clean fixture in the hard-fixture
    # grid while keeping the noisy gains.
    gd = guard & (mask > 0)
    n_gd = jnp.maximum(jnp.sum(gd, axis=0), 1.0)
    p_bar = jnp.sum(jnp.where(gd, c_s.real**2 + c_s.imag**2, 0.0),
                    axis=0) / n_gd
    engaged = (v > 10.0**-1.5 * p_bar) & mask.any(axis=0)   # [K]
    wk = engaged.astype(FP)
    wsum = jnp.maximum(jnp.sum(wk), 1e-9)
    lev_safe = jnp.where(engaged, jnp.maximum(lev_k, 1e-30), 1.0)
    pn = Ps / lev_safe[None, :]
    prof = jnp.sum(pn * wk[None, :], axis=1) / wsum         # [NP]
    for _ in range(3):                                      # Winsorize
        cl = jnp.minimum(pn, 3.0 * prof[:, None])
        prof = jnp.sum(cl * wk[None, :], axis=1) / wsum
    sm = 15                                                 # circular MA
    prof = sum(jnp.roll(prof, j - sm // 2) for j in range(sm)) / sm
    nf = lev_k[None, :] * prof[:, None]                     # [NP, K]
    g = jnp.clip(1.0 - a_spec * nf / (Ps + 1e-30), 0.0, 1.0)
    # need >= 3 noisy tracks for a usable shape profile; and never touch
    # tracks the time-domain guards called clean
    g = jnp.where((jnp.sum(wk) >= 3.0) & engaged[None, :], g, 1.0)
    if D > 1:
        # gate in the decimated domain, block-lerp the (band-limited)
        # delta back to frame rate (gather-free: one reshape per block).
        # The inverse transform is an MXU matmul applied to (g-1)*Xs,
        # NOT to g*Xs: iDFT(g Xs) - sg_d would carry the transform
        # round-trip rounding at full track level (-48 dB broadband at
        # bf16 -- audible on clean engaged tracks), whereas iDFT of the
        # gated DIFFERENCE is small by construction and its relative
        # rounding stays relative to the delta itself.
        Wi = jnp.asarray((_np.exp(
            (2j * _np.pi / NPd) * _np.outer(_np.arange(Nd),
                                            _np.arange(NPd))
        ) / NPd).astype(_np.complex64))                     # [Nd, NPd]
        delta_d = jnp.einsum("np,pk->nk", Wi, (g - 1.0) * Xs,
                             precision=jax.lax.Precision.DEFAULT)
        nxt = jnp.concatenate([delta_d[1:], delta_d[-1:]], axis=0)
        wts = (jnp.arange(D, dtype=FP) / D)[None, :, None]
        up = delta_d[:, None, :] * (1.0 - wts) + nxt[:, None, :] * wts
        delta = up.reshape(Nd * D, K)[:N]
        s_dn = c_s + delta
    else:
        s_dn = jnp.fft.ifft(g * Xs, axis=0)[:N]

    # local-noisiness blend (see docstring): smooth the per-frame probe
    # power over ~the slow window, compare to the track floor
    M = int(round(1.0 / (thop * cutoff_hz))) | 1
    okf = (guard & (mask > 0)).astype(FP)
    if D > 1:
        # block-mean + short FIR at 2D-frame granularity: w_loc is a
        # clipped threshold weight varying at the noise-span timescale
        # (>= hundreds of ms), so 40 ms blocks lose nothing (quality
        # grid re-measured identical) at ~1/6 the FIR work
        BB = 2 * D
        Nb = -(-N // BB)
        padb = Nb * BB - N

        def bmean(a):
            ap = jnp.pad(a, ((0, padb), (0, 0)))
            return ap.reshape(Nb, BB, K).mean(axis=1)

        num_b = bmean(pp * okf)
        den_b = bmean(okf)
        MB = max(int(round(M / BB)), 1) | 1
        wb = jnp.asarray(_np.hanning(MB + 2)[1:-1], FP)
        wb = wb / jnp.sum(wb)
        hB = MB // 2
        numf = jnp.zeros_like(num_b)
        denf = jnp.zeros_like(den_b)
        for j in range(MB):
            numf = numf + wb[j] * _shift_rows(num_b, j - hB, Nb)
            denf = denf + wb[j] * _shift_rows(den_b, j - hB, Nb)
        lp_b = numf / jnp.maximum(denf, 1e-9)
        lp = jnp.repeat(lp_b, BB, axis=0)[:N]
    else:
        wl = jnp.asarray(_np.hanning(M + 2)[1:-1], FP)
        wl = wl / jnp.sum(wl)
        h = M // 2
        num = jnp.zeros_like(okf)
        den = jnp.zeros_like(okf)
        for j in range(M):
            num = num + wl[j] * _shift_rows(pp * okf, j - h, N)
            den = den + wl[j] * _shift_rows(okf, j - h, N)
        lp = num / jnp.maximum(den, 1e-9)
    # full subtraction once the local probe power reaches half the
    # whole-track floor (a stationary track's lp fluctuates ~+-35%
    # around v at this smoothing; 0.5 keeps its weight pinned at 1),
    # none below v/6 -- measured: stationary noisy gains unchanged,
    # fricative crossing tracks fully protected in their clean spans
    w_loc = jnp.clip(3.0 * lp / jnp.maximum(v[None, :], 1e-30) - 0.5,
                     0.0, 1.0)
    # return the (aligned-domain) subtraction DELTA: callers add it to
    # their own reconstruction -- the pallas path adds it on top of the
    # fused apply kernel's output, keeping the whole time-gate chain in
    # Mosaic (round-5 restructure)
    return jnp.where(guard, w_loc * (s_dn - c_s), 0.0)


def _track_denoise(conf: ChunkConf, f0, cyc, centers, ampl, phse, mask,
                   cutoff_hz: float, strength: float,
                   use_pallas: bool = False, spectral: bool = False,
                   a_spec: float = 3.0, spec_decimate: int = 1,
                   c_complex=None):
    """Default-on dynamics-adaptive harmonic-track denoiser
    (AnalysisOptions.track_denoise).

    Estimation noise on a harmonic's track (in-band additive noise landing
    on k*f0) is broadband along frames and INCOHERENT across harmonics,
    while true fast source dynamics are coherent: shimmer is a common
    multiplicative AM (all harmonics move together) and residual
    jitter/F0 error is a phase deviation PROPORTIONAL to k.  So: split
    each phase-aligned complex track into slow part + fast residual,
    remove from the residual its coherent across-k component (per-frame
    least-squares fit of r ~ (m0 + m1*k) * c_slow -- m0 captures common
    AM/PM, m1 the k-proportional jitter term), estimate each harmonic's
    noise floor as a robust (Winsorized) per-k mean of the remaining
    incoherent power over voiced frames, and Wiener-gate: fast incoherent
    wiggles below `strength` x floor shrink toward the slow track, real
    transients above it pass.  On clean signals the floor collapses to
    the tiny estimation-error level, so the gate is a no-op by
    construction -- unlike the opt-in full lowpass (track_lowpass_hz),
    which buys the same ~+4 dB on breathy input but smears fast true
    dynamics.  Reference: layer0.c has no analog (its single-pass
    analysis keeps the noise on the harmonics).

    c_complex: optional (re, im) RAW complex track -- the complex
    handoff from _deconv_correction(return_complex=True); when given,
    ampl/phse are ignored and the [N, K] a e^{j phi} reconstruction
    (and the caller's sqrt + arctan2 that produced them) is skipped."""
    import numpy as _np

    N, K = (c_complex[0] if c_complex is not None else ampl).shape
    frame_rate = 1.0 / conf.thop
    M = int(round(frame_rate / cutoff_hz)) | 1          # odd tap count
    w_np = _np.hanning(M + 2)[1:-1]
    w_np = w_np / w_np.sum()
    Mp = int(round(frame_rate / (2.0 * cutoff_hz))) | 1
    wp_np = _np.hanning(Mp + 2)[1:-1]
    wp_np = wp_np / wp_np.sum()
    voiced = (f0 > 0).astype(FP)
    m = mask.astype(FP)

    kh = jnp.arange(1, K + 1, dtype=FP)[None, :]

    if use_pallas:
        # fully fused two-pass form (ops.pallas_osc): pass A reads the
        # chunk fields ONCE and emits the probe power / slow-track power
        # / guard for the host-side floor statistics PLUS the aligned
        # and slow complex tracks; pass B reloads those tracks (instead
        # of redoing the align transcendentals + frame-axis FIR -- the
        # recompute was ~half of pass B's VPU work) and applies the
        # weighted fit + gate.  The jnp formulation below materializes a
        # full [N, K] array per FIR tap and intermediate -- ~13 ms/step
        # at batch 128 on v5e.
        from ..ops.pallas_osc import (denoise_apply_pallas,
                                      denoise_stats_pallas)
        cyc_c = cyc[centers]
        if c_complex is not None:
            (pp, cs2, r2, guard_v, cre, cim, csr,
             csi) = denoise_stats_pallas(c_complex[0], c_complex[1],
                                         cyc_c, m, voiced[:, None],
                                         tuple(w_np), tuple(wp_np),
                                         complex_input=True)
            amp2_m = (cre * cre + cim * cim) * m
        else:
            (pp, cs2, r2, guard_v, cre, cim, csr,
             csi) = denoise_stats_pallas(ampl, phse, cyc_c, m,
                                         voiced[:, None],
                                         tuple(w_np), tuple(wp_np))
            amp2_m = ampl * ampl * m
        ok = guard_v[:, None] & (m > 0)
        v, wmul = _denoise_floor_stats(pp, cs2 * m, r2, amp2_m, ok)
        if not spectral:
            re, im = denoise_apply_pallas(cre, cim, csr, csi, cyc_c, m,
                                          guard_v, v, wmul,
                                          float(strength))
            return (jnp.sqrt(re * re + im * im) * mask,
                    jnp.arctan2(im, re) * mask)
        # spectral mode: the whole time-gate chain (weighted fit + gate
        # + un-align) runs in the apply kernel, which ALSO emits the
        # fit's incoherent residual and the un-align rotation factors
        # (emit_resid) -- so jnp only runs the FFT spectral gate (which
        # cannot live in Mosaic) and rotates its subtraction delta into
        # the output domain.  History: an earlier restructure WITHOUT
        # the r_inc output (kernel time gate + fit REDONE in jnp for
        # the delta) measured 2.4 ms/step SLOWER at batch 128 (0.1461
        # vs 0.1437) -- the duplicated fit ate the win; the kernel
        # residual output is what makes this profitable.
        re, im, fullr, fulli, ur, ui = denoise_apply_pallas(
            cre, cim, csr, csi, cyc_c, m, guard_v, v, wmul,
            float(strength), emit_resid=True)
        delta = _spectral_gate(csr + 1j * csi, fullr + 1j * fulli, pp,
                               guard_v[:, None], v, mask, conf.thop,
                               cutoff_hz, a_spec,
                               decimate=spec_decimate)
        outr = re + delta.real * ur - delta.imag * ui
        outi = im + delta.real * ui + delta.imag * ur
        return (jnp.sqrt(outr * outr + outi * outi) * mask,
                jnp.arctan2(outi, outr) * mask)
    else:
        if c_complex is not None:
            c, align = _aligned_track_c(c_complex[0], c_complex[1],
                                        cyc, centers)
        else:
            c, align = _aligned_track(ampl, phse, cyc, centers)
        w = jnp.asarray(w_np, FP)
        h = M // 2

        def fir(v):
            out = jnp.zeros_like(v)
            for j in range(M):
                out = out + w[j] * _shift_rows(v, j - h, N)
            return out

        c_s = fir(c)
        guard = fir(voiced[:, None]) > 0.999            # [N, 1]
        r = c - c_s

        # coherent across-k fit r ~ (m0 + m1*k) * c_s, weighted by
        # |c_s|^2
        p = (c_s.real**2 + c_s.imag**2) * m
        cr = jnp.conj(c_s) * r * m
        a00 = jnp.sum(p, axis=1)
        a01 = jnp.sum(kh * p, axis=1)
        a11 = jnp.sum(kh * kh * p, axis=1)
        b0 = jnp.sum(cr, axis=1)
        b1 = jnp.sum(kh * cr, axis=1)
        det = a00 * a11 - a01 * a01
        ridge = 1e-5 * a00 * a11 + 1e-12
        m0 = (a11 * b0 - a01 * b1) / (det + ridge)
        m1 = (a00 * b1 - a01 * b0) / (det + ridge)
        r_coh = (m0[:, None] + m1[:, None] * kh) * c_s
        r_inc = r - r_coh

        # per-harmonic noise floor: Winsorized mean of the incoherent
        # power in the PROBE band (above 2x the split frequency) over
        # usable frames.  Gating reaches down to cutoff_hz, but real
        # slow-ish dynamics (vibrato AM sidebands, shimmer-band tails)
        # live between cutoff and ~2x cutoff, so measuring the floor
        # there would engage the gate on clean signals; the probe band
        # above 2x cutoff is dynamics-free on clean fixtures (coherent
        # parts already removed, burst transients rejected by the
        # Winsorized clipping) while still seeing the window-lowpassed
        # noise.  The probe UNDERestimates the full gated-band noise
        # (window shaping concentrates it low); `strength` absorbs the
        # shape factor -- leak is conservative.
        wp = jnp.asarray(wp_np, FP)
        hp = Mp // 2
        lowp = jnp.zeros_like(r_inc)
        for j in range(Mp):
            lowp = lowp + wp[j] * _shift_rows(r_inc, j - hp, N)
        r_probe = r_inc - lowp
        pp = r_probe.real**2 + r_probe.imag**2
        ok = guard & (m > 0)
        v, wmul = _denoise_floor_stats(
            pp, p, r.real**2 + r.imag**2,
            (c.real**2 + c.imag**2) * m, ok)

    # second, WEIGHTED fit (see _denoise_floor_stats on wmul)
    r = c - c_s
    p2 = (c_s.real**2 + c_s.imag**2) * m * wmul[None, :]
    cr2 = jnp.conj(c_s) * r * m * wmul[None, :]
    a00 = jnp.sum(p2, axis=1)
    a01 = jnp.sum(kh * p2, axis=1)
    a11 = jnp.sum(kh * kh * p2, axis=1)
    b0 = jnp.sum(cr2, axis=1)
    b1 = jnp.sum(kh * cr2, axis=1)
    det = a00 * a11 - a01 * a01
    m0 = (a11 * b0 - a01 * b1) / (det + 1e-5 * a00 * a11 + 1e-12)
    m1 = (a00 * b1 - a01 * b0) / (det + 1e-5 * a00 * a11 + 1e-12)
    r_coh = (m0[:, None] + m1[:, None] * kh) * c_s
    r_inc = r - r_coh

    pw = r_inc.real**2 + r_inc.imag**2
    g = jnp.clip(1.0 - strength * v[None, :] / (pw + 1e-20), 0.0, 1.0)
    out = c_s + r_coh + g * r_inc
    if spectral:
        # hybrid: per-bin spectral gate on the slow part (sparse true
        # spectrum there), per-frame time gate on the fast residual
        # (true fast dynamics are impulsive in time, flat in f)
        out = out + _spectral_gate(c_s, jnp.where(guard, c_s + r_inc,
                                                  0.0), pp, guard, v,
                                   mask, conf.thop, cutoff_hz, a_spec,
                                   decimate=spec_decimate)
    out = jnp.where(guard, out, c) * jnp.conj(align)
    return jnp.abs(out) * mask, jnp.angle(out) * mask


def analyze(opt: AnalysisOptions, x, f0) -> Chunk:
    """Analyze a signal into an LLSM chunk (reference: layer0.c ->
    llsm_analyze(aoptions, x, nx, fs, f0, nf0)).

    Args:
      opt: AnalysisOptions (contains the ChunkConf).
      x:   [nx] mono signal at conf.fs (or at opt.fs_input, from which it
           is resampled to conf.fs first -- create_aoptions sets fs_input
           for rates with a non-integral hop, e.g. 44100 Hz).
      f0:  [nfrm] F0 track at the frame rate 1/conf.thop (0 = unvoiced).
    """
    x = jnp.asarray(x, FP)
    if opt.fs_input and abs(opt.fs_input - opt.conf.fs) > 1e-9:
        from ..ops import resample
        x = resample.resample_to(x, opt.fs_input, opt.conf.fs)
    return _analyze_jit(opt, x, jnp.asarray(f0, FP))


@functools.partial(jax.jit, static_argnums=0)
def _analyze_jit(opt: AnalysisOptions, x: jnp.ndarray, f0: jnp.ndarray) -> Chunk:
    conf = opt.conf
    nhop = conf.nhop
    nfrm = f0.shape[0]
    nx = nfrm * nhop
    x = jnp.pad(x[:nx], (0, max(0, nx - x.shape[0])))
    centers = jnp.arange(nfrm, dtype=jnp.int32) * nhop

    if opt.f0_refine:
        f0_ref = harmonics.refine_f0(
            x, f0, centers, fs=conf.fs, halfwin_max=conf.halfwin_max,
            rel_winsize=conf.rel_winsize, use_pallas=opt.use_pallas,
            nhop=nhop, f0_ceil=conf.f0_ceil)
        S = opt.f0_refine_smooth
        if S > 1:
            # voicing-masked moving average of the refine CORRECTION:
            # keeps the track's own frame-rate detail (jitter), removes
            # the estimator's (see config.AnalysisOptions.f0_refine_smooth)
            voiced_m = (f0 > 0).astype(FP)
            delta = (f0_ref - f0) * voiced_m
            k = jnp.ones((S,), FP)
            num = jnp.convolve(delta, k, mode="same")
            den = jnp.maximum(jnp.convolve(voiced_m, k, mode="same"), 1.0)
            f0 = jnp.where(voiced_m > 0, f0 + num / den, 0.0)
        else:
            f0 = f0_ref

    # sample-level fundamental cycle track: shared chirped basis for
    # analysis and synthesis (see ops.harmonics.sample_cycles)
    cyc = harmonics.sample_cycles(f0, nhop, conf.fs, nx)

    # --- harmonic pass (SURVEY.md 3.1: the hot frame loop, vmapped away) ---
    with jax.named_scope("llsm.analyze.harmonic"):
        if opt.hm_method == "pp":
            # FFT peak-picking + qifft (reference: LLSM_AOPTION_HMPP)
            ampl, phse, mask = harmonics.harmonic_peak_pick(
                x, f0, centers, fs=conf.fs, max_k=conf.maxnhar,
                halfwin_max=conf.halfwin_max, rel_winsize=conf.rel_winsize,
                fnyq=conf.fnyq, nhop=nhop)
        else:
            # zoomed chirped projection (reference: LLSM_AOPTION_HMCZT)
            ampl, phse, mask = harmonics.harmonic_analysis(
                x, f0, centers, cyc, fs=conf.fs, max_k=conf.maxnhar,
                halfwin_max=conf.halfwin_max, rel_winsize=conf.rel_winsize,
                fnyq=conf.fnyq, use_pallas=opt.use_pallas,
                frame_chunk=opt.frame_chunk, nhop=nhop,
                mxu=opt.hm_kernel == "matmul")

    # --- residual: subtract the resynthesized harmonic part; extra
    # Gauss-Seidel passes re-analyze the residual and fold the correction
    # back in, cancelling AM-sideband leakage between harmonics that a
    # single windowed projection leaves behind (opt.hm_passes) ---
    with jax.named_scope("llsm.analyze.residual"):
        cplx = None
        if (opt.hm_correction == "deconv" and opt.hm_passes <= 1
                and opt.hm_method == "czt"):
            if opt.track_denoise and opt.track_lowpass_hz <= 0.0:
                # complex handoff: the denoiser consumes the deconv's
                # raw complex output directly, skipping one [N, K]
                # sqrt + arctan2 pass and its a e^{j phi} inverse
                cplx = _deconv_correction(opt, f0, centers, cyc, ampl,
                                          phse, mask,
                                          return_complex=True)
            else:
                ampl, phse = _deconv_correction(opt, f0, centers, cyc,
                                                ampl, phse, mask)
        for _pass in range(max(opt.hm_passes - 1, 0)):
            segs = harmonics.oscillator_bank(
                cyc, centers, ampl, phse, mask, nhop=nhop,
                use_pallas=opt.use_pallas)
            y_sin = harmonics.overlap_add_half(segs, nhop, nx)
            da, dp, _ = harmonics.harmonic_analysis(
                x - y_sin, f0, centers, cyc, fs=conf.fs, max_k=conf.maxnhar,
                halfwin_max=conf.halfwin_max, rel_winsize=conf.rel_winsize,
                fnyq=conf.fnyq, use_pallas=opt.use_pallas,
                frame_chunk=opt.frame_chunk, nhop=nhop,
                mxu=opt.hm_kernel == "matmul")
            z = ampl * jnp.exp(1j * phse) + da * jnp.exp(1j * dp)
            ampl = jnp.abs(z) * mask
            phse = jnp.angle(z) * mask
        # denoisers run AFTER any Gauss-Seidel passes: each pass
        # re-projects the residual, which would add the removed noise
        # straight back (ADVICE r2)
        if opt.track_denoise and opt.track_lowpass_hz <= 0.0:
            ampl, phse = _track_denoise(conf, f0, cyc, centers, ampl,
                                        phse, mask, opt.track_denoise_hz,
                                        opt.track_denoise_strength,
                                        use_pallas=opt.use_pallas,
                                        spectral=opt.track_denoise_spectral,
                                        a_spec=opt.track_spectral_strength,
                                        spec_decimate=opt.track_spectral_decimate,
                                        c_complex=cplx)
        if opt.track_lowpass_hz > 0.0:
            ampl, phse = _track_lowpass(conf, f0, cyc, centers, ampl,
                                        phse, mask, opt.track_lowpass_hz)
        segs = harmonics.oscillator_bank(cyc, centers, ampl, phse, mask,
                                         nhop=nhop, use_pallas=opt.use_pallas)
        y_sin = harmonics.overlap_add_half(segs, nhop, nx)
        residual = x - y_sin

    # --- noise pass: band envelopes + warped PSD ---
    with jax.named_scope("llsm.analyze.noise"):
        # envelope analysis runs at the decimated rate fs/D: the analytic
        # band envelopes are exactly representable there (complex
        # demodulation; _band_envelopes) and every projection buffer
        # shrinks by D -- the envelope pass was the largest HBM consumer
        # of the whole analysis (scripts/cost_analysis.py, round 2)
        D = _env_decimation(conf, opt.env_decimate, nx)
        envs = _band_envelopes(residual, conf, D)           # [C, nx/D]
        fs_d = conf.fs / D
        nhop_d = nhop // D
        centers_d = jnp.arange(nfrm, dtype=jnp.int32) * nhop_d
        cyc_d = cyc[::D]
        H_d = -(-conf.halfwin_max // D)

        def env_chan(env_c):
            # the windowed DC rides the same projection (k=0 row) --
            # replaces the former gather-based _windowed_dc pass
            ea, ep, _, edc = harmonics.harmonic_analysis(
                env_c, f0, centers_d, cyc_d, fs=fs_d, max_k=conf.maxnhar_e,
                halfwin_max=H_d, rel_winsize=conf.rel_winsize,
                fnyq=min(conf.fnyq, 0.4 * fs_d), use_pallas=opt.use_pallas,
                frame_chunk=opt.frame_chunk, nhop=nhop_d, with_dc=True)
            return edc, ea, ep

        edc, eenv_a, eenv_p = jax.vmap(env_chan)(envs)      # [C,N], [C,N,Ke]
        edc = jnp.maximum(edc, 0.0).T                       # [N, C]
        eenv_a = jnp.transpose(eenv_a, (1, 0, 2))           # [N, C, Ke]
        eenv_p = jnp.transpose(eenv_p, (1, 0, 2))

        psd = _warped_psd(residual, centers, conf)          # [N, npsd]

    return Chunk(f0=f0, ampl=ampl, phse=phse, hm_mask=mask, psd=psd,
                 edc=edc, eenv_a=eenv_a, eenv_p=eenv_p, conf=conf)


# ---------------------------------------------------------------------------
# synthesis
# ---------------------------------------------------------------------------

def _env_coefs(chunk: Chunk, cyc=None, centers=None):
    """Rotated, voicing-masked envelope-harmonic coefficients:
    (edc [N, C], ar [N, C, Ke], ai [N, C, Ke]).

    eenv_p is measured at the FRAME CENTER (the envelope projection uses
    the center-referenced basis e^{-2 pi j k (cyc - cyc_c)}, exactly like
    the main harmonics), but the renderers evaluate cos(2 pi k cyc(t) +
    phi) against the ABSOLUTE cycle track -- so the coefficients must be
    re-referenced by -2 pi k cyc(c_i) here.  Without this rotation each
    frame's envelope harmonic carried a pseudo-random phase offset and
    the across-frame lerp CANCELLED the modulation: band-noise energy
    was preserved (edc) but its glottal-cycle texture rendered flat
    (measured power-modulation depth 0.003 vs 0.75 true on the voiced-
    fricative fixture -- a bug no energy/PSD oracle could see)."""
    voiced = (chunk.f0 > 0).astype(FP)
    ph = chunk.eenv_p
    if cyc is not None:
        Ke = chunk.eenv_a.shape[-1]
        kh = jnp.arange(1, Ke + 1, dtype=FP)
        rot = kh[None, None, :] * cyc[centers][:, None, None]
        ph = ph / (2.0 * jnp.pi) - rot
        ph = (ph - jnp.round(ph)) * (2.0 * jnp.pi)
    ar = chunk.eenv_a * jnp.cos(ph) * voiced[:, None, None]
    ai = chunk.eenv_a * jnp.sin(ph) * voiced[:, None, None]
    # RMS normalizer: the warped PSD is measured on the MODULATED
    # residual, so it already carries the modulation's power; the
    # synthesis modulator env/base must therefore have unit RMS, i.e.
    # base = sqrt(edc^2 + sum a^2/2), not the mean edc -- dividing by
    # edc double-counted the modulation power (+1.8 dB in deeply
    # modulated breath bands, masked until the envelope phase fix
    # because the modulator had been rendering flat)
    base = jnp.sqrt(chunk.edc ** 2
                    + 0.5 * jnp.sum((chunk.eenv_a
                                     * voiced[:, None, None]) ** 2,
                                    axis=-1))
    return chunk.edc, ar, ai, base


def _render_envelopes(chunk: Chunk, cyc, centers, nx: int, nhop: int,
                      use_pallas: bool = False):
    """Reconstruct per-channel temporal envelopes and their DC baseline
    from edc + eenv harmonics (reference: layer0.c noise synthesis --
    envelope reconstruction).  Returns (env [C, nx], base [C, nx]).

    Rendered directly per sample: envelope coefficients (a cos phi,
    a sin phi, dc) are linearly interpolated between frame centers and
    combined with the shared cycle track -- one fused elementwise op
    instead of per-frame segment synthesis + overlap-add (the envelopes
    are smooth, so parameter-domain interpolation is the natural form).
    """
    N, C, Ke = chunk.eenv_a.shape
    edc_m, ar, ai, base_v = _env_coefs(chunk, cyc, centers)

    if use_pallas and nx == N * nhop:
        from ..ops.pallas_osc import env_render_pallas
        return env_render_pallas(cyc, edc_m, ar, ai, base_v)

    # frame-structured lerp: every sample of frame i interpolates between
    # frames i and i+1, so the "gather" is a broadcast over a [N, nhop]
    # reshape -- zero gather ops (the per-sample a[i0] gather was ~30% of
    # the whole synthesis cost on TPU; see docs/STATUS.md round-2 profile)
    t = ((jnp.arange(nhop, dtype=FP) / nhop)
         [None, :])                                          # [1, nhop]

    def lerp(a):  # [N, ...] -> [nx, ...]
        a0 = a[:-1]
        da = a[1:] - a[:-1]
        sh = (slice(None), slice(None)) + (None,) * (a.ndim - 1)
        out = a0[:, None] + t[sh[:2] + (None,) * (a.ndim - 1)] * da[:, None]
        out = out.reshape((N - 1) * nhop, *a.shape[1:])
        # last frame extends constant (matches clip(i0, 0, N-2) + t clip)
        tail = jnp.broadcast_to(a[-1][None], (nhop, *a.shape[1:]))
        return jnp.concatenate([out, tail], axis=0)[:nx]

    edc_s = lerp(chunk.edc)                                  # [nx, C]
    ar_s = lerp(ar)                                          # [nx, C, Ke]
    ai_s = lerp(ai)
    # envelope oscillators by complex rotation from the base angle: one
    # cos/sin pair instead of Ke transcendental evaluations per sample
    ph1 = 2.0 * jnp.pi * (cyc - jnp.round(cyc))              # [nx]
    c1, s1 = jnp.cos(ph1), jnp.sin(ph1)
    osc_c, osc_s = [c1], [s1]
    for _ in range(Ke - 1):
        osc_c.append(osc_c[-1] * c1 - osc_s[-1] * s1)
        osc_s.append(osc_c[-2] * s1 + osc_s[-1] * c1)
    osc_c = jnp.stack(osc_c, axis=-1)[:, None, :]            # [nx, 1, Ke]
    osc_s = jnp.stack(osc_s, axis=-1)[:, None, :]
    env = edc_s + jnp.sum(ar_s * osc_c - ai_s * osc_s, axis=-1)  # [nx, C]
    base_s = lerp(base_v)                                    # [nx, C]
    return (jnp.maximum(env, 0.0).T,
            jnp.maximum(base_s, 1e-8).T)


def _band_segments(shaped_spec, masks, w, T: int, idft: str):
    """Windowed per-band time segments [C, N, T] from the shaped per-frame
    noise spectrum [N, nbin] (reference: layer0.c noise synthesis -- the
    per-band inverse transforms of the PSD-shaped spectra).

    idft="matmul" (default): the inverse DFT is a [N, nbin] x [nbin, T]
    real contraction with the synthesis window AND the band mask folded
    into the matrix.  T = 2*nhop is mixed-radix (160 at 16 kHz / 5 ms),
    where XLA's TPU FFT runs at ~0.04 TF/s (round-3 roofline) -- two
    orders of magnitude under the MXU; at this size the windowed-iDFT
    matrix is 51 KB and the matmul is exact-f32 at Precision.HIGHEST.
    idft="fft": reference path (channel-paired complex inverse FFTs);
    equality-tested against the matmul path in test_layer0.
    """
    C = int(masks.shape[0])
    nbin = shaped_spec.shape[1]
    if idft == "matmul":
        b = jnp.arange(nbin, dtype=jnp.int32)
        t = jnp.arange(T, dtype=jnp.int32)
        # exact cycles-mod-1 via integer arithmetic before trig
        cycbt = ((b[:, None] * t[None, :]) % T).astype(FP) / T
        ang = 2.0 * jnp.pi * cycbt
        wb = jnp.full((nbin,), 2.0 / T, FP)
        wb = wb.at[0].set(1.0 / T).at[-1].set(1.0 / T)
        scale = wb[:, None] * w[None, :]                     # [nbin, T]
        cos_m = jnp.cos(ang) * scale
        sin_m = jnp.sin(ang) * scale
        # [C, nbin, T] masked bases; x[t] = sum_b Re S_b cos - Im S_b sin
        cos_c = masks[:, :, None] * cos_m[None]
        sin_c = masks[:, :, None] * sin_m[None]
        hp = jax.lax.Precision.HIGHEST
        return (jnp.einsum("nb,cbt->cnt", jnp.real(shaped_spec), cos_c,
                           precision=hp)
                - jnp.einsum("nb,cbt->cnt", jnp.imag(shaped_spec), sin_c,
                             precision=hp))

    # reference path: the per-channel spectra are band-disjoint, so two
    # real inverse transforms share one complex ifft (c0 -> Re, c1 -> Im)
    def _irfft_pair(s0, s1):
        full0 = jnp.concatenate([s0, jnp.conj(s0[..., -2:0:-1])], axis=-1)
        full1 = jnp.concatenate([s1, jnp.conj(s1[..., -2:0:-1])], axis=-1)
        z = jnp.fft.ifft(full0 + 1j * full1, n=T)
        return z.real, z.imag

    segs = []
    c = 0
    while c < C:
        if c + 1 < C:
            b0, b1 = _irfft_pair(shaped_spec * masks[c][None, :],
                                 shaped_spec * masks[c + 1][None, :])
            segs += [b0 * w[None, :], b1 * w[None, :]]
            c += 2
        else:
            segs.append(jnp.fft.irfft(
                shaped_spec * masks[c][None, :], n=T) * w[None, :])
            c += 1
    return jnp.stack(segs)


def _synth_noise(chunk: Chunk, cyc, nx: int, key, fs: float,
                 nhop: int, use_pallas: bool = False,
                 idft: str = "matmul", frame_base: int | jnp.ndarray = 0
                 ) -> jnp.ndarray:
    """Stochastic noise component: WOLA-filtered white noise shaped by the
    warped PSD, band-split, then modulated by the reconstructed temporal
    envelopes (reference: layer0.c noise synthesis path).  Renders at the
    (possibly different) output rate fs.

    frame_base: global index of this array's first frame.  Each frame's
    random spectrum is keyed by (key, frame_base + row), so a shard that
    renders frames [i0, i0+nl) with frame_base=i0 draws the SAME spectra
    the single-device render draws for those frames -- the frame-sharded
    synthesis (parallel.seqparallel) is shard-count-invariant."""
    conf = chunk.conf
    N = chunk.nfrm
    T = 2 * nhop
    nbin = T // 2 + 1

    centers = jnp.arange(N, dtype=jnp.int32) * nhop

    # sqrt-Hann WOLA pair: perfect reconstruction at 50% overlap
    w = jnp.sqrt(0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * (jnp.arange(T) + 0.5) / T))
    w = w.astype(FP)

    # PSD axis is warped over the ANALYSIS band [0, conf.fs/2]; the output
    # grid spans [0, fs/2].  SPEC for fs > conf.fs (upsampling): the
    # analysis carries no information above its own Nyquist, so the noise
    # rolls off with a raised-cosine taper over the top 5% of the
    # analysis band and is ZERO beyond -- extrapolating the top PSD band
    # flat to the new Nyquist (round 1) invented broadband hiss
    # (VERDICT r1 weak #5 / next #7; tested in
    # tests/test_methods.py::test_upsampled_noise_rolls_off).
    f = jnp.arange(nbin) * fs / T
    nyq_a = conf.fs / 2.0
    wmax = warp.warp_frequency(nyq_a, conf.noswarp)
    pos = jnp.clip(warp.warp_frequency(f, conf.noswarp) / wmax
                   * conf.npsd - 0.5, 0.0, conf.npsd - 1.0)
    gain = jnp.sqrt(jnp.maximum(
        jax.vmap(lambda p: interp.interp1_uniform(p, pos))(chunk.psd), 0.0))
    if fs > conf.fs:
        edge0 = 0.95 * nyq_a
        taper = jnp.where(
            f <= edge0, 1.0,
            jnp.where(f >= nyq_a, 0.0,
                      0.5 + 0.5 * jnp.cos(jnp.pi * (f - edge0)
                                          / (nyq_a - edge0))))
        gain = gain * taper[None, :]

    # sample each frame's windowed-noise spectrum DIRECTLY in the frequency
    # domain (iid complex gaussian bins): one fewer FFT per frame and no
    # noise-stream gather.  iid bins produce stationary (unwindowed)
    # segments, so the output power after the w-weighted OLA is
    # mean(w_synth^2 * sum-of-overlaps) = sum(w^2)/T of the per-bin
    # variance; calibrating the variance to T (not sum(w^2)) makes the
    # synthesized PSD match the analysis periodogram convention exactly
    # (validated by TestRoundTrip.test_noise_psd_reproduced).
    fidx = frame_base + jnp.arange(N, dtype=jnp.int32)

    def _frame_bins(i):
        kr, ki = jax.random.split(jax.random.fold_in(key, i))
        return (jax.random.normal(kr, (nbin,), FP),
                jax.random.normal(ki, (nbin,), FP))

    re, im = jax.vmap(_frame_bins)(fidx)
    im = im.at[:, 0].set(0.0).at[:, -1].set(0.0)
    scale = jnp.full((nbin,), jnp.sqrt(T / 2.0))
    scale = scale.at[0].set(jnp.sqrt(float(T))).at[-1].set(
        jnp.sqrt(float(T)))
    spec = (re + 1j * im) * scale[None, :]                      # [N, nbin]
    edges = conf.chan_edges

    shaped_spec = spec * gain                                   # [N, nbin]
    masks = jnp.stack([
        ((f >= edges[c]) & (f < edges[c + 1])).astype(FP)
        for c in range(conf.nchannel)])                         # [C, nbin]

    band_segs = _band_segments(shaped_spec, masks, w, T, idft)  # [C, N, T]

    if use_pallas and nx == chunk.nfrm * nhop:
        # fused path: envelope render + band OLA + modulation + band sum
        # in one kernel -- the [C, nx] env/base tensors and per-band OLA
        # signals never reach HBM (ops.pallas_osc.noise_mod_ola_pallas)
        from ..ops.pallas_osc import noise_mod_ola_pallas
        edc_m, ar, ai, base_v = _env_coefs(chunk, cyc, centers)
        return noise_mod_ola_pallas(cyc, edc_m, ar, ai, base_v, band_segs)

    env, base = _render_envelopes(chunk, cyc, centers, nx, nhop)  # [C, nx]
    y = jnp.zeros(nx, FP)
    for c in range(conf.nchannel):
        band = harmonics.overlap_add_half(band_segs[c], nhop, nx)
        y = y + band * (env[c] / base[c])
    return y


def synthesize(opt: SynthesisOptions, chunk: Chunk) -> SynthResult:
    """Synthesize a chunk back to a waveform (reference: layer0.c ->
    llsm_synthesize(soptions, chunk))."""
    return _synthesize_jit(opt, chunk)


@functools.partial(jax.jit, static_argnums=0)
def _synthesize_jit(opt: SynthesisOptions, chunk: Chunk) -> SynthResult:
    conf = chunk.conf
    fs = opt.fs
    # render DIRECTLY at the requested output rate (reference: soptions.fs;
    # the C library resamples -- here the oscillator bank and noise WOLA
    # just run on the output sample grid, masking harmonics above the new
    # Nyquist).  Rates with a non-integral hop (e.g. 44100 @ 5 ms) render
    # at the nearest integral-hop rate and rational-resample the output
    # (ciglet.h -> rresample).
    if abs(conf.thop * fs - round(conf.thop * fs)) > 1e-6:
        fs_render = max(round(conf.thop * fs), 1) / conf.thop
        import dataclasses as _dc
        res = _synthesize_jit(_dc.replace(opt, fs=fs_render), chunk)
        from ..ops import resample
        ny = int(round(chunk.nfrm * conf.thop * fs))
        return SynthResult(
            y=resample.resample_to(res.y, fs_render, fs, ny=ny),
            y_sin=resample.resample_to(res.y_sin, fs_render, fs, ny=ny),
            y_nos=resample.resample_to(res.y_nos, fs_render, fs, ny=ny),
            fs=fs)
    nhop = int(round(conf.thop * fs))
    nx = chunk.nfrm * nhop
    centers = jnp.arange(chunk.nfrm, dtype=jnp.int32) * nhop
    cyc = harmonics.sample_cycles(chunk.f0, nhop, fs, nx)

    K = chunk.ampl.shape[-1]
    kharm = jnp.arange(1, K + 1, dtype=FP)
    nyq_mask = (kharm[None, :] * jnp.where(chunk.f0 > 0, chunk.f0, 100.0)
                [:, None]) < 0.5 * fs
    hm_mask = chunk.hm_mask * nyq_mask

    with jax.named_scope("llsm.synth.harmonic"):
        segs = harmonics.oscillator_bank(cyc, centers, chunk.ampl,
                                         chunk.phse, hm_mask,
                                         nhop=nhop,
                                         use_pallas=opt.use_pallas)
        y_sin = harmonics.overlap_add_half(segs, nhop, nx)

    with jax.named_scope("llsm.synth.noise"):
        key = jax.random.PRNGKey(opt.noise_seed)
        y_nos = _synth_noise(chunk, cyc, nx, key, fs, nhop,
                             use_pallas=opt.use_pallas,
                             idft=opt.noise_idft)

    return SynthResult(y=y_sin + y_nos, y_sin=y_sin, y_nos=y_nos, fs=fs)


# ---------------------------------------------------------------------------
# batched entry points (public API sugar over the vmapped pipeline)
# ---------------------------------------------------------------------------

def analyze_batch(opt: AnalysisOptions, x, f0) -> Chunk:
    """Batched analysis: x [B, nx], f0 [B, nfrm] -> Chunk with leading
    batch axis.  Shard the inputs over a mesh's batch axis (see
    parallel.mesh.shard_batch) to run data-parallel."""
    return jax.vmap(lambda a, b: _analyze_jit(opt, a, b))(
        jnp.asarray(x, FP), jnp.asarray(f0, FP))


def synthesize_batch(opt: SynthesisOptions, chunk: Chunk) -> SynthResult:
    """Batched synthesis of a chunk with a leading batch axis."""
    return jax.vmap(lambda c: _synthesize_jit(opt, c))(chunk)
