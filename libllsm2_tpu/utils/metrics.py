"""Evaluation metrics for analysis/synthesis quality.

SNR is only meaningful for the deterministic harmonic component (the
stochastic noise part has a different PRNG realization than the source,
by design -- SURVEY.md section 7 design decision 4); log-spectral
distance and band-energy error are the right oracles for the noise model.
"""
from __future__ import annotations

import numpy as np


def snr_db(ref, est, trim: float = 0.05) -> float:
    """Time-domain SNR in dB over the interior (OLA edges trimmed)."""
    ref = np.asarray(ref, np.float64)
    est = np.asarray(est, np.float64)
    n = min(len(ref), len(est))
    lo, hi = int(trim * n), int((1 - trim) * n)
    e = ref[lo:hi] - est[lo:hi]
    return float(10 * np.log10(
        np.sum(ref[lo:hi] ** 2) / max(np.sum(e ** 2), 1e-20)))


def log_spectral_distance_db(ref, est, fs: float = 16000.0,
                             nwin: int = 512, lo_hz: float = 50.0,
                             smooth_bins: int = 0) -> float:
    """Mean log-spectral distance (dB RMS over time-frequency) between two
    signals, from Welch-style averaged frame spectra.

    smooth_bins > 0 averages POWER over that many adjacent frequency bins
    before the log: raw per-bin comparison of two different noise
    REALIZATIONS has an irreducible ~10 dB RMS floor (chi-square bin
    variance), so envelope-level oracles for stochastic components must
    compare smoothed spectra."""
    from scipy import signal as sps

    ref = np.asarray(ref, np.float64)
    est = np.asarray(est, np.float64)
    n = min(len(ref), len(est))
    f, t, Sr = sps.stft(ref[:n], fs, nperseg=nwin)
    _, _, Se = sps.stft(est[:n], fs, nperseg=nwin)
    pr, pe = np.abs(Sr) ** 2, np.abs(Se) ** 2
    if smooth_bins > 1:
        k = np.ones(smooth_bins) / smooth_bins
        pr = np.apply_along_axis(lambda v: np.convolve(v, k, "same"), 0, pr)
        pe = np.apply_along_axis(lambda v: np.convolve(v, k, "same"), 0, pe)
    band = f >= lo_hz
    # floor at -80 dB below the joint peak: silence/near-silence bins
    # otherwise dominate the RMS with meaningless log ratios
    floor = max(pr.max(), pe.max(), 1e-18) * 1e-8
    lr = 10 * np.log10(np.maximum(pr[band], floor))
    le = 10 * np.log10(np.maximum(pe[band], floor))
    return float(np.sqrt(np.mean((lr - le) ** 2)))


def _mel_filterbank(fs: float, nfft: int, nmel: int,
                    lo_hz: float, hi_hz: float) -> np.ndarray:
    """[nmel, nfft//2+1] triangular mel filterbank (HTK-style mel scale)."""
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)

    mpts = np.linspace(hz_to_mel(lo_hz), hz_to_mel(min(hi_hz, fs / 2)),
                       nmel + 2)
    fpts = mel_to_hz(mpts)
    bins = np.fft.rfftfreq(nfft, 1.0 / fs)
    fb = np.zeros((nmel, len(bins)))
    for m in range(nmel):
        l, c, r = fpts[m], fpts[m + 1], fpts[m + 2]
        up = (bins - l) / max(c - l, 1e-9)
        dn = (r - bins) / max(r - c, 1e-9)
        fb[m] = np.clip(np.minimum(up, dn), 0.0, None)
    return fb


def mel_cepstral_distortion_db(ref, est, fs: float = 16000.0,
                               nwin: int = 400, nhop: int = 160,
                               nmel: int = 40, ncep: int = 13,
                               lo_hz: float = 50.0,
                               energy_gate_db: float = 40.0) -> float:
    """Mel-cepstral distortion (dB) between two time-aligned signals —
    the standard auditory-weighted vocoder quality figure (the right
    oracle for coder/VQ/acoustic paths where waveform SNR is documented
    as the wrong measure; VERDICT r3 missing #3).

    MCD_t = (10*sqrt(2)/ln 10) * ||c_ref[1:ncep] - c_est[1:ncep]||_2 per
    frame (c0 excluded: overall gain is scored separately by SNR/band
    metrics), averaged over frames whose reference energy is within
    `energy_gate_db` of the utterance peak (silence frames carry no
    perceptual information and would dilute the number).

    Typical anchors: identical signals 0; transparent vocoding < 2–3 dB;
    good parametric vocoders 4–6 dB; intelligible-but-degraded ~8+ dB.
    """
    from scipy.fft import dct

    ref = np.asarray(ref, np.float64)
    est = np.asarray(est, np.float64)
    n = min(len(ref), len(est))
    ref, est = ref[:n], est[:n]
    if n < nwin:
        raise ValueError(f"signals too short for MCD ({n} < {nwin})")
    w = np.hanning(nwin)
    fb = _mel_filterbank(fs, nwin, nmel, lo_hz, fs / 2)

    def mel_power(x):
        nfrm = 1 + (len(x) - nwin) // nhop
        idx = (np.arange(nfrm)[:, None] * nhop + np.arange(nwin)[None, :])
        fr = x[idx] * w[None, :]
        p = np.abs(np.fft.rfft(fr, axis=-1)) ** 2
        return p @ fb.T, p.sum(axis=-1)

    mr, er = mel_power(ref)
    me, _ = mel_power(est)
    # joint relative floor (-80 dB below the louder signal's peak band):
    # an absolute floor lets empty mel bands dominate the cepstral
    # distance with meaningless log ratios on sparse spectra (same
    # physics as log_spectral_distance_db's floor)
    floor = max(mr.max(), me.max(), 1e-18) * 1e-8
    cr = dct(np.log(np.maximum(mr, floor)), type=2, norm="ortho", axis=-1)
    ce = dct(np.log(np.maximum(me, floor)), type=2, norm="ortho", axis=-1)
    gate = er > er.max() * 10.0 ** (-energy_gate_db / 10.0)
    if not gate.any():
        gate = np.ones_like(gate)
    d = cr[gate, 1:ncep] - ce[gate, 1:ncep]
    # standard-convention scaling: the 10*sqrt(2)/ln10 factor expects
    # cepstra of the log-AMPLITUDE spectrum under the c_d = (1/M) sum
    # convention; converting from ortho-DCT-of-log-POWER coefficients
    # gives (10 / (2 ln10)) * sqrt(sum d^2 / M) per frame
    mcd = (10.0 / (2.0 * np.log(10.0))) * np.sqrt(
        np.sum(d ** 2, axis=-1) / nmel)
    return float(np.mean(mcd))


def band_energy_error_db(ref, est, fs: float = 16000.0,
                         edges=(0, 1000, 2000, 4000, 8000)) -> float:
    """Max absolute band-energy ratio (dB) across the given bands."""
    ref = np.asarray(ref, np.float64)
    est = np.asarray(est, np.float64)
    n = min(len(ref), len(est))
    sr = np.abs(np.fft.rfft(ref[:n])) ** 2
    se = np.abs(np.fft.rfft(est[:n])) ** 2
    f = np.fft.rfftfreq(n, 1 / fs)
    worst = 0.0
    for lo, hi in zip(edges[:-1], edges[1:]):
        b = (f >= lo) & (f < hi)
        r = 10 * np.log10((se[b].sum() + 1e-12) / (sr[b].sum() + 1e-12))
        worst = max(worst, abs(r))
    return float(worst)
