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
