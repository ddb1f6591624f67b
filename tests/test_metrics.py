"""Metric-layer sanity oracles.

Pins the mel-cepstral distortion implementation to the standard anchor
scale (transparent < 2-3 dB, clearly degraded > 4 dB) so the coder/VQ
rate-distortion numbers built on it stay comparable across rounds.
"""
import numpy as np
from scipy import signal as sps

from libllsm2_tpu.utils import metrics


def _speechlike(fs=16000, dur=2.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(fs * dur)) / fs
    src = sps.square(2 * np.pi * 120 * t) + 0.05 * rng.standard_normal(len(t))
    b, a = sps.butter(2, [500 / (fs / 2), 2500 / (fs / 2)], "bandpass")
    return sps.lfilter(b, a, src)


def test_mcd_anchors():
    fs = 16000
    x = _speechlike(fs)
    rng = np.random.default_rng(1)
    assert metrics.mel_cepstral_distortion_db(x, x, fs) == 0.0
    # gain-invariant (c0 excluded)
    assert metrics.mel_cepstral_distortion_db(x, 2.0 * x, fs) < 1e-9
    # -40 dB additive noise reads as near-transparent
    near = metrics.mel_cepstral_distortion_db(
        x, x + 0.01 * np.std(x) * rng.standard_normal(len(x)), fs)
    assert near < 2.5, near
    # -20 dB additive noise reads as clearly degraded, monotonically worse
    deg = metrics.mel_cepstral_distortion_db(
        x, x + 0.1 * np.std(x) * rng.standard_normal(len(x)), fs)
    assert 3.0 < deg < 8.0 and deg > near, deg
    # unrelated white noise is far worse still
    bad = metrics.mel_cepstral_distortion_db(
        x, np.std(x) * rng.standard_normal(len(x)), fs)
    assert bad > deg + 2.0, bad


def test_mcd_formant_sensitivity():
    """A formant shift the waveform-SNR metric scores as total failure
    must register as a moderate spectral distortion, and a small one as
    a small distortion (the property that makes MCD the right oracle for
    parameter-faithful-but-phase-lossy transports)."""
    fs = 16000
    rng = np.random.default_rng(2)
    t = np.arange(fs * 2) / fs
    src = sps.square(2 * np.pi * 120 * t) + 0.05 * rng.standard_normal(len(t))

    def formants(lo, hi):
        b, a = sps.butter(2, [lo / (fs / 2), hi / (fs / 2)], "bandpass")
        return sps.lfilter(b, a, src)

    x = formants(500, 2500)
    small = metrics.mel_cepstral_distortion_db(x, formants(550, 2600), fs)
    big = metrics.mel_cepstral_distortion_db(x, formants(900, 4000), fs)
    assert small < 2.0, small
    assert big > 2.0 * small, (small, big)
