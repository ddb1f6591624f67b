"""Voiced-fricative oracles (VERDICT r2 missing #2, final piece):
simultaneous strong harmonics and strong glottal-cycle-modulated noise
(testsig.synth_voiced_fricative, /z/-like).  This family caught two
real defects in round 3:

1. The noise-envelope harmonics rendered with absolute-cycle phases
   against center-referenced measurements -- band-noise ENERGY was
   preserved but its glottal-cycle texture rendered flat (power-
   modulation depth 0.003 vs 0.75 true).  No energy/PSD oracle could
   see it; the modulation-depth oracle here pins it.
2. The track denoiser's coherent across-k fit was polluted by the
   noise-dominated high tracks, injecting noise into the STRONG low
   harmonics (-10 dB on the voiced band); fixed by per-track SNR
   weights in the fit.
"""
import numpy as np

from libllsm2_tpu import create_aoptions, create_soptions
from libllsm2_tpu.models import layer0
from libllsm2_tpu.utils import metrics, testsig

OPT = create_aoptions()
SOPT = create_soptions()


def _bp(s, flo, fhi, fs=16000.0):
    S = np.fft.rfft(s)
    f = np.fft.rfftfreq(len(s), 1 / fs)
    S *= (f >= flo) & (f <= fhi)
    return np.fft.irfft(S, len(s))


def _setup():
    x, f0, xh, cycles = testsig.synth_voiced_fricative(
        duration=1.0, seed=3, return_parts=True)
    ch = layer0.analyze(OPT, x, f0)
    out = layer0.synthesize(SOPT, ch)
    v = np.where(np.asarray(f0) > 0)[0]
    lo = v[int(0.10 * len(v))] * 80
    hi = v[int(0.85 * len(v))] * 80
    return x, f0, xh, cycles, out, lo, hi


def test_voiced_band_snr_with_strong_frication():
    """The harmonics BELOW the frication band must survive the strong
    in-band noise above them (and the default denoiser must not damage
    them).  Round-4 regression caught here: the global-FFT spectral gate
    subtracted a whole-utterance noise level from tracks k=26..28, which
    glide in and out of the frication band as F0 moves -- eating their
    CLEAN low-F0 spans (34.1 dB).  Fixed with the per-frame local-
    noisiness blend in layer0._spectral_gate (44.9 measured); floor 44."""
    x, f0, xh, cycles, out, lo, hi = _setup()
    ysin = np.asarray(out.y_sin)
    s = metrics.snr_db(_bp(xh[lo:hi], 0, 2800), _bp(ysin[lo:hi], 0, 2800),
                       trim=0.0)
    assert s > 44.0, s


def test_frication_modulation_depth_reproduced():
    """The glottal-cycle modulation of the frication noise must survive
    the edc/eenv round trip: power-modulation depth at the fundamental
    (projection of the band-noise power onto e^{2 pi j cycles}) within
    a factor ~1.3 of the input's (measured 0.74 vs 0.78; was 0.08
    before the envelope phase-reference fix)."""
    x, f0, xh, cycles, out, lo, hi = _setup()
    cy = cycles[lo:hi]

    def depth(s):
        e = s ** 2
        return abs(np.mean(e * np.exp(-2j * np.pi * cy))
                   / max(np.mean(e), 1e-12))

    d_in = depth(_bp(x[lo:hi] - xh[lo:hi], 3000, 7500))
    d_out = depth(_bp(np.asarray(out.y_nos)[lo:hi], 3000, 7500))
    assert d_in > 0.6          # the fixture really is strongly modulated
    assert d_out > 0.75 * d_in, (d_in, d_out)


def test_frication_band_energy_reproduced():
    """TOTAL frication-band energy must reproduce (measured -0.6 dB).
    Note the attribution split: the slow (<15 Hz) part of the in-band
    noise landing on harmonic tracks is legitimately carried by y_sin
    (slow AM of the harmonics -- inseparable per frame), so y_nos alone
    undercounts by ~2 dB while the total is conserved; the noise
    component itself is bounded looser."""
    x, f0, xh, cycles, out, lo, hi = _setup()
    n_in = _bp(x[lo:hi] - xh[lo:hi], 3000, 7500)
    y_tot = _bp(np.asarray(out.y)[lo:hi], 3000, 7500)
    r = 10 * np.log10(np.sum(y_tot ** 2) / np.sum(n_in ** 2))
    assert abs(r) < 1.5, r
    n_out = _bp(np.asarray(out.y_nos)[lo:hi], 3000, 7500)
    r_nos = 10 * np.log10(np.sum(n_out ** 2) / np.sum(n_in ** 2))
    assert abs(r_nos) < 3.0, r_nos
