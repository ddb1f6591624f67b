"""Parameter-domain edit tests beyond BASELINE config 4 (pitch/stretch,
tested in test_layer1.py): formant shift and breathiness — the user-side
chunk manipulations the reference enables between tolayer1/tolayer0
(layer1.c)."""
import numpy as np
import pytest

from libllsm2_tpu import create_aoptions, create_soptions
from libllsm2_tpu.models import edits, layer0, layer1
from libllsm2_tpu.utils import testsig


@pytest.fixture(scope="module")
def l1chunk():
    x, f0 = testsig.make_test_utterance(duration=0.6, noise_level=0.05)
    return x, f0, layer1.chunk_to_layer1(
        layer0.analyze(create_aoptions(), x, f0))


def _formant_hz(chunk, lo_hz=300.0, hi_hz=1800.0):
    """Energy centroid of the harmonic amplitudes in [lo, hi) Hz over the
    voiced frames — tracks the strongest low formant."""
    f0 = np.asarray(chunk.f0)
    a = np.asarray(chunk.ampl)
    v = f0 > 0
    k = np.arange(1, a.shape[1] + 1)
    fk = f0[v][:, None] * k[None, :]
    w = a[v] ** 2 * ((fk >= lo_hz) & (fk < hi_hz))
    return float(np.sum(w * fk) / np.sum(w))


def test_formant_shift_moves_formants_not_pitch(l1chunk):
    x, f0, l1 = l1chunk
    r = 1.3
    up = edits.formant_shift(l1, r)
    # F0 untouched (compare against the chunk's refined track, not the
    # raw input track)
    np.testing.assert_array_equal(np.asarray(up.f0), np.asarray(l1.f0))
    # the low-formant centroid scales by ~r (envelope sampling at the
    # unchanged harmonic grid quantizes it; allow 10%)
    c0 = _formant_hz(l1)
    c1 = _formant_hz(up, lo_hz=300.0 * r, hi_hz=1800.0 * r)
    assert abs(c1 / c0 - r) < 0.1 * r, (c0, c1)
    # renders cleanly
    y = np.asarray(layer0.synthesize(create_soptions(), up).y)
    assert np.all(np.isfinite(y)) and np.std(y) > 0.05 * np.std(x)


def test_formant_shift_down_then_up_roundtrips_envelope(l1chunk):
    """vtmagn warp by r then 1/r must return the envelope below
    fnyq/r (two-tap lerp loses only interpolation error)."""
    x, f0, l1 = l1chunk
    down = edits.formant_shift(l1, 1.0 / 1.25)
    back = edits.formant_shift(down, 1.25)
    nspec = l1.vtmagn.shape[-1]
    keep = int(nspec / 1.25) - 2
    a = np.asarray(l1.vtmagn)[:, :keep]
    b = np.asarray(back.vtmagn)[:, :keep]
    assert np.mean(np.abs(a - b)) < 0.05, np.mean(np.abs(a - b))


def test_breathiness_scales_noise_only(l1chunk):
    x, f0, l1 = l1chunk
    sopt = create_soptions()
    base = layer0.synthesize(sopt, l1)
    breathy = layer0.synthesize(sopt, edits.breathiness(l1, 6.0))
    e = lambda s: float(np.sum(np.asarray(s) ** 2))
    gain_db = 10 * np.log10(e(breathy.y_nos) / e(base.y_nos))
    assert abs(gain_db - 6.0) < 0.5, gain_db
    np.testing.assert_allclose(np.asarray(breathy.y_sin),
                               np.asarray(base.y_sin), atol=1e-6)


def test_breathiness_rd_relaxation_tilts_spectrum(l1chunk):
    """rd_delta > 0 (laxer glottis) must reduce high-frequency harmonic
    energy relative to lows."""
    x, f0, l1 = l1chunk
    lax_ = edits.breathiness(l1, 0.0, rd_delta=1.0)

    def hf_lf(ch):
        f0v = np.asarray(ch.f0)
        a = np.asarray(ch.ampl)
        v = f0v > 0
        k = np.arange(1, a.shape[1] + 1)
        fk = f0v[v][:, None] * k[None, :]
        p = a[v] ** 2
        return (np.sum(p * (fk > 2000.0))
                / max(np.sum(p * ((fk > 100.0) & (fk < 1000.0))), 1e-12))

    assert hf_lf(lax_) < 0.7 * hf_lf(l1), (hf_lf(lax_), hf_lf(l1))
