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
    energy relative to lows.  The fixture is a RANDOM-PHASE harmonic
    source (no true glottal Rd exists, so the fitted track is ambiguous
    -- with the round-4 1 kHz fit cap it lands bimodally at the grid
    edges and +1.0 mostly clamps); pin rd to a known mid value so the
    test exercises the EDIT, not the out-of-model fit."""
    import jax.numpy as jnp

    x, f0, l1 = l1chunk
    l1 = layer1.chunk_to_layer0(
        l1.replace(rd=jnp.full(l1.nfrm, 0.5, jnp.float32)))
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


# ---------------------------------------------------------------------------
# Phase coherence of F0 edits, vibrato/tremolo, morph, concat
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def const_l1():
    """Constant-F0 fixture: the unedited render is exactly periodic, so
    periodicity at the (edited) period is a sharp OLA-coherence oracle."""
    f0 = np.full(160, 140.0)
    x, _ = testsig.synth_harmonic(f0, seed=1)
    chunk = layer0.analyze(create_aoptions(), x, f0)
    return x, layer1.chunk_to_layer1(chunk)


def _periodicity(y, f0_hz, fs=16000.0):
    """Normalized autocorrelation at the target period, middle 60%."""
    n = len(y)
    y = y[n // 5: -n // 5]
    lag = int(round(fs / f0_hz))
    a, b = y[:-lag], y[lag:]
    return float(np.dot(a, b) / np.sqrt(np.dot(a, a) * np.dot(b, b) + 1e-20))


def test_pitch_shift_phase_coherence(const_l1):
    """pitch_shift must re-propagate vsphse onto the new F0 track.
    Without the re-ramp the regenerated frame phases advance at the OLD
    F0's rate and the synthesis OLA decorrelates (measured periodicity at
    the new period: 0.45 at x2.0, 0.13 at x0.7); with it the render is as
    periodic as the unedited one (>= 0.99)."""
    x, l1 = const_l1
    sopt = create_soptions()
    for r in (2.0, 0.7):
        y = np.asarray(layer0.synthesize(sopt, edits.pitch_shift(l1, r)).y_sin)
        p = _periodicity(y, 140.0 * r)
        assert p >= 0.98, (r, p)


def test_vibrato_frequency_modulation(const_l1):
    """Applied vibrato must come back out of the rendered audio: re-track
    F0 of the render and check the modulation rate and depth."""
    x, l1 = const_l1
    from libllsm2_tpu.ops import f0 as f0mod
    rate, depth = 5.0, 0.8                  # Hz, semitones
    vib = edits.vibrato(l1, rate_hz=rate, depth_semitones=depth)
    y = np.asarray(layer0.synthesize(create_soptions(), vib).y_sin)
    cfg = f0mod.F0Config(fs=16000.0, nhop=80)
    tr = np.asarray(f0mod.track(cfg, np.asarray(y, np.float32)))
    tr = tr[12:-12]
    tr = tr[tr > 0]
    semis = 12.0 * np.log2(tr / np.median(tr))
    # depth: the semitone excursion amplitude (robust peak estimate)
    est_depth = float(np.percentile(np.abs(semis), 95))
    assert abs(est_depth - depth) < 0.25 * depth, est_depth
    # rate: spectral peak of the semitone track at the frame rate
    sp = np.abs(np.fft.rfft(semis - semis.mean()))
    fgrid = np.fft.rfftfreq(len(semis), 0.005)
    est_rate = float(fgrid[sp.argmax()])
    assert abs(est_rate - rate) < 0.6, est_rate


def test_tremolo_amplitude_modulation(const_l1):
    x, l1 = const_l1
    rate, depth_db = 4.0, 4.0
    trm = edits.tremolo(l1, rate_hz=rate, depth_db=depth_db)
    y = np.asarray(layer0.synthesize(create_soptions(), trm).y)
    rms = np.sqrt(np.mean(y.reshape(-1, 80) ** 2, axis=1))[8:-8]
    ldb = 20 * np.log10(np.maximum(rms, 1e-9))
    ldb = ldb - ldb.mean()
    # quadrature demodulation at the applied rate: the pulse-like waveform
    # aliases +-5 dB of wideband fluctuation into 5 ms frame RMS even
    # unedited, but it is incoherent with the modulator
    t = np.arange(len(ldb)) * 0.005
    est_depth = 2.0 * abs(np.mean(ldb * np.exp(-2j * np.pi * rate * t)))
    assert abs(est_depth - depth_db) < 0.25 * depth_db, est_depth
    # dominant low-frequency line sits at the applied rate
    sp = np.abs(np.fft.rfft(ldb))
    fgrid = np.fft.rfftfreq(len(ldb), 0.005)
    band = fgrid < 15.0
    est_rate = float(fgrid[band][sp[band].argmax()])
    assert abs(est_rate - rate) < 0.6, est_rate


@pytest.fixture(scope="module")
def two_voices():
    """Two different voices: A = 140 Hz default formants, B = 210 Hz with
    shifted formants (both layer-1)."""
    xa, f0a = testsig.make_test_utterance(duration=0.8)
    f0b = testsig.make_f0_track(130, 0.005, f0_base=210.0)
    xb, _ = testsig.synth_lf_speech(
        f0b, formants=((500, 70), (1500, 100), (2400, 150)),
        noise_level=0.01)
    opt = create_aoptions()
    la = layer1.chunk_to_layer1(layer0.analyze(opt, xa, f0a))
    lb = layer1.chunk_to_layer1(layer0.analyze(opt, np.asarray(xb), f0b))
    return la, lb


def test_morph_endpoints_and_midpoint(two_voices):
    la, lb = two_voices
    m0 = edits.morph(la, lb, 0.0)
    np.testing.assert_allclose(np.asarray(m0.f0), np.asarray(la.f0),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(m0.vtmagn), np.asarray(la.vtmagn),
                               atol=1e-4)
    m1 = edits.morph(la, lb, 1.0)
    mid = la.nfrm // 2
    # t=1 midpoint F0 equals b's (time-normalized) midpoint F0
    assert abs(float(m1.f0[mid]) - 210.0) < 8.0, float(m1.f0[mid])
    # t=0.5 midpoint F0 is the geometric mean
    m5 = edits.morph(la, lb, 0.5)
    geo = np.sqrt(float(la.f0[mid]) * float(m1.f0[mid]))
    assert abs(float(m5.f0[mid]) - geo) < 5.0, (float(m5.f0[mid]), geo)
    # every t renders finite with energy
    for c in (m0, m5, m1):
        y = np.asarray(layer0.synthesize(create_soptions(), c).y)
        assert np.all(np.isfinite(y)) and np.std(y) > 0.02


def test_morph_formants_glide(two_voices):
    """The low-formant centroid at t=0.5 must sit between the two voices'
    (A: F1=700, B: F1=500)."""
    la, lb = two_voices
    m5 = edits.morph(la, lb, 0.5)
    c_a = _formant_hz(la, 300.0, 1000.0)
    c_b = _formant_hz(lb, 300.0, 1000.0)
    c_m = _formant_hz(m5, 300.0, 1000.0)
    lo, hi = min(c_a, c_b), max(c_a, c_b)
    assert lo - 30.0 < c_m < hi + 30.0, (c_a, c_m, c_b)


def test_morph_time_varying_weight(two_voices):
    """Per-frame t: starts as voice A, ends as voice B."""
    la, lb = two_voices
    t = np.linspace(0.0, 1.0, la.nfrm).astype(np.float32)
    m = edits.morph(la, lb, t)
    full_b = edits.morph(la, lb, 1.0)       # b time-normalized to a's grid
    assert abs(float(m.f0[1]) - float(la.f0[1])) < 2.0
    assert abs(float(m.f0[-2]) - float(full_b.f0[-2])) < 2.0
    y = np.asarray(layer0.synthesize(create_soptions(), m).y)
    assert np.all(np.isfinite(y))


def test_concat_resplice_is_transparent():
    """Cutting a chunk in two (with overlap) and concat-ing it back must
    reproduce the original harmonic render: the per-harmonic overlap
    alignment absorbs the sliced units' phase-convention offset."""
    x, f0 = testsig.make_test_utterance(duration=0.8)
    ch = layer0.analyze(create_aoptions(), x, f0)
    n0, xf = 80, 8
    j = edits.concat(edits.excerpt(ch, 0, n0 + xf),
                     edits.excerpt(ch, n0, ch.nfrm), xf)
    assert j.nfrm == ch.nfrm
    np.testing.assert_allclose(np.asarray(j.f0), np.asarray(ch.f0),
                               rtol=1e-5)
    sopt = create_soptions()
    yj = np.asarray(layer0.synthesize(sopt, j).y_sin)
    yo = np.asarray(layer0.synthesize(sopt, ch).y_sin)
    err = np.sum((yj - yo) ** 2)
    snr = 10 * np.log10(np.sum(yo ** 2) / max(err, 1e-20))
    assert snr >= 60.0, snr


def test_concat_cross_voice_seam():
    """Joining two different utterances renders finite with no synthesis
    blow-up or dead zone at the seam."""
    xa, f0a = testsig.make_test_utterance(duration=0.6)
    f0b = testsig.make_f0_track(100, 0.005, f0_base=185.0)
    xb, _ = testsig.synth_harmonic(f0b, seed=3)
    opt = create_aoptions()
    ca = layer0.analyze(opt, xa, f0a)
    cb = layer0.analyze(opt, xb, f0b)
    j = edits.concat(ca, cb, 8)
    assert j.nfrm == ca.nfrm + cb.nfrm - 8
    y = np.asarray(layer0.synthesize(create_soptions(), j).y)
    assert np.all(np.isfinite(y))
    rms = np.sqrt(np.mean(y[:j.nfrm * 80].reshape(-1, 80) ** 2, axis=1))
    seam = rms[ca.nfrm - 8: ca.nfrm + 8]
    assert seam.min() > 0.3 * np.median(rms[10:-10]), seam.min()


def test_excerpt_render_matches_segment():
    """The harmonic render of an excerpt equals the corresponding segment
    of the full render (frame phases are mutually consistent under
    slicing)."""
    x, f0 = testsig.make_test_utterance(duration=0.8)
    ch = layer0.analyze(create_aoptions(), x, f0)
    sopt = create_soptions()
    seg = edits.excerpt(ch, 40, 120)
    ys = np.asarray(layer0.synthesize(sopt, seg).y_sin)
    yf = np.asarray(layer0.synthesize(sopt, ch).y_sin)[40 * 80: 120 * 80]
    # ignore the OLA onset/tail edges of the excerpt render
    s, e = 6 * 80, -6 * 80
    err = np.sum((ys[s:e] - yf[s:e]) ** 2)
    snr = 10 * np.log10(np.sum(yf[s:e] ** 2) / max(err, 1e-20))
    assert snr >= 40.0, snr


def test_creak_subharmonic_structure(const_l1):
    """creak(depth) must put `depth`-scaled subharmonics between the
    original harmonics: odd/even harmonic power ratio at the halved rate
    ~ depth^2, ~0 at depth 0, monotone in depth."""
    x, l1 = const_l1

    def oe(y, f0_hz, fs=16000.0, kmax=40):
        n = len(y)
        y = y[n // 5: -n // 5]
        t = np.arange(len(y)) / fs
        comb = lambda ks: sum(
            abs(np.dot(y, np.exp(-2j * np.pi * k * f0_hz * t)) / len(t)) ** 2
            for k in ks)
        return comb(range(1, kmax, 2)) / comb(range(2, kmax, 2))

    sopt = create_soptions()
    ratios = {}
    for depth in (0.0, 0.25, 0.5):
        cr = edits.creak(l1, depth=depth)
        np.testing.assert_allclose(np.asarray(cr.f0),
                                   np.asarray(l1.f0) / 2.0, atol=1e-3)
        y = np.asarray(layer0.synthesize(sopt, cr).y_sin)
        assert np.all(np.isfinite(y))
        ratios[depth] = oe(y, 70.0)
    assert ratios[0.0] < 0.02, ratios
    assert 0.08 < ratios[0.5] < 0.6, ratios
    assert ratios[0.25] < 0.5 * ratios[0.5], ratios


def test_time_stretch_keeps_pbp_coherent(const_l1):
    """time_stretch re-propagates vsphse too, so a PbP render of the
    stretched chunk stays periodic."""
    from libllsm2_tpu.models import pbp
    x, l1 = const_l1
    st = edits.time_stretch(l1, 1.3)
    y = np.asarray(pbp.pbp_synthesize(create_soptions(), st).y_sin)
    assert np.all(np.isfinite(y))
    assert _periodicity(y, 140.0) >= 0.9, _periodicity(y, 140.0)


def test_edit_chain_with_unvoiced_regions():
    """Edits on a mixed voiced/unvoiced chunk: pitch_shift + vibrato +
    time_stretch must keep f0 = 0 frames unvoiced, keep the unvoiced
    tail's noise energy (edits are harmonic-domain; the noise model
    rides along), and stay OLA-coherent in the voiced core."""
    x, f0 = testsig.make_test_utterance(duration=0.8, seed=6,
                                        noise_level=0.05,
                                        unvoiced_tail_frac=0.3)
    l1 = layer1.chunk_to_layer1(layer0.analyze(create_aoptions(), x, f0))
    r = 1.5
    ed = edits.time_stretch(
        edits.vibrato(edits.pitch_shift(l1, r), 5.0, 0.3), 1.25)
    # voicing structure preserved (stretch resamples the frame grid)
    f0e = np.asarray(ed.f0)
    assert np.mean(f0e > 0) == pytest.approx(
        np.mean(np.asarray(l1.f0) > 0), abs=0.05)
    out = layer0.synthesize(create_soptions(), ed)
    y = np.asarray(out.y)
    assert np.all(np.isfinite(y))
    # unvoiced tail: noise survives the chain (within 3 dB of the
    # original tail energy density)
    fs = 16000.0
    n_in, n_out = len(x), len(y)
    tail_in = x[int(0.75 * n_in):int(0.95 * n_in)]
    tail_out = y[int(0.75 * n_out):int(0.95 * n_out)]
    e_in = 10 * np.log10(np.mean(tail_in ** 2) + 1e-20)
    e_out = 10 * np.log10(np.mean(tail_out ** 2) + 1e-20)
    assert abs(e_out - e_in) < 3.0, (e_in, e_out)
    # voiced core stays OLA-coherent: the track GLIDES (and carries the
    # added vibrato), so measure periodicity per 50 ms segment at the
    # LOCAL edited f0 instead of one global lag
    f0v = np.asarray(ed.f0)
    y_sin = np.asarray(out.y_sin)
    nhop, thop = 80, 0.005
    seg_frames = 10                                  # 50 ms
    ps = []
    for s in range(4, int(0.55 * len(f0v)) - seg_frames, seg_frames):
        f_loc = f0v[s:s + seg_frames]
        if np.any(f_loc <= 0):
            continue
        seg = y_sin[s * nhop:(s + seg_frames) * nhop]
        lag = int(round(16000.0 / float(np.median(f_loc))))
        a, b = seg[:-lag], seg[lag:]
        ps.append(float(np.dot(a, b) / np.sqrt(
            np.dot(a, a) * np.dot(b, b) + 1e-20)))
    assert np.mean(ps) > 0.9, (np.mean(ps), ps)
