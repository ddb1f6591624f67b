"""Out-of-model validation family (VERDICT r3 missing #2).

Every other fixture in this suite excites the vocal tract with an
LF-model source -- the same glottal family layer1 fits -- so their
quality numbers carry a circularity risk.  These fixtures use
excitations from DIFFERENT glottal families (Rosenberg-B, KLGLOTT88,
asymmetric triangle; testsig.synth_outofmodel_utterance), plus
production-chain stressors no generative model of ours produces (mild
room reverb, hard clipping) and a 48 kHz rate.

Measured floors (CPU, 2026-08-18, spectral denoiser default):
  - layer-0 round trip on all three sources: 31.1 dB (the aspiration
    noise_level=0.02 estimation floor -- source-shape independent, as a
    harmonic model should be), MCD 0.39 (transparent).
  - layer-1 round trip: equal to layer-0 (vsphse absorbs the LF-fit
    model error exactly; the Rd value itself is best-effort on non-LF
    sources: medians 0.13 / 0.88 / 1.14 across sources).
  - +reverb (RT60 0.15 s): 25.5 dB; +30% clip: 29.3 dB; 48 kHz: 31.1.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp

from libllsm2_tpu import create_aoptions, create_soptions
from libllsm2_tpu.models import layer0, layer1
from libllsm2_tpu.utils import metrics, testsig

SOURCES = ("rosenberg", "klatt", "triangle")


def _roundtrip(x, f0, opt, sopt, through_layer1=False):
    ch = layer0.analyze(opt, jnp.asarray(x, jnp.float32),
                        jnp.asarray(f0, jnp.float32))
    if through_layer1:
        ch = layer1.chunk_to_layer0(layer1.chunk_to_layer1(ch))
    y = np.asarray(layer0.synthesize(sopt, ch).y, np.float64)
    return y, ch


def test_layer0_roundtrip_all_sources():
    """Layer-0 must be source-shape agnostic: every out-of-model
    excitation round-trips at the aspiration-noise estimation floor
    (measured 31.1 dB for all three; floor 27) and MCD < 1."""
    opt, sopt = create_aoptions(), create_soptions()
    for src in SOURCES:
        x, f0 = testsig.synth_outofmodel_utterance(src, duration=0.8)
        y, _ = _roundtrip(x, f0, opt, sopt)
        s = metrics.snr_db(x, y, trim=0.12)
        assert s > 27.0, (src, s)
        mcd = metrics.mel_cepstral_distortion_db(
            x[1000:-1000], y[1000:len(x) - 1000], 16000.0)
        assert mcd < 1.0, (src, mcd)


def test_layer1_transparent_on_foreign_sources():
    """The layer-1 conversion must not LOSE quality on non-LF sources:
    vsphse is defined as the measured-minus-model residual, so the Rd
    fit's model error cancels exactly in the round trip (the mechanism
    the reference relies on too -- SURVEY.md section 3.3).  The fitted
    Rd itself must stay inside the physical clamp range."""
    opt, sopt = create_aoptions(), create_soptions()
    for src in SOURCES:
        x, f0 = testsig.synth_outofmodel_utterance(src, duration=0.8)
        y0, _ = _roundtrip(x, f0, opt, sopt)
        y1, ch1 = _roundtrip(x, f0, opt, sopt, through_layer1=True)
        s0 = metrics.snr_db(x, y0, trim=0.12)
        s1 = metrics.snr_db(x, y1, trim=0.12)
        assert s1 > s0 - 1.0, (src, s0, s1)
        rd = np.asarray(ch1.rd)
        rd = rd[rd > 0]
        assert rd.size and np.all(rd >= 0.01) and np.all(rd <= 6.0), src


def test_reverb_degrades_gracefully():
    """Mild room reverb (RT60 0.15 s) violates the frame-local
    production model; the analysis must degrade gracefully (measured
    25.5 dB; floor 21), stay finite, and keep the spectral envelope
    (MCD < 1.5)."""
    opt, sopt = create_aoptions(), create_soptions()
    x, f0 = testsig.synth_outofmodel_utterance(
        "rosenberg", duration=0.8, reverb_rt60=0.15)
    y, _ = _roundtrip(x, f0, opt, sopt)
    assert np.all(np.isfinite(y))
    s = metrics.snr_db(x, y, trim=0.12)
    assert s > 21.0, s
    mcd = metrics.mel_cepstral_distortion_db(
        x[1000:-1000], y[1000:len(x) - 1000], 16000.0)
    assert mcd < 1.5, mcd


def test_clipped_input_degrades_gracefully():
    """Hard 30% clipping (consumer-recording saturation: flattens pulse
    peaks, adds odd-harmonic distortion).  Measured 29.3 dB; floor 25."""
    opt, sopt = create_aoptions(), create_soptions()
    x, f0 = testsig.synth_outofmodel_utterance(
        "rosenberg", duration=0.8, clip_frac=0.3)
    y, _ = _roundtrip(x, f0, opt, sopt)
    s = metrics.snr_db(x, y, trim=0.12)
    assert s > 25.0, s


def test_whisper_zero_f0_noise_only():
    """Whispered speech (VERDICT r4 #7): F0 identically zero, the whole
    utterance through the unvoiced/noise path.  The render's noise
    REALIZATION differs by construction, so oracles are spectral: MCD
    (measured 1.11; floor 1.6), total energy (+-0.2 dB measured; 1.5
    bound), and the harmonic slots must stay exactly empty."""
    opt, sopt = create_aoptions(), create_soptions()
    x, f0 = testsig.synth_whisper_utterance(duration=0.8)
    assert float(np.max(f0)) == 0.0
    ch = layer0.analyze(opt, jnp.asarray(x, jnp.float32),
                        jnp.asarray(f0, jnp.float32))
    assert float(np.abs(np.asarray(ch.ampl)
                        * np.asarray(ch.hm_mask)).max()) == 0.0
    y = np.asarray(layer0.synthesize(sopt, ch).y, np.float64)
    n = min(len(x), len(y))
    a, b = x[500:n - 500], y[500:n - 500]
    assert metrics.mel_cepstral_distortion_db(a, b, 16000.0) < 1.6
    e = 10 * np.log10(np.sum(b ** 2) / np.sum(a ** 2))
    assert abs(e) < 1.5, e


def test_breathy_pressed_rd_transition_tracked():
    """Pressed -> breathy -> pressed phonation (VERDICT r4 #7): Rd
    swings 0.5..2.5 per glottal cycle with Rd-riding aspiration.  The
    fitted Rd must TRACK the transition (measured corr 0.957, fitted
    swing 0.80..2.00 -- the Viterbi continuity prior plus formant bias
    compress the extremes; documented, not hidden) and the round trip
    must hold (measured 22.1 dB)."""
    opt, sopt = create_aoptions(), create_soptions()
    x, f0, rd_true = testsig.synth_rd_transition_utterance(duration=1.2)
    ch = layer0.analyze(opt, jnp.asarray(x, jnp.float32),
                        jnp.asarray(f0, jnp.float32))
    l1 = layer1.chunk_to_layer1(ch)
    y = np.asarray(layer0.synthesize(sopt, ch).y, np.float64)
    n = min(len(x), len(y))
    assert metrics.snr_db(x[:n], y[:n], trim=0.1) > 18.0
    v = np.asarray(f0) > 0
    rd_fit = np.asarray(l1.rd)
    corr = np.corrcoef(rd_fit[v], rd_true[v])[0, 1]
    assert corr > 0.9, corr
    assert rd_fit[v].min() < 1.0 and rd_fit[v].max() > 1.7, \
        (rd_fit[v].min(), rd_fit[v].max())


def test_diphthong_glide_with_stop_consonant():
    """/ai/-like F1/F2 glides around a stop closure + burst (VERDICT r4
    #7): formant DYNAMICS inside the analysis window plus an abrupt
    production-mode switch.  Measured 17.4 dB round trip (the window
    smears fast formant motion -- a real model limit, documented), MCD
    0.66 (envelope transparent); floors 14 / 1.1."""
    opt, sopt = create_aoptions(), create_soptions()
    x, f0 = testsig.synth_diphthong_utterance(duration=1.0)
    assert (np.asarray(f0) == 0).sum() >= 10    # the closure exists
    ch = layer0.analyze(opt, jnp.asarray(x, jnp.float32),
                        jnp.asarray(f0, jnp.float32))
    y = np.asarray(layer0.synthesize(sopt, ch).y, np.float64)
    n = min(len(x), len(y))
    assert metrics.snr_db(x[:n], y[:n], trim=0.1) > 14.0
    mcd = metrics.mel_cepstral_distortion_db(x[1000:n - 1000],
                                             y[1000:n - 1000], 16000.0)
    assert mcd < 1.1, mcd


def test_two_speaker_mixture_graceful():
    """Target voice + interferer at -10 dB, analyzed with the TARGET's
    F0 track (VERDICT r4 #7): the harmonic model must keep tracking the
    target -- B's harmonics fall between A's -- and degrade gracefully
    (measured: harmonic render vs clean A 19.6 dB; floor 16), with no
    numerical blowup anywhere."""
    opt, sopt = create_aoptions(), create_soptions()
    x, fa, xa = testsig.synth_two_speaker_mixture(duration=1.0)
    ch = layer0.analyze(opt, jnp.asarray(x, jnp.float32),
                        jnp.asarray(fa, jnp.float32))
    out = layer0.synthesize(sopt, ch)
    ys = np.asarray(out.y_sin, np.float64)
    n = min(len(xa), len(ys))
    assert metrics.snr_db(xa[:n], ys[:n], trim=0.1) > 16.0
    assert np.isfinite(np.asarray(out.y)).all()


def test_48k_out_of_model_roundtrip():
    """Out-of-model source at 48 kHz (measured 31.1 dB; floor 27)."""
    opt = create_aoptions(fs=48000.0)
    sopt = dataclasses.replace(create_soptions(), fs=48000.0)
    x, f0 = testsig.synth_outofmodel_utterance(
        "klatt", duration=0.8, fs=48000.0)
    y, _ = _roundtrip(x, f0, opt, sopt)
    s = metrics.snr_db(x, y, trim=0.12)
    assert s > 27.0, s
    mcd = metrics.mel_cepstral_distortion_db(
        x[3000:-3000], y[3000:len(x) - 3000], 48000.0)
    assert mcd < 1.5, mcd
