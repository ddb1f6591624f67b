"""Nasal / antiformant stress oracles (VERDICT r2 missing #2).

The vocal tract of nasals and nasalized vowels has spectral ZEROS
(side-branch anti-resonances) that violate two analysis assumptions:
the smooth interpolation of the sampled harmonic envelope, and the
minimum-phase reconstruction in layer 1 (reference: layer1.c ->
llsm_frame_tolayer1).  Fixture: utils.testsig.synth_nasal_utterance --
LF source with known Rd through a pole-zero tract (low dense F1,
min-phase conjugate-zero pair near 800-900 Hz).

Measured floors (round 3):
- layer-0 and layer-1 round trips are essentially unaffected by the
  zero (~32.7 dB voiced-core at aspiration noise 0.02; LSD ~1.5 dB;
  the 12.6 dB notch reproduced to 0.1 dB) -- vsphse carries whatever
  the envelope misses.
- Rd recovery: exact (within ~1%) when harmonics SAMPLE the notch;
  degraded (measured 0.61 for true 1.0) in the adversarial case of a
  60 Hz-wide zero exactly BETWEEN harmonics at f0 = 200.  Two
  mitigations ship: the fit is confined below the nasal-zero region
  (k*f0 < 1000 Hz, classic H1-Hk measures) and one IRLS pass
  downweights phase-residual outliers.

Round-5 REATTRIBUTION: the 'mid-gap' bias does NOT come from the zero
-- no-zero controls at f0 = 182/200 show the same bias, which follows
the sharp F1 = 250 Hz POLE falling between harmonics 1 and 2 (see
test_rd_midgap_bias_follows_the_pole_not_the_zero).  The explicit
parametric-section observation model (layer1.fit_rd_sections) recovers
the mid-gap cases to ~1.0 given the sections; blind section selection
was measured unreliable and is deliberately not offered (details in
the fit_rd_sections docstring).
"""
import numpy as np

from libllsm2_tpu import create_aoptions, create_soptions
from libllsm2_tpu.models import layer0, layer1
from libllsm2_tpu.utils import metrics, testsig

OPT = create_aoptions()
SOPT = create_soptions()


def _core(f0, nhop=80):
    v = np.where(np.asarray(f0) > 0)[0]
    return (v[int(0.10 * len(v))] * nhop,
            v[int(0.85 * len(v))] * nhop)


def _nasal_roundtrip(**kw):
    x, f0 = testsig.synth_nasal_utterance(duration=1.0, seed=2, **kw)
    ch = layer0.analyze(OPT, x, f0)
    l1 = layer1.chunk_to_layer1(ch)
    y1 = np.asarray(layer0.synthesize(SOPT, layer1.chunk_to_layer0(l1)).y)
    return x, f0, ch, l1, y1


def test_layer0_roundtrip_with_antiformant():
    x, f0 = testsig.synth_nasal_utterance(duration=1.0, seed=2)
    ch = layer0.analyze(OPT, x, f0)
    y = np.asarray(layer0.synthesize(SOPT, ch).y)
    lo, hi = _core(f0)
    s = metrics.snr_db(x[lo:hi], y[lo:hi], trim=0.0)
    assert s > 29.0, s


def test_layer1_roundtrip_and_notch_reproduction():
    """Layer 1 must survive the spectral zero: SNR, smoothed LSD, and
    the NOTCH DEPTH itself (the feature a smooth-envelope codec would
    fill in) must all reproduce."""
    x, f0, ch, l1, y1 = _nasal_roundtrip()
    lo, hi = _core(f0)
    s = metrics.snr_db(x[lo:hi], y1[lo:hi], trim=0.0)
    assert s > 29.0, s
    lsd = metrics.log_spectral_distance_db(x[lo:hi], y1[lo:hi],
                                           smooth_bins=16)
    assert lsd < 2.5, lsd
    a, b = x[lo:hi], y1[lo:hi]
    fr = np.fft.rfftfreq(len(a), 1 / 16000.0)
    sa = np.abs(np.fft.rfft(a * np.hanning(len(a)))) ** 2
    sb = np.abs(np.fft.rfft(b * np.hanning(len(a)))) ** 2

    def band_db(sp, flo, fhi):
        m = (fr >= flo) & (fr < fhi)
        return 10 * np.log10(sp[m].mean())

    depth_in = band_db(sa, 500, 650) - band_db(sa, 750, 880)
    depth_out = band_db(sb, 500, 650) - band_db(sb, 750, 880)
    assert depth_in > 8.0          # the fixture really has a notch
    assert abs(depth_out - depth_in) < 2.0, (depth_in, depth_out)


def test_rd_recovery_with_sampled_zero():
    """When harmonics sample the notch (f0 = 120: zero at k ~ 6.7, its
    skirts measured by k = 6, 7), Rd must recover within 15% across the
    Rd range despite the antiformant."""
    for rd_true in (0.5, 1.0, 2.2):
        x, f0, ch, l1, y1 = _nasal_roundtrip(rd=rd_true)
        rd_med = float(np.median(np.asarray(l1.rd)[np.asarray(f0) > 0]))
        assert abs(rd_med / rd_true - 1.0) < 0.15, (rd_true, rd_med)


def test_rd_midgap_zero_documented_floor():
    """Adversarial case: a 60 Hz-wide zero exactly between harmonics at
    f0 = 200 (unobservable per frame).  The low-harmonic cap + IRLS
    recover Rd to >= 0.45 (was 0.35 without them, true 1.0); this floor
    DOCUMENTS the per-frame information limit -- raise it if the fit
    improves, it must never regress."""
    x, f0, ch, l1, y1 = _nasal_roundtrip(zero=(900.0, 60.0), f0_base=200.0)
    rd_med = float(np.median(np.asarray(l1.rd)[np.asarray(f0) > 0]))
    assert rd_med > 0.45, rd_med
    # the round trip itself must stay clean regardless (vsphse carries
    # what the source/envelope split misattributes)
    lo, hi = _core(f0)
    s = metrics.snr_db(x[lo:hi], y1[lo:hi], trim=0.0)
    assert s > 28.0, s


def test_rd_midgap_bias_follows_the_pole_not_the_zero():
    """Round-5 root-cause REATTRIBUTION of the 'mid-gap zero' story:
    the same fixtures with NO antiformant at all show the same Rd bias
    (measured 0.46-0.55 for true 1.0 at f0 = 182/200), while at f0 =
    120 they recover ~0.97.  The bias follows the sharp F1 = 250 Hz
    RESONANCE: at f0 >= 180 it falls between harmonics 1 and 2, the
    sampled envelope misses the peak, and its pseudo-grid minimum phase
    contaminates the fit -- the identical under-resolution mechanism
    rounds 3-4 attributed to the zero, caused by a pole.  This test
    pins the attribution so the story cannot silently regress."""
    nasal_formants = ((250.0, 70.0), (1100.0, 180.0), (2300.0, 220.0))

    def rd_of(f0_base):
        f0 = testsig.make_f0_track(200, 0.005, f0_base=f0_base,
                                   vibrato_depth=0.015, glide=0.1)
        x, f0t = testsig.synth_lf_speech(f0, rd=1.0,
                                         formants=nasal_formants,
                                         zeros=(), noise_level=0.02,
                                         seed=2)
        l1 = layer1.chunk_to_layer1(layer0.analyze(OPT, x, f0t))
        v = np.asarray(f0t) > 0
        return float(np.median(np.asarray(l1.rd)[v]))

    rd_low, rd_high = rd_of(120.0), rd_of(200.0)
    assert rd_low > 0.85, rd_low          # F1 sampled: no bias
    assert rd_high < 0.75, rd_high        # F1 mid-gap: biased, NO zero


def test_rd_sections_observation_model_recovers_midgap():
    """The explicit parametric-section observation model (VERDICT r4
    #6): given the tract's sharp sections, layer1.fit_rd_sections /
    chunk_to_layer1(sections=...) subtracts their under-resolution
    contamination (_resonance_dev) and recovers the mid-gap Rd.
    Measured: 0.59 -> 0.97 at f0 = 200, 0.56 -> 1.03 at f0 = 182 (true
    1.0); the well-sampled f0 = 120 case stays within 10%.

    BLIND section selection is deliberately NOT offered: three
    phase-coherence selection objectives each picked spurious sections
    on at least one fixture (margins 0.1-1.8%, corrected Rd as far off
    as 0.11 / 2.13) -- see the fit_rd_sections docstring for the
    measured details."""
    secs = ((250.0, 70.0, -1.0), (900.0, 60.0, 1.0))
    for f0b, floor in ((200.0, 0.8), (182.0, 0.8)):
        x, f0 = testsig.synth_nasal_utterance(
            duration=1.0, seed=2, zero=(900.0, 60.0), f0_base=f0b)
        ch = layer0.analyze(OPT, x, f0)
        l1 = layer1.chunk_to_layer1(ch, None, secs)
        v = np.asarray(f0) > 0
        rd_med = float(np.median(np.asarray(l1.rd)[v]))
        assert floor < rd_med < 1.25, (f0b, rd_med)
    # well-sampled control: the correction must not damage it
    x, f0 = testsig.synth_nasal_utterance(duration=1.0, seed=2)
    l1 = layer1.chunk_to_layer1(layer0.analyze(OPT, x, f0), None, secs)
    v = np.asarray(f0) > 0
    rd_med = float(np.median(np.asarray(l1.rd)[v]))
    assert 0.9 < rd_med < 1.15, rd_med


def test_rd_midgap_bias_is_common_mode_across_frames():
    """VERDICT r3 #8 asked for a multi-frame Rd continuity prior for the
    mid-gap case, or a proof that it cannot help.  This is the proof by
    measurement: the mid-gap bias is COMMON-MODE across frames, so no
    aggregation of per-frame evidence (smoothing, median, MAP prior) can
    remove it.

    Mechanism: the unseen zero's phase contribution is absorbed into the
    minphase-of-the-SAMPLED-envelope reference identically in every
    frame.  Even frames whose 5th harmonic lands INSIDE the notch band
    (swept there by vibrato at f0_base = 182 -> k5 spans ~865-955 Hz)
    estimate the same biased value as frames that miss it (measured
    0.549 vs 0.559 for true 1.0) -- sampling the notch gives a deep
    MAGNITUDE dip, but the 1-harmonic-wide dip is under-resolved and its
    reconstructed minimum phase is still wrong.  Recovery would need a
    different observation model (explicit parametric zero fitting), not
    more frames; the documented floor in
    test_rd_midgap_zero_documented_floor stands as an information limit
    of harmonic-sampled envelopes."""
    x, f0, ch, l1, y1 = _nasal_roundtrip(zero=(900.0, 60.0), f0_base=182.0)
    f0n = np.asarray(f0)
    rd = np.asarray(l1.rd)
    v = f0n > 0
    in_notch = (5 * f0n > 860) & (5 * f0n < 940) & v
    assert in_notch.sum() >= 20 and (v & ~in_notch).sum() >= 20
    med_in = float(np.median(rd[in_notch]))
    med_out = float(np.median(rd[v & ~in_notch]))
    # both biased low, and equally so: aggregation across frames cannot
    # separate them (if sampling frames ever become unbiased, a
    # multi-frame prior becomes worthwhile -- revisit).
    # Round-5 note: the bias's dominant SOURCE was reattributed to the
    # under-resolved F1 pole (test_rd_midgap_bias_follows_the_pole_...),
    # but the common-mode CONCLUSION stands -- the contamination is
    # identical in every frame whichever section causes it, so only a
    # different observation model helps (layer1.fit_rd_sections).
    assert abs(med_in - med_out) < 0.1, (med_in, med_out)
    assert med_out < 0.8, med_out
