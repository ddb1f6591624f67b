"""Coder round-trip tests (reference analog: test-coder.c; SURVEY.md 3.5)."""
import numpy as np
import pytest

from libllsm2_tpu import create_aoptions, create_soptions
from libllsm2_tpu.models import coder, layer0, layer1
from libllsm2_tpu.utils import testsig


@pytest.fixture(scope="module")
def l1chunk():
    x, f0 = testsig.make_test_utterance(duration=0.6, noise_level=0.05)
    opt = create_aoptions()
    chunk = layer0.analyze(opt, x, f0)
    return x, layer1.chunk_to_layer1(chunk)


def test_encode_shape(l1chunk):
    x, l1 = l1chunk
    cc = coder.CoderConfig(conf=l1.conf)
    v = coder.encode(cc, l1)
    assert v.shape == (l1.nfrm, cc.dims)
    assert np.all(np.isfinite(np.asarray(v)))


def test_layout_covers_dims(l1chunk):
    x, l1 = l1chunk
    cc = coder.CoderConfig(conf=l1.conf)
    name, off, size = cc.layout()[-1]
    assert off + size == cc.dims


def test_roundtrip_preserves_parameters(l1chunk):
    x, l1 = l1chunk
    cc = coder.CoderConfig(conf=l1.conf)
    v = coder.encode(cc, l1)
    back = coder.decode(cc, v)
    np.testing.assert_allclose(np.asarray(back.f0), np.asarray(l1.f0),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(back.rd), np.asarray(l1.rd),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(back.edc), np.asarray(l1.edc),
                               atol=1e-5)
    # vtmagn survives the nvt-dim bottleneck approximately (voiced frames,
    # interior spectrum)
    voiced = np.asarray(l1.f0) > 0
    a = np.asarray(l1.vtmagn)[voiced][:, 8:-8]
    b = np.asarray(back.vtmagn)[voiced][:, 8:-8]
    assert np.median(np.abs(a - b)) < 0.5  # log units


def test_decoded_chunk_synthesizes(l1chunk):
    x, l1 = l1chunk
    cc = coder.CoderConfig(conf=l1.conf)
    back = coder.decode(cc, coder.encode(cc, l1))
    out = layer0.synthesize(create_soptions(), back)
    y = np.asarray(out.y)
    assert np.all(np.isfinite(y))
    # band energies of the decoded resynthesis track the original coarsely
    n = min(len(x), len(y))
    sx = np.abs(np.fft.rfft(np.asarray(x[:n]))) ** 2
    sy = np.abs(np.fft.rfft(y[:n])) ** 2
    f = np.fft.rfftfreq(n, 1 / 16000.0)
    for lo, hi in [(200, 1000), (1000, 3000)]:
        b = (f >= lo) & (f < hi)
        r = 10 * np.log10(sy[b].sum() / sx[b].sum())
        assert abs(r) < 8.0, (lo, hi, r)


def test_with_phase_coder_near_lossless(l1chunk):
    """with_phase=True packs vsphse/eenv_p too (VERDICT r1 missing #6):
    the layer-1 round trip must preserve them exactly, and the decoded
    synthesis must reconstruct the waveform far better than the
    phase-less layout."""
    x, l1 = l1chunk
    cc = coder.CoderConfig(conf=l1.conf, with_phase=True)
    v = coder.encode(cc, l1)
    assert v.shape == (l1.nfrm, cc.dims)
    d1 = coder.decode_layer1(cc, v)
    np.testing.assert_allclose(np.asarray(d1.vsphse), np.asarray(l1.vsphse),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(d1.eenv_p), np.asarray(l1.eenv_p),
                               atol=1e-6)

    def err(ccv):
        back = coder.decode(ccv, coder.encode(ccv, l1))
        y = np.asarray(layer0.synthesize(create_soptions(), back).y_sin)
        n = min(len(x), len(y))
        lo, hi = int(0.1 * n), int(0.9 * n)
        return float(np.sum((np.asarray(x)[lo:hi] - y[lo:hi]) ** 2))

    e_phase = err(cc)
    e_nophase = err(coder.CoderConfig(conf=l1.conf))
    # waveform-domain error: phases matter; expect a large gap
    assert e_phase < 0.25 * e_nophase, (e_phase, e_nophase)


def test_decode_layer1_variant(l1chunk):
    """Reference parity: the coder has distinct layer-1 and layer-0
    decode variants (VERDICT r1 missing #6)."""
    _, l1 = l1chunk
    cc = coder.CoderConfig(conf=l1.conf)
    v = coder.encode(cc, l1)
    d1 = coder.decode_layer1(cc, v)
    assert d1.has_layer1
    assert float(np.abs(np.asarray(d1.ampl)).max()) == 0.0  # no harmonics
    np.testing.assert_allclose(np.asarray(d1.f0), np.asarray(l1.f0),
                               rtol=1e-5)
    # the layer-0 variant renders harmonics from the same parameters
    d0 = coder.decode(cc, v)
    assert float(np.abs(np.asarray(d0.ampl)).max()) > 0.0


def test_streaming_vector_decode_matches_offline(l1chunk):
    """The TTS-serving shape: coder vectors decoded block-by-block
    (decode_frames) into an RTSynthesizer with phase_mode="propagate"
    must render the same harmonic audio as the offline decode+synthesize
    path (the synthesizer's cycle carry replaces the chunk-level phase
    propagation; noise realizations differ by construction)."""
    from libllsm2_tpu.runtime import rtsynth

    x, l1 = l1chunk
    cc = coder.CoderConfig(conf=l1.conf)
    v = coder.encode(cc, l1)
    sopt = create_soptions()

    off = layer0.synthesize(sopt, coder.decode(cc, v))
    y_off = np.asarray(off.y_sin)

    rt = rtsynth.RTSynthesizer(sopt, l1.conf, capacity_frames=l1.nfrm + 8,
                               phase_mode="propagate")
    out = []
    B = 16
    for s in range(0, v.shape[0], B):      # arbitrary block granularity
        rt.feed_many(coder.decode_frames(cc, v[s:s + B]))
        out.append(rt.fetch(rt.readable()))
    rt.flush()
    out.append(rt.fetch(rt.readable()))
    y_st = np.concatenate(out)

    n = min(len(y_off), len(y_st))
    lo, hi = int(0.1 * n), int(0.9 * n)
    num = float(np.sum(y_off[lo:hi] ** 2))
    den = float(np.sum((y_off[lo:hi] - y_st[lo:hi]) ** 2))
    snr = 10.0 * np.log10(num / max(den, 1e-12))
    assert snr > 25.0, snr


def test_streaming_vector_decode_with_phase(l1chunk):
    """with_phase=True coders restore ABSOLUTE phases, so streaming
    decode pairs with the default phase_mode="absolute" (propagate mode
    would add the cycle ramp twice -- see decode_frames docstring)."""
    from libllsm2_tpu.runtime import rtsynth

    x, l1 = l1chunk
    cc = coder.CoderConfig(conf=l1.conf, with_phase=True)
    v = coder.encode(cc, l1)
    sopt = create_soptions()
    y_off = np.asarray(layer0.synthesize(sopt, coder.decode(cc, v)).y_sin)

    rt = rtsynth.RTSynthesizer(sopt, l1.conf, capacity_frames=l1.nfrm + 8)
    out = []
    for s in range(0, v.shape[0], 16):
        rt.feed_many(coder.decode_frames(cc, v[s:s + 16]))
        out.append(rt.fetch(rt.readable()))
    rt.flush()
    out.append(rt.fetch(rt.readable()))
    y_st = np.concatenate(out)

    n = min(len(y_off), len(y_st))
    lo, hi = int(0.1 * n), int(0.9 * n)
    num = float(np.sum(y_off[lo:hi] ** 2))
    den = float(np.sum((y_off[lo:hi] - y_st[lo:hi]) ** 2))
    snr = 10.0 * np.log10(num / max(den, 1e-12))
    assert snr > 25.0, snr


def test_decode_random_vectors_never_nan(l1chunk):
    """The coder's whole purpose is ML interop, so decode must survive
    ARBITRARY model outputs: unbounded log-domain slots used to
    overflow exp() into inf harmonics / NaN audio at ~1e3-scale inputs
    (decode_layer1 now clamps every slot to its physical range, like
    the pre-existing Rd clamp).  Real encodes never bind the clamps --
    the round-trip tests above stay bit-unchanged."""
    _, l1 = l1chunk
    cc = coder.CoderConfig(conf=l1.conf)
    rng = np.random.default_rng(0)
    sopt = create_soptions()
    for scale in (1.0, 1e3, 1e6):
        v = (scale * rng.standard_normal((30, cc.dims))).astype(np.float32)
        y = np.asarray(layer0.synthesize(sopt, coder.decode(cc, v)).y)
        assert np.all(np.isfinite(y)), scale


def test_quantized_transport_roundtrip(l1chunk, tmp_path):
    """Int quantization of coder vectors (storage/transmission form) +
    the coded_save/coded_load archive.  16-bit is render-transparent;
    8-bit is parameter-faithful (exact voicing decision, sub-percent F0,
    percent-level amplitudes) but phase-detail lossy: the render's LF
    pulse shape is steeply sensitive to Rd near the source-spectrum
    nulls, so waveform SNR is not the fidelity metric at 8 bits."""
    from libllsm2_tpu import create_soptions
    from libllsm2_tpu.models import layer0 as l0
    from libllsm2_tpu.utils import serialize

    x, l1 = l1chunk
    cc = coder.CoderConfig(conf=l1.conf)
    v = np.asarray(coder.encode(cc, l1))
    sopt = create_soptions()
    y0 = np.asarray(l0.synthesize(sopt, coder.decode(cc, v)).y_sin)

    def render_snr(vq):
        yq = np.asarray(l0.synthesize(sopt,
                                      coder.decode(cc, np.asarray(vq))).y_sin)
        n = min(len(y0), len(yq))
        lo, hi = int(0.05 * n), int(0.95 * n)
        num = np.sum(y0[lo:hi] ** 2)
        den = np.sum((y0[lo:hi] - yq[lo:hi]) ** 2)
        return 10.0 * np.log10(num / max(den, 1e-12))

    # 16-bit: render-transparent
    q16 = coder.fit_quantizer(v, bits=16)
    v16 = coder.dequantize(q16, coder.quantize(q16, v))
    assert render_snr(v16) > 45.0

    # 8-bit: voicing exact, parameters faithful
    q8 = coder.fit_quantizer(v, bits=8)
    v8 = coder.dequantize(q8, coder.quantize(q8, v))
    assert np.array_equal(v8[:, 0] == 0.0, v[:, 0] == 0.0)   # voicing
    voiced = v[:, 0] > 0
    assert np.abs(v8[voiced, 0] - v[voiced, 0]).max() \
        / v[voiced, 0].min() < 0.005                          # F0
    c_f, c_q = coder.decode(cc, v), coder.decode(cc, np.asarray(v8))
    m = np.asarray(c_f.hm_mask) > 0
    a_f, a_q = np.asarray(c_f.ampl)[m], np.asarray(c_q.ampl)[m]
    rel = np.abs(a_q - a_f) / np.maximum(a_f, 1e-6)
    assert np.median(rel) < 0.05, np.median(rel)
    assert render_snr(v8) > 8.0

    # archive round trip: 4x smaller than float32, loads bit-equal to
    # the direct dequantization
    path = str(tmp_path / "utt.llsm.npz")
    serialize.coded_save(path, cc, v, bits=8, quant=q8)
    cc2, v2 = serialize.coded_load(path)
    assert cc2.dims == cc.dims
    np.testing.assert_array_equal(v2, v8)
    import os
    assert os.path.getsize(path) < 0.5 * v.nbytes


def test_dpcm_voicing_resync():
    """Round-5 fix: DPCM delta ranges fitted over max |diff| were blown
    up ~100x by voicing-boundary jumps (the slot flips to its unvoiced
    default), making DPCM code WORSE than absolute.  With f0_slot set,
    the range is fitted from voiced->voiced diffs only and the closed
    loop re-syncs ABSOLUTE at unvoiced frames and voiced-run onsets --
    the decoder recovers identical voicing from the F0 slot's bit-exact
    zeros.  Synthetic vectors pin the semantics deterministically."""
    rng = np.random.default_rng(0)
    B, N, D = 2, 120, 4
    f0 = np.zeros((B, N), np.float32)
    f0[:, 10:60] = 150.0
    f0[:, 70:110] = 220.0
    rd = np.where(f0 > 0, 0.0, 1.0).astype(np.float32)
    rd[0, 10:60] = 2.3 + np.cumsum(rng.normal(0, 0.003, 50))
    rd[0, 70:110] = 0.5 + np.cumsum(rng.normal(0, 0.003, 40))
    rd[1, 10:60] = 0.9 + np.cumsum(rng.normal(0, 0.003, 50))
    rd[1, 70:110] = 1.8 + np.cumsum(rng.normal(0, 0.003, 40))
    v = np.zeros((B, N, D), np.float32)
    v[:, :, 0] = f0
    v[:, :, 1] = rd
    v[:, :, 2:] = rng.normal(0, 1, (B, N, 2))
    mask = np.array([False, True, False, False])

    q_leg = coder.fit_quantizer(v, bits=8, dpcm=mask)
    q_new = coder.fit_quantizer(v, bits=8, dpcm=mask, f0_slot=0)
    # the legacy range is dominated by the ~1.8 voicing-boundary jump;
    # the voiced-only range sees only the 3e-3 random walk
    assert q_new.dhi[1] < 0.05 * q_leg.dhi[1], (q_new.dhi[1], q_leg.dhi[1])

    voiced = f0 > 0
    dv_leg = coder.dequantize(q_leg, coder.quantize(q_leg, v))
    leg_err = np.abs((dv_leg - v)[:, :, 1])[voiced].max()
    dv_new = coder.dequantize(q_new, coder.quantize(q_new, v))
    new_err = np.abs((dv_new - v)[:, :, 1])[voiced].max()
    # voiced-run ONSET frames are absolute-coded (re-sync): error up to
    # half the absolute step; interior frames track at the (tiny) dstep
    assert new_err < 0.6 * q_new.step[1], (new_err, q_new.step[1])
    # interior voiced frames (not onsets) track at delta resolution --
    # the legacy blown-up dstep leaves them ~50x worse
    interior = voiced.copy()
    interior[:, [10, 70]] = False
    int_new = np.abs((dv_new - v)[:, :, 1])[interior].max()
    int_leg = np.abs((dv_leg - v)[:, :, 1])[interior].max()
    assert int_new < 20.0 * q_new.dstep[1], (int_new, q_new.dstep[1])
    assert int_new < 0.2 * int_leg, (int_new, int_leg)
    assert leg_err >= new_err  # and the overall max never regresses
    # unvoiced frames are coded absolute: the default value round-trips
    dv = coder.dequantize(q_new, coder.quantize(q_new, v))
    assert np.abs((dv - v)[:, :, 1])[~voiced].max() < 0.02


def test_coded_archive_f0_side_channel(l1chunk, tmp_path):
    """The bits=8 archive stores F0 on a 16-bit side array (+0.8%
    size): slot ablation measured the 8-bit F0 step as THE waveform
    bottleneck (decode re-propagates phases from F0; 16 dB with only F0
    quantized vs 36 with only Rd).  Measured on the 4-voice corpus:
    archive waveform SNR 16.0 -> 44.7 dB.  Pin: F0 error at 16-bit
    scale, voicing exact, waveform floor."""
    from libllsm2_tpu import create_soptions
    from libllsm2_tpu.models import layer0 as l0
    from libllsm2_tpu.utils import serialize

    x, l1 = l1chunk
    cc = coder.CoderConfig(conf=l1.conf)
    v = np.asarray(coder.encode(cc, l1))
    path = str(tmp_path / "utt8.llsm.npz")
    serialize.coded_save(path, cc, v, bits=8)
    cc2, v2 = serialize.coded_load(path)
    voiced = v[:, 0] > 0
    assert np.array_equal(v2[:, 0] == 0.0, ~voiced)
    # 16-bit step accuracy vs the RANGE-CLIPPED reference (the robust
    # percentile lo/hi clips a couple of extreme frames by design)
    q = coder.fit_quantizer(v, bits=8, dpcm=coder.default_dpcm_mask(cc),
                            f0_slot=coder.f0_slot(cc))
    ref = np.clip(v[voiced, 0], q.lo[0], q.hi[0])
    step16 = (q.hi[0] - q.lo[0]) / 65535.0
    assert np.abs(v2[voiced, 0] - ref).max() < 2.0 * step16
    sopt = create_soptions()
    y0 = np.asarray(l0.synthesize(sopt, coder.decode(cc, v)).y_sin)
    yq = np.asarray(l0.synthesize(sopt, coder.decode(cc, v2)).y_sin)
    n = min(len(y0), len(yq))
    lo, hi = int(0.05 * n), int(0.95 * n)
    snr = 10 * np.log10(np.sum(y0[lo:hi] ** 2)
                        / max(np.sum((y0[lo:hi] - yq[lo:hi]) ** 2), 1e-12))
    assert snr > 25.0, snr


def test_transport_mcd_floors(l1chunk):
    """Rate-distortion MCD floors (VERDICT r4 #3; full table in
    BASELINE.md from scripts/rate_distortion.py): int16 is MCD-exact,
    int8 with voicing-aware DPCM stays near-transparent."""
    from libllsm2_tpu import create_soptions
    from libllsm2_tpu.models import layer0 as l0
    from libllsm2_tpu.utils import metrics

    x, l1 = l1chunk
    cc = coder.CoderConfig(conf=l1.conf)
    v = np.asarray(coder.encode(cc, l1))
    sopt = create_soptions()
    y0 = np.asarray(l0.synthesize(sopt, coder.decode(cc, v)).y_sin)

    def mcd_of(bits, dpcm=False):
        kw = dict(dpcm=coder.default_dpcm_mask(cc),
                  f0_slot=coder.f0_slot(cc)) if dpcm else {}
        q = coder.fit_quantizer(v, bits=bits, **kw)
        dv = coder.dequantize(q, coder.quantize(q, v))
        y = np.asarray(l0.synthesize(sopt,
                                     coder.decode(cc, dv)).y_sin)
        n = min(len(y0), len(y))
        return metrics.mel_cepstral_distortion_db(y0[:n], y[:n],
                                                  fs=cc.conf.fs)

    assert mcd_of(16) < 0.05
    assert mcd_of(8, dpcm=True) < 0.3
