"""Layer-1 round-trip tests (reference analog: test-layer1-anasynth.c;
BASELINE config 2) and parameter-domain edits (config 4)."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from libllsm2_tpu import create_aoptions, create_soptions
from libllsm2_tpu.models import edits, layer0, layer1
from libllsm2_tpu.utils import testsig

from test_layer0 import snr_db


@pytest.fixture(scope="module")
def analyzed():
    x, f0 = testsig.make_test_utterance(duration=1.0)
    opt = create_aoptions()
    chunk = layer0.analyze(opt, x, f0)
    return x, f0, chunk


class TestLayer1RoundTrip:
    def test_tolayer1_attaches_fields(self, analyzed):
        x, f0, chunk = analyzed
        l1 = layer1.chunk_to_layer1(chunk)
        assert l1.has_layer1
        assert l1.vtmagn.shape == (chunk.nfrm, chunk.conf.nspec)
        rd = np.asarray(l1.rd)
        assert np.all((rd > 0.05) & (rd < 4.0))
        assert np.all(np.isfinite(np.asarray(l1.vtmagn)))

    def test_layer0_layer1_layer0_identity(self, analyzed):
        """tolayer0(tolayer1(chunk)) must reproduce the harmonics nearly
        exactly: vtmagn/vsphse absorb the source model by construction
        (reference: layer1.c round trip; BASELINE config 2)."""
        x, f0, chunk = analyzed
        back = layer1.chunk_to_layer0(layer1.chunk_to_layer1(chunk))
        m = np.asarray(chunk.hm_mask) > 0
        a0 = np.asarray(chunk.ampl)[m]
        a1 = np.asarray(back.ampl)[m]
        rel = np.abs(a1 - a0) / (np.abs(a0) + 1e-5 * a0.max())
        # amplitude: small interp error onto the nspec grid is allowed
        assert np.median(rel) < 0.02, np.median(rel)
        assert np.mean(rel < 0.2) > 0.95
        dph = np.angle(np.exp(1j * (np.asarray(back.phse) - np.asarray(chunk.phse))))
        # phase: weight by amplitude (quiet harmonics may wrap)
        w = a0 / a0.sum()
        assert np.sum(np.abs(dph[m]) * w) < 0.1

    def test_resynthesis_snr_parity(self, analyzed):
        """Config 2: analysis -> layer1 -> layer0 -> synthesis keeps SNR."""
        x, f0, chunk = analyzed
        back = layer1.chunk_to_layer0(layer1.chunk_to_layer1(chunk))
        out = layer0.synthesize(create_soptions(), back)
        s = snr_db(x, np.asarray(out.y_sin))
        assert s >= 50.0, f"layer-1 round-trip SNR {s:.1f} dB"


class TestEdits:
    def test_pitch_shift_moves_f0_keeps_formants(self, analyzed):
        x, f0, chunk = analyzed
        l1 = layer1.chunk_to_layer1(chunk)
        up = edits.pitch_shift(l1, 2.0)
        np.testing.assert_allclose(np.asarray(up.f0), 2 * np.asarray(chunk.f0),
                                   rtol=1e-6)
        out = layer0.synthesize(create_soptions(), up)
        y = np.asarray(out.y)
        assert np.all(np.isfinite(y))
        # spectral peak (formant) region should stay put: compare average
        # spectra of original vs shifted in the F1 region
        spec_ref = np.abs(np.fft.rfft(x))
        spec_up = np.abs(np.fft.rfft(y, len(x)))
        f = np.fft.rfftfreq(len(x), 1 / 16000.0)
        band = (f > 500) & (f < 900)   # F1 at 700 Hz in the fixture
        e_ref = spec_ref[band].sum() / spec_ref.sum()
        e_up = spec_up[band].sum() / spec_up.sum()
        assert e_up > 0.3 * e_ref, (e_ref, e_up)

    def test_pitch_shift_harmonic_spacing(self, analyzed):
        x, f0, chunk = analyzed
        l1 = layer1.chunk_to_layer1(chunk)
        up = edits.pitch_shift(l1, 2.0)
        out = layer0.synthesize(create_soptions(), up)
        y = np.asarray(out.y_sin)
        mid = len(y) // 2
        seg = y[mid:mid + 2048] * np.hanning(2048)
        spec = np.abs(np.fft.rfft(seg, 8192))
        peak = spec[50:].argmax() + 50
        fpeak = peak * 16000.0 / 8192
        f0_mid = 2 * float(chunk.f0[chunk.nfrm // 2])
        # strongest low peak must sit on a multiple of the NEW f0
        ratio = fpeak / f0_mid
        assert abs(ratio - round(ratio)) < 0.15, (fpeak, f0_mid)

    def test_time_stretch_length_and_f0(self, analyzed):
        x, f0, chunk = analyzed
        st = edits.time_stretch(chunk, 1.5)
        assert st.nfrm == int(round(chunk.nfrm * 1.5))
        # voiced F0 preserved (same values, stretched in time)
        mid_src = chunk.nfrm // 2
        mid_dst = int(mid_src * 1.5)
        assert abs(float(st.f0[mid_dst]) - float(chunk.f0[mid_src])) < 2.0
        out = layer0.synthesize(create_soptions(), st)
        assert np.all(np.isfinite(np.asarray(out.y)))

    def test_combined_edit_config4(self, analyzed):
        """BASELINE config 4: F0 x2 + time-stretch x1.5, then resynthesize."""
        x, f0, chunk = analyzed
        l1 = layer1.chunk_to_layer1(chunk)
        edited = edits.time_stretch(edits.pitch_shift(l1, 2.0), 1.5)
        out = layer0.synthesize(create_soptions(), edited)
        y = np.asarray(out.y)
        assert np.all(np.isfinite(y))
        assert len(y) == edited.nfrm * chunk.conf.nhop
        assert np.std(y) > 0.01


class TestRdRecovery:
    def test_rd_recovered_within_15pct_under_formants(self):
        """On LF-excited fixtures with strong formants and known Rd, the
        phase-deviation fit must recover the ABSOLUTE value within 15%
        (VERDICT r1 #3 acceptance criterion was 25%; the round-4 fit cap
        at 1000 Hz measures within 8% -- at f0 = 140 the old 700 Hz cap
        left only four harmonics and biased Rd 1.8 to 1.32)."""
        est = {}
        for rd_true in (0.4, 1.0, 1.8, 2.7):
            f0 = testsig.make_f0_track(160, 0.005, vibrato_depth=0.0,
                                       glide=0.0)
            x, f0 = testsig.synth_lf_speech(f0, rd=rd_true)
            chunk = layer0.analyze(create_aoptions(), x, f0)
            l1 = layer1.chunk_to_layer1(chunk)
            est[rd_true] = float(np.median(np.asarray(l1.rd)[20:-20]))
            assert abs(est[rd_true] - rd_true) <= 0.15 * rd_true, est
        assert est[0.4] < est[1.0] < est[1.8] < est[2.7], est

    def test_rd_track_no_edge_rails_on_out_of_model_source(self):
        """On a NON-LF source (synth_harmonic: no true Rd exists) the
        per-frame phase-deviation score landscape is nearly flat and the
        unregularized argmax railed between the grid EDGES on adjacent
        frames (0.10 <-> 2.79) -- the dominant PbP<->sinusoidal parity
        error, since PbP pulse shapes follow rd directly while the
        sinusoidal render cancels Rd errors through vsphse.  The Viterbi
        continuity prior (layer1._rd_viterbi) must produce a smooth
        track: no frame-to-frame jump may exceed a quarter of the grid's
        log range."""
        x, f0 = testsig.make_test_utterance(duration=0.8)
        chunk = layer0.analyze(create_aoptions(), x, f0)
        l1 = layer1.chunk_to_layer1(chunk)
        rd = np.asarray(l1.rd)[np.asarray(f0) > 0]
        jumps = np.abs(np.diff(np.log(rd)))
        lim = 0.25 * (np.log(layer1.RD_MAX) - np.log(layer1.RD_MIN))
        assert jumps.max() < lim, (jumps.max(), lim)

    def test_rd_step_tracked_within_frames(self):
        """The continuity prior must not freeze genuine Rd changes: on an
        adversarial INSTANT 0.6 -> 2.0 step (harder than anything
        physiological) the fit settles at the new value within ~10
        frames and both steady states stay within 15%."""
        nfrm = 200
        f0t = np.full(nfrm, 140.0)
        x1, _ = testsig.synth_lf_speech(f0t, rd=0.6)
        x2, _ = testsig.synth_lf_speech(f0t, rd=2.0)
        half = len(x1) // 2
        x = np.concatenate([x1[:half], x2[half:]])
        chunk = layer0.analyze(create_aoptions(), x, jnp.asarray(f0t))
        rd = np.asarray(layer1.chunk_to_layer1(chunk).rd)
        pre = float(np.median(rd[20:95]))
        post = float(np.median(rd[115:190]))
        assert abs(pre - 0.6) <= 0.15 * 0.6, pre
        assert abs(post - 2.0) <= 0.15 * 2.0, post
        # settled (within 20% of 2.0) no later than 10 frames after the
        # step frame (frame 100)
        assert np.all(rd[110:190] > 1.6), rd[100:115]


class TestNfftArgument:
    """Reference-parity: llsm_chunk_tolayer1(chunk, nfft) takes the
    envelope resolution per call (VERDICT r1 missing #4)."""

    def test_nfft_overrides_resolution_and_roundtrips(self):
        import numpy as np
        from libllsm2_tpu import create_aoptions
        from libllsm2_tpu.models import layer0, layer1
        from libllsm2_tpu.utils import testsig

        x, f0 = testsig.make_test_utterance(duration=0.4)
        opt = create_aoptions()
        chunk = layer0.analyze(opt, x, f0)
        l1 = layer1.chunk_to_layer1(chunk, 1024)
        assert l1.vtmagn.shape[-1] == 513
        # decode honors the per-call resolution (read from vtmagn itself)
        back = layer1.chunk_to_layer0(l1)
        m = np.asarray(chunk.hm_mask) > 0
        a0 = np.asarray(chunk.ampl)[m]
        a1 = np.asarray(back.ampl)[m]
        err = np.abs(a1 - a0) / np.maximum(np.abs(a0), 1e-5)
        assert np.median(err) < 0.05


class TestSourceTableFidelity:
    """The Rd-gridded LF source tables vs DIRECT lf_spectrum evaluation
    at off-grid Rd values.  Round 3 session 6 bug: the phase table was
    interpolated WRAPPED, so crossing a +-pi boundary between grid rows
    swept through garbage -- up to 1.1 rad of harmonic-phase error for a
    0.001 Rd perturbation on decoded chunks.  Layer-1 round trips never
    saw it (vsphse absorbs the same wrong value and tolayer0 adds it
    back); every off-grid-Rd consumer did: coder decode (vsphse = 0),
    Rd edits, ML-decoded vectors.  Pinned here against ground truth."""

    def test_table_matches_direct_lf_spectrum(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from libllsm2_tpu.models import layer1
        from libllsm2_tpu.ops import lf

        rng = np.random.default_rng(0)
        rd = np.asarray(np.exp(rng.uniform(np.log(0.12), np.log(2.9), 64)),
                        np.float32)
        K = 80
        lm_t, ph_t = layer1._source_at_harmonics(jnp.asarray(rd), K)
        params = lf.lf_from_rd(jnp.asarray(rd))
        fk = jnp.arange(1, K + 1, dtype=jnp.float32)
        spec = lf.lf_spectrum(fk[None, :],
                              jax.tree.map(lambda a: a[:, None], params))
        spec = spec / jnp.maximum(jnp.abs(spec[:, :1]), 1e-12)
        dph = np.angle(np.exp(1j * (np.asarray(ph_t)
                                    - np.angle(np.asarray(spec)))))
        assert np.abs(dph).max() < 0.05, np.abs(dph).max()
        lm_d = np.log(np.maximum(np.abs(np.asarray(spec)), 1e-12))
        assert np.abs(np.asarray(lm_t) - lm_d).max() < 0.05

    def test_decode_phase_continuity_in_rd(self):
        """A tiny Rd perturbation must not swing decoded harmonic phases
        (the user-visible symptom of the wrapped-interpolation bug)."""
        import numpy as np
        from libllsm2_tpu import create_aoptions
        from libllsm2_tpu.models import coder, layer0, layer1
        from libllsm2_tpu.utils import testsig

        x, f0 = testsig.make_test_utterance(duration=0.4)
        opt = create_aoptions()
        l1 = layer1.chunk_to_layer1(layer0.analyze(opt, x, f0))
        cc = coder.CoderConfig(conf=opt.conf)
        v = np.asarray(coder.encode(cc, l1))
        c0 = coder.decode(cc, v)
        vt = v.copy()
        vt[:, 1] += 1e-3
        c1 = coder.decode(cc, np.asarray(vt))
        m = np.asarray(c0.hm_mask) > 0
        dp = np.abs(np.angle(np.exp(
            1j * (np.asarray(c1.phse) - np.asarray(c0.phse)))))[m]
        # physically the LF phase moves fast near its spectral nulls;
        # 0.5 rad max headroom (the wrap bug produced > 1.1 rad)
        assert dp.max() < 0.5, dp.max()
