"""Sample-rate conversion tests (reference: ciglet.h -> sincresample /
rresample) and arbitrary-input-rate analysis (44.1 kHz end-to-end)."""
import numpy as np
import jax.numpy as jnp
import pytest

from libllsm2_tpu import create_aoptions, create_soptions
from libllsm2_tpu.models import layer0
from libllsm2_tpu.ops import resample
from libllsm2_tpu.utils import metrics, testsig


def _tone(fs, f, dur=1.0):
    t = np.arange(int(fs * dur)) / fs
    return np.sin(2 * np.pi * f * t).astype(np.float32)


def _snr(ref, est, trim=200):
    n = min(len(ref), len(est))
    r, e = ref[trim:n - trim], est[trim:n - trim] - ref[trim:n - trim]
    return 10 * np.log10(np.sum(r ** 2) / max(np.sum(e ** 2), 1e-20))


class TestSincResample:
    def test_upsample_tone(self):
        x = _tone(16000, 1000)
        y = np.asarray(resample.resample_to(x, 16000, 44100))
        ref = _tone(44100, 1000, len(y) / 44100 + 0.1)[:len(y)]
        assert _snr(ref, y) > 80.0

    def test_roundtrip(self):
        x = _tone(16000, 1234)
        y = resample.resample_to(x, 16000, 44100)
        z = np.asarray(resample.resample_to(y, 44100, 16000))
        assert _snr(x, z) > 60.0

    def test_antialias_on_downsample(self):
        # 7 kHz is above the 4 kHz output Nyquist: must be suppressed
        x = _tone(16000, 7000)
        d = np.asarray(resample.resample_to(x, 16000, 8000))
        res_db = 10 * np.log10(np.mean(d[100:-100] ** 2) / 0.5)
        assert res_db < -60.0, res_db

    def test_matches_scipy_resample_poly(self):
        from scipy import signal as sps
        rng = np.random.default_rng(0)
        x = sps.lfilter(*sps.butter(6, 0.35),
                        rng.standard_normal(16000)).astype(np.float32)
        ours = np.asarray(resample.rresample(jnp.asarray(x), 3, 2))
        ref = sps.resample_poly(x, 3, 2)
        assert _snr(ref, ours) > 50.0

    def test_dc_preserved_exactly(self):
        y = np.asarray(resample.rresample(jnp.ones(1000, jnp.float32),
                                          441, 440))
        assert np.abs(y[50:-50] - 1.0).max() < 1e-5

    def test_arbitrary_real_ratio(self):
        x = _tone(16000, 500, 2.0)
        r = 1.0 / np.pi
        y = np.asarray(resample.sincresample(jnp.asarray(x), float(r)))
        ref = _tone(16000 * r, 500, 2.1)[:len(y)]
        assert _snr(ref, y) > 55.0

    def test_no_drift_long_signal(self):
        # rational path: exact positions, so a late window of a long tone
        # stays phase-locked to the analytic reference
        fs = 16000
        x = _tone(fs, 440, 30.0)
        y = np.asarray(resample.rresample(jnp.asarray(x), 441, 440))
        fs2 = fs * 441 / 440
        n0 = int(29.0 * fs2)
        t = np.arange(n0, n0 + 4000) / fs2
        ref = np.sin(2 * np.pi * 440 * t)
        assert _snr(ref, y[n0:n0 + 4000], trim=10) > 55.0


class TestArbitraryRateAnalysis:
    def test_create_aoptions_44100(self):
        opt = create_aoptions(fs=44100.0)
        assert opt.fs_input == 44100.0
        assert abs(opt.conf.thop * opt.conf.fs
                   - round(opt.conf.thop * opt.conf.fs)) < 1e-9

    def test_441k_roundtrip_parity_with_16k(self):
        """44.1 kHz round trip at 16k-parity quality.  Round 2 reported
        45.8 dB here and flagged a ~13 dB resample loss; the bisect
        (round 3) showed the deficit was an OLA onset-edge artifact of
        the short 0.6 s fixture -- at 1 s the full chain measures
        57.3 dB, identical to the 16 kHz figure, and the resampler alone
        round-trips at 82 dB.  Floor set at 50 dB (~7 dB margin)."""
        fs = 44100.0
        opt = create_aoptions(fs=fs, maxnhar=60, f0_floor=100.0)
        x, f0 = testsig.make_test_utterance(duration=1.0, fs=fs, thop=0.005)
        chunk = layer0.analyze(opt, x, f0)
        out = layer0.synthesize(create_soptions(fs=fs), chunk)
        y = np.asarray(out.y_sin)
        assert out.fs == fs
        assert len(y) == int(round(chunk.nfrm * opt.conf.thop * fs))
        n = min(len(x), len(y))
        assert metrics.snr_db(x[:n], y[:n]) > 50.0

    def test_cli_roundtrip_441k(self, tmp_path):
        from libllsm2_tpu import cli
        from libllsm2_tpu.utils import audio
        fs = 44100.0
        x, _ = testsig.make_test_utterance(duration=0.4, fs=fs, thop=0.005)
        wav_in = str(tmp_path / "in.wav")
        wav_out = str(tmp_path / "out.wav")
        audio.wavwrite(wav_in, x.astype(np.float32), fs)
        cli.main(["roundtrip", wav_in, wav_out])
        y, fs_out = audio.wavread(wav_out)
        assert fs_out == fs
        assert abs(len(y) - len(x)) < 0.01 * fs


class TestLongSignalPrecision:
    def test_sincresample_no_decay_on_long_signal(self):
        """Positions use exact rational arithmetic: local SNR against the
        resampler's TRUE rational rate must not decay with time (the old
        float32 m*step product decayed 77 dB -> 40 dB by two minutes).
        The ratio itself is quantized to ~1e-8 relative -- a constant,
        inaudible pitch offset, asserted separately."""
        fs = 16000
        dur = 120.0
        t = np.arange(int(fs * dur)) / fs
        x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
        r = 2.0 / np.pi
        p, q = resample._best_rational(r, 46000)
        assert abs(p / q - r) / r < 2e-8
        y = np.asarray(resample.sincresample(jnp.asarray(x), float(r)))
        fs2 = fs * p / q              # the true output rate

        def snr_at(t0):
            n0 = int(t0 * fs2)
            tt = np.arange(n0, n0 + 8000) / fs2
            ref = np.sin(2 * np.pi * 1000 * tt)
            e = y[n0:n0 + 8000] - ref
            return 10 * np.log10(np.sum(ref ** 2) / np.sum(e ** 2))

        early, late = snr_at(2.0), snr_at(dur - 4.0)
        assert late > 80.0, (early, late)
        assert abs(early - late) < 3.0, (early, late)

    def test_rresample_large_coprime_rates(self):
        """48000<->48001-style coprime pairs would overflow int32 r*q;
        they must be re-approximated, not silently corrupted."""
        fs = 48001.0
        t = np.arange(24000) / fs
        x = np.sin(2 * np.pi * 800 * t).astype(np.float32)
        y = np.asarray(resample.resample_to(x, 48001.0, 48000.0))
        ty = np.arange(len(y)) / 48000.0
        ref = np.sin(2 * np.pi * 800 * ty)
        assert _snr(ref, y) > 60.0
