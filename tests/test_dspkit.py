"""Tests for the general-DSP kit (filters/stft/lpc/serialization/audio) vs
scipy/numpy references -- reference test analog: test-dsputils.c."""
import os

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import signal as sps

from libllsm2_tpu.ops import filters, stft
from libllsm2_tpu.utils import audio, serialize, testsig


class TestFilters:
    def test_fir1_bandpass_response(self):
        h = np.asarray(filters.fir1_bandpass(127, 1000.0, 3000.0, 16000.0))
        w, resp = sps.freqz(h, worN=512, fs=16000.0)
        mag = np.abs(resp)
        assert mag[(w > 1500) & (w < 2500)].min() > 0.7
        assert mag[w < 400].max() < 0.05
        assert mag[w > 5000].max() < 0.05

    def test_fftfilt_matches_scipy(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(500).astype(np.float32)
        h = rng.standard_normal(31).astype(np.float32)
        got = np.asarray(filters.fftfilt(jnp.array(h), jnp.array(x)))
        ref = sps.lfilter(h, [1.0], x)
        np.testing.assert_allclose(got, ref, atol=1e-3)

    def test_biquad_matches_scipy(self):
        b, a = sps.butter(2, 0.3)
        rng = np.random.default_rng(1)
        x = rng.standard_normal(300).astype(np.float32)
        got = np.asarray(filters.biquad(jnp.array(x), b, a))
        ref = sps.lfilter(b, a, x)
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_levinson_matches_direct_solve(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal(2048)
        x = sps.lfilter([1.0], [1.0, -1.2, 0.5], x)  # AR(2) process
        order = 2
        r = np.correlate(x, x, "full")[len(x) - 1:len(x) + order]
        a, err = filters.levinson(jnp.array(r, jnp.float32), order)
        a = np.asarray(a)
        np.testing.assert_allclose(a[1:], [-1.2, 0.5], atol=0.05)

    def test_lpc_spectrum_tracks_ar_process(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal(4096)
        x = sps.lfilter([1.0], [1.0, -0.9], x)
        a, err = filters.lpc_from_signal(
            jnp.array(x * np.hanning(len(x)), jnp.float32), 4)
        spec = np.asarray(filters.lpc_spectrum(a, err, 129))
        assert spec[0] > spec[-1] * 3  # lowpass tilt of the AR(1) pole


class TestSTFT:
    def test_roundtrip(self):
        x, _ = testsig.make_test_utterance(duration=0.3)
        x = jnp.asarray(x[None, :], jnp.float32)
        spec = stft.stft(x, 256, 64)
        y = stft.istft(spec, 256, 64, x.shape[-1])
        lo, hi = 256, x.shape[-1] - 256
        np.testing.assert_allclose(np.asarray(y)[0, lo:hi],
                                   np.asarray(x)[0, lo:hi], atol=1e-3)

    def test_dct_matches_scipy(self):
        from scipy.fft import dct as sdct
        rng = np.random.default_rng(4)
        x = rng.standard_normal(64).astype(np.float32)
        got = np.asarray(stft.dct(jnp.array(x)))
        ref = sdct(x, type=2, norm="ortho")
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_hilbert_envelope(self):
        t = np.arange(4096) / 16000.0
        carrier = np.sin(2 * np.pi * 1000 * t)
        env = 1.0 + 0.5 * np.sin(2 * np.pi * 20 * t)
        got = np.asarray(stft.hilbert_envelope(jnp.array(env * carrier,
                                                         jnp.float32)))
        np.testing.assert_allclose(got[200:-200], env[200:-200], rtol=0.05)


class TestSerialization:
    def test_npz_roundtrip(self, tmp_path):
        from libllsm2_tpu import create_aoptions
        from libllsm2_tpu.models import layer0, layer1
        x, f0 = testsig.make_test_utterance(duration=0.3)
        chunk = layer1.chunk_to_layer1(
            layer0.analyze(create_aoptions(), x, f0))
        p = str(tmp_path / "chunk.npz")
        serialize.chunk_save(p, chunk)
        back = serialize.chunk_load(p)
        assert back.conf == chunk.conf
        np.testing.assert_allclose(np.asarray(back.ampl),
                                   np.asarray(chunk.ampl), atol=1e-7)
        np.testing.assert_allclose(np.asarray(back.rd),
                                   np.asarray(chunk.rd), atol=1e-7)


class TestAudio:
    def test_wav_roundtrip(self, tmp_path):
        x, _ = testsig.make_test_utterance(duration=0.2)
        p = str(tmp_path / "t.wav")
        audio.wavwrite(p, x, 16000.0)
        y, fs = audio.wavread(p)
        assert fs == 16000.0
        np.testing.assert_allclose(y, np.clip(x, -1, 1), atol=1e-3)

    def test_orbax_roundtrip(self, tmp_path):
        from libllsm2_tpu import create_aoptions
        from libllsm2_tpu.models import layer0
        x, f0 = testsig.make_test_utterance(duration=0.2)
        chunk = layer0.analyze(create_aoptions(), x, f0)
        p = str(tmp_path / "ckpt")
        serialize.chunk_save_orbax(p, chunk)
        back = serialize.chunk_load_orbax(p)
        assert back.conf == chunk.conf
        np.testing.assert_allclose(np.asarray(back.psd),
                                   np.asarray(chunk.psd), atol=1e-7)


class TestMetrics:
    def test_snr_and_lsd_sane(self):
        from libllsm2_tpu.utils import metrics
        x, _ = testsig.make_test_utterance(duration=0.3)
        assert metrics.snr_db(x, x) > 100
        assert metrics.log_spectral_distance_db(x, x) < 1e-3
        noisy = x + 0.1 * np.random.default_rng(0).standard_normal(len(x))
        assert 5 < metrics.snr_db(x, noisy) < 30
        assert metrics.band_energy_error_db(x, x) < 0.01


class TestCepstrumAndPlotting:
    def test_cepstrum_roundtrip(self):
        from libllsm2_tpu.ops import spectral
        rng = np.random.default_rng(7)
        logmag = jnp.asarray(rng.standard_normal(129), jnp.float32)
        back = spectral.cepstrum_to_spec(spectral.spec_to_cepstrum(logmag))
        np.testing.assert_allclose(np.asarray(back), np.asarray(logmag),
                                   atol=1e-4)

    def test_plot_chunk_writes_file(self, tmp_path):
        from libllsm2_tpu import create_aoptions
        from libllsm2_tpu.models import layer0
        from libllsm2_tpu.utils import plotting
        x, f0 = testsig.make_test_utterance(duration=0.2)
        chunk = layer0.analyze(create_aoptions(), x, f0)
        p = str(tmp_path / "chunk.png")
        plotting.plot_chunk(chunk, p)
        assert os.path.getsize(p) > 1000
        p2 = str(tmp_path / "spec.png")
        plotting.plot_spectra(p2, 16000.0, input=x)
        assert os.path.getsize(p2) > 1000
