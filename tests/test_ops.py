"""Unit tests for DSP primitives vs numpy/scipy references
(SURVEY.md section 4: rebuild test strategy)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import signal as sps

from libllsm2_tpu.ops import interp, lf, spectral, warp, windows


class TestWindows:
    def test_hann_matches_numpy(self):
        n = 128
        u = jnp.arange(n) / (n - 1)
        w = windows.window_eval("hanning", u)
        ref = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / (n - 1))
        np.testing.assert_allclose(np.asarray(w), ref, atol=1e-6)

    def test_outside_support_is_zero(self):
        w = windows.window_eval("blackman_harris", jnp.array([-0.1, 1.1]))
        np.testing.assert_array_equal(np.asarray(w), [0.0, 0.0])

    def test_centered_support(self):
        n = jnp.arange(-10, 11, dtype=jnp.float32)
        w = windows.window_centered("hanning", n, 5.0)
        w = np.asarray(w)
        assert w[0] == 0.0 and w[-1] == 0.0
        assert abs(w[10] - 1.0) < 1e-6  # peak at center


class TestCZT:
    def test_matches_direct_dtft(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(200).astype(np.float32)
        f_step = 0.0123
        m = 16
        out = np.asarray(spectral.czt(jnp.array(x), m, f_step))
        n = np.arange(200)
        for k in range(m):
            ref = np.sum(x * np.exp(-2j * np.pi * f_step * k * n))
            assert abs(out[k] - ref) < 1e-2 * max(1.0, abs(ref))

    def test_reduces_to_dft(self):
        x = np.random.default_rng(1).standard_normal(64).astype(np.float32)
        out = np.asarray(spectral.czt(jnp.array(x), 64, 1.0 / 64))
        ref = np.fft.fft(x)
        np.testing.assert_allclose(out, ref, atol=1e-3)


class TestMinphase:
    def test_minphase_of_allpole(self):
        # |H| of a known minimum-phase (stable all-pole) system: recovered
        # phase must match the true phase.
        nfft = 512
        b, a = [1.0], [1.0, -0.8]
        wgrid, h = sps.freqz(b, a, worN=nfft // 2 + 1)
        logmag = np.log(np.abs(h)).astype(np.float32)
        phase = np.asarray(spectral.minphase_phase(jnp.array(logmag)))
        ref_phase = np.unwrap(np.angle(h))
        # tolerance bounded by cepstral truncation at this nfft
        np.testing.assert_allclose(phase, ref_phase, atol=1e-2)


class TestQifft:
    def test_parabolic_peak(self):
        # exact parabola: peak location recovered exactly
        bins = np.arange(10, dtype=np.float32)
        true_peak = 5.3
        y = -((bins - true_peak) ** 2) + 4.0
        k, v = spectral.qifft(jnp.array(y), jnp.array(5))
        assert abs(float(k) - true_peak) < 1e-4
        assert abs(float(v) - 4.0) < 1e-4


class TestWarp:
    def test_roundtrip(self):
        f = jnp.linspace(0.0, 8000.0, 100)
        fw = warp.warp_frequency(f, 15000.0)
        back = warp.unwarp_frequency(fw, 15000.0)
        np.testing.assert_allclose(np.asarray(back), np.asarray(f), rtol=1e-5,
                                   atol=1e-2)

    def test_band_matrix_preserves_flat_psd(self):
        m = warp.warped_band_matrix(64, 257, 16000.0, 15000.0)
        flat = jnp.ones(257)
        out = np.asarray(m @ flat)
        np.testing.assert_allclose(out, 1.0, atol=1e-5)


class TestInterp:
    def test_interp1_uniform_matches_numpy(self):
        fp = jnp.array([0.0, 1.0, 4.0, 9.0, 16.0])
        pos = jnp.array([0.5, 2.25, 3.9, -1.0, 10.0])
        out = np.asarray(interp.interp1_uniform(fp, pos))
        ref = np.interp(np.clip(np.asarray(pos), 0, 4), np.arange(5),
                        np.asarray(fp))
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_fetch_frames(self):
        x = jnp.arange(10.0)
        out = np.asarray(interp.fetch_frames(x, jnp.array([0, 5, 9]), 2))
        np.testing.assert_array_equal(out[1], [3, 4, 5, 6, 7])
        np.testing.assert_array_equal(out[0], [0, 0, 0, 1, 2])
        np.testing.assert_array_equal(out[2], [7, 8, 9, 0, 0])


class TestLF:
    def test_params_reasonable(self):
        p = lf.lf_from_rd(jnp.array([0.3, 1.0, 2.7]))
        tp, te, ta = map(np.asarray, (p.tp, p.te, p.ta))
        assert np.all(tp < te) and np.all(te < 1.0) and np.all(ta > 0)
        # larger Rd -> more "relaxed" -> later te
        assert te[2] > te[0]

    def test_flow_balance(self):
        # net flow over one period integrates to ~0 (closure condition)
        p = lf.lf_from_rd(jnp.array(1.0))
        t = jnp.linspace(0, 1, 20000, endpoint=False)
        u = np.asarray(lf.lf_flow_deriv(t, p))
        assert abs(np.mean(u)) < 2e-3 * np.abs(u).max()

    def test_continuity_at_te(self):
        p = lf.lf_from_rd(jnp.array(1.0))
        te = float(p.te)
        u_left = float(lf.lf_flow_deriv(jnp.array(te - 1e-5), p))
        u_right = float(lf.lf_flow_deriv(jnp.array(te + 1e-5), p))
        assert abs(u_left + 1.0) < 1e-2      # U'(te) = -Ee = -1
        assert abs(u_right + 1.0) < 2e-2

    def test_spectrum_matches_fft_of_flow(self):
        # analytic spectrum vs FFT of the densely sampled waveform
        p = lf.lf_from_rd(jnp.array(0.8))
        n = 65536
        t = jnp.arange(n) / n
        u = np.asarray(lf.lf_flow_deriv(t, p), np.float64)
        U = np.fft.fft(u) / n  # approximate integral over one period
        for k in [1, 2, 5, 10, 20]:
            ref = U[k]
            got = complex(np.asarray(lf.lf_spectrum(jnp.array(float(k)), p)))
            assert abs(got - ref) < 3e-3 * abs(ref) + 1e-6, (k, got, ref)


class TestICZT:
    def test_inverts_full_circle_czt(self):
        rng = np.random.default_rng(5)
        x = rng.standard_normal(64).astype(np.float32)
        X = spectral.czt(jnp.array(x), 64, 1.0 / 64)
        back = np.asarray(spectral.iczt(X, 1.0 / 64))
        np.testing.assert_allclose(back.real, x, atol=1e-3)
        np.testing.assert_allclose(back.imag, 0.0, atol=1e-3)


class TestInstantaneousFrequency:
    """Standalone IF detector (reference: ciglet.h -> ifdetector),
    VERDICT r1 missing #3."""

    def test_tone_offset_recovered(self):
        fs = 16000.0
        t = np.arange(16000) / fs
        x = np.sin(2 * np.pi * 212.5 * t).astype(np.float32)
        centers = jnp.arange(20, dtype=jnp.int32) * 400 + 2000
        fi = np.asarray(spectral.instantaneous_frequency(
            jnp.asarray(x), centers, jnp.full(20, 200.0),
            fs=fs, halfwidth=jnp.full(20, fs / 200 * 3), halfwin_max=300))
        assert abs(fi.mean() - 212.5) < 0.1
        assert fi.std() < 0.5

    def test_chirp_tracked(self):
        fs = 16000.0
        t = np.arange(16000) / fs
        f0c, f1c = 150.0, 250.0
        x = np.sin(2 * np.pi * (f0c * t + 0.5 * (f1c - f0c) * t ** 2))
        cts = jnp.arange(10, dtype=jnp.int32) * 1200 + 2000
        truth = f0c + (f1c - f0c) * np.asarray(cts) / fs
        fi = np.asarray(spectral.instantaneous_frequency(
            jnp.asarray(x, jnp.float32), cts,
            jnp.asarray(truth - 8.0, jnp.float32), fs=fs,
            halfwidth=jnp.full(10, 240.0), halfwin_max=300))
        assert np.abs(fi - truth).max() < 0.5
