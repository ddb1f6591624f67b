"""Harmonic-method parity (HMCZT vs HMPP analog) and numerical-hygiene
jobs (debug-nans; jit/vmap consistency via chex variants -- SURVEY.md
section 4 rebuild test strategy, section 5 sanitizers row)."""
import dataclasses

import chex
import jax
import jax.numpy as jnp
import numpy as np

from libllsm2_tpu import create_aoptions, create_soptions
from libllsm2_tpu.models import layer0
from libllsm2_tpu.ops import harmonics
from libllsm2_tpu.utils import testsig

from test_layer0 import snr_db


def test_peak_picking_method_roundtrip():
    x, f0 = testsig.make_test_utterance(duration=0.6)
    opt = dataclasses.replace(create_aoptions(), hm_method="pp")
    chunk = layer0.analyze(opt, x, f0)
    out = layer0.synthesize(create_soptions(), chunk)
    s = snr_db(x, np.asarray(out.y_sin))
    assert s >= 20.0, s


def test_peak_picking_robust_to_f0_error():
    """HMPP must degrade more gracefully than the zoom when the given F0
    is 2% off and refinement is disabled (its reason to exist)."""
    x, f0 = testsig.make_test_utterance(duration=0.6)
    res = {}
    for method in ("czt", "pp"):
        opt = dataclasses.replace(create_aoptions(), hm_method=method,
                                  f0_refine=False)
        chunk = layer0.analyze(opt, x, f0 * 1.02)
        out = layer0.synthesize(create_soptions(), chunk)
        res[method] = snr_db(x, np.asarray(out.y_sin))
    assert res["pp"] > res["czt"] + 3.0, res


def test_analysis_no_nans_under_debug_nans():
    """jax_debug_nans job (SURVEY.md section 5): the full pipeline must
    not generate NaNs/Infs anywhere, including masked lanes."""
    x, f0 = testsig.make_test_utterance(duration=0.3, noise_level=0.1,
                                        unvoiced_tail_frac=0.4)
    with jax.debug_nans(True):
        opt = create_aoptions()
        chunk = layer0.analyze(opt, x, f0)
        out = layer0.synthesize(create_soptions(), chunk)
        np.asarray(out.y)


class TestChexVariants(chex.TestCase):
    @chex.variants(with_jit=True, without_jit=True)
    def test_oscillator_bank_jit_consistency(self):
        rng = np.random.default_rng(0)
        N, K, nhop = 11, 8, 40
        nx = N * nhop
        f0 = jnp.full((N,), 150.0)
        cyc = harmonics.sample_cycles(f0, nhop, 16000.0, nx)
        centers = jnp.arange(N, dtype=jnp.int32) * nhop
        ampl = jnp.asarray(rng.uniform(0, 1, (N, K)), jnp.float32)
        phse = jnp.asarray(rng.uniform(-3, 3, (N, K)), jnp.float32)
        mask = jnp.ones((N, K), jnp.float32)

        fn = self.variant(
            lambda a, p: harmonics.oscillator_bank(
                cyc, centers, a, p, mask, nhop=nhop))
        out = fn(ampl, phse)
        assert out.shape == (N, 2 * nhop)
        assert np.all(np.isfinite(np.asarray(out)))


def test_synthesis_at_different_fs():
    """Reference: llsm_soptions.fs -- synthesis at a different sample rate
    renders directly on the output grid."""
    x, f0 = testsig.make_test_utterance(duration=0.5)
    chunk = layer0.analyze(create_aoptions(), x, f0)
    for fs_out, ratio in [(8000.0, 0.5), (32000.0, 2.0)]:
        out = layer0.synthesize(create_soptions(fs=fs_out), chunk)
        y = np.asarray(out.y)
        assert len(y) == int(len(x) * ratio)
        assert np.all(np.isfinite(y))
        # the dominant peak must sit on a harmonic of the SAME absolute F0
        mid = len(y) // 2
        w = min(2048, len(y) - mid)
        spec = np.abs(np.fft.rfft(np.asarray(out.y_sin)[mid:mid + w]
                                  * np.hanning(w)))
        fpk_hz = spec[5:].argmax() + 5
        fpk_hz = fpk_hz * fs_out / w
        f0_mid = float(chunk.f0[chunk.nfrm // 2])
        ratio_h = fpk_hz / f0_mid
        assert abs(ratio_h - round(ratio_h)) < 0.25, (fpk_hz, f0_mid)


def test_synthesis_is_differentiable():
    """Gradients flow through synthesis w.r.t. chunk parameters (jnp path)
    -- enables analysis-by-synthesis / neural-vocoder training losses
    through the renderer."""
    import jax
    x, f0 = testsig.make_test_utterance(duration=0.2)
    chunk = layer0.analyze(create_aoptions(), x, f0)
    sopt = create_soptions()
    target = jnp.asarray(x, jnp.float32)

    def loss(ampl):
        out = layer0._synthesize_jit(sopt, chunk.replace(ampl=ampl))
        n = min(target.shape[0], out.y_sin.shape[0])
        return jnp.mean((out.y_sin[:n] - target[:n]) ** 2)

    # start away from the optimum so descent is observable
    a0 = chunk.ampl * 0.5
    g = jax.grad(loss)(a0)
    assert g.shape == chunk.ampl.shape
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0.0
    l0 = float(loss(a0))
    # small normalized gradient step reduces the loss
    step = 0.1 * float(jnp.abs(a0).max()) / float(jnp.abs(g).max())
    l1 = float(loss(a0 - step * g))
    assert l1 < l0, (l0, l1)


def test_upsampled_noise_rolls_off():
    """SPEC (VERDICT r1 #7): synthesizing at fs_out > conf.fs must NOT
    extrapolate noise above the analysis Nyquist -- energy in
    [conf.fs/2, fs_out/2] stays >= 40 dB below the in-band noise."""
    import dataclasses

    from libllsm2_tpu import create_aoptions, create_soptions
    from libllsm2_tpu.models import layer0
    from libllsm2_tpu.utils import testsig

    x, f0 = testsig.make_test_utterance(duration=0.5, noise_level=0.1)
    opt = create_aoptions()
    conf = opt.conf
    chunk = layer0.analyze(opt, x, f0)
    out = layer0.synthesize(create_soptions(fs=2 * conf.fs), chunk)
    y_nos = np.asarray(out.y_nos)
    spec = np.abs(np.fft.rfft(y_nos)) ** 2
    f = np.fft.rfftfreq(len(y_nos), 1.0 / out.fs)
    inband = spec[(f > 2500.0) & (f < conf.fs / 2 * 0.9)].mean()
    above = spec[f > conf.fs / 2].mean()
    assert above < inband * 1e-4, (10 * np.log10(above / inband))


def test_peak_picking_accuracy_delta_vs_czt():
    """VERDICT r2 weak #6: the pp path's accuracy delta vs czt, measured
    and stated.  With an exact F0 track the chirped zoomed projection is
    far more accurate (57.3 vs 28.7 dB measured on the 1 s vibrato
    fixture: peak-picking measures each harmonic at a rounded FFT peak
    of a constant-frequency basis, czt projects on the exact chirped
    track); pp's value is robustness to F0 error (previous test).  Both
    paths now frame gather-free (frame_hops)."""
    import dataclasses

    from libllsm2_tpu.utils import metrics

    x, f0 = testsig.make_test_utterance(duration=1.0)
    res = {}
    for method in ("czt", "pp"):
        opt = dataclasses.replace(create_aoptions(), hm_method=method)
        chunk = layer0.analyze(opt, x, f0)
        y = np.asarray(layer0.synthesize(create_soptions(), chunk).y_sin)
        n = min(len(x), len(y))
        res[method] = metrics.snr_db(x[:n], y[:n])
    assert res["pp"] > 24.0, res        # absolute pp floor
    assert res["czt"] > res["pp"] + 15.0, res   # czt is the quality path
