"""F0 tracker tests (reference analog: libpyin used by the reference's
tests to feed llsm_analyze; SURVEY.md libpyin row)."""
import numpy as np
import jax.numpy as jnp

from libllsm2_tpu import create_aoptions, create_soptions
from libllsm2_tpu.models import layer0
from libllsm2_tpu.ops import f0 as f0mod
from libllsm2_tpu.utils import testsig

from test_layer0 import snr_db


def test_tracks_known_f0():
    x, f0_true = testsig.make_test_utterance(duration=1.0, noise_level=0.02)
    cfg = f0mod.F0Config()
    f0_est = np.asarray(f0mod.track(cfg, jnp.asarray(x, jnp.float32)))
    n = min(len(f0_est), len(f0_true))
    # interior voiced frames: relative error under 1%
    sl = slice(10, n - 10)
    rel = np.abs(f0_est[sl] - f0_true[sl]) / f0_true[sl]
    assert np.median(rel) < 0.005, np.median(rel)
    assert np.mean(rel < 0.02) > 0.9, np.mean(rel < 0.02)


def test_unvoiced_detected():
    x, f0_true = testsig.make_test_utterance(duration=1.0, noise_level=0.1,
                                             unvoiced_tail_frac=0.3)
    cfg = f0mod.F0Config()
    f0_est = np.asarray(f0mod.track(cfg, jnp.asarray(x, jnp.float32)))
    n = len(f0_true)
    tail = f0_est[int(0.75 * n):int(0.95 * n)]
    head = f0_est[10:int(0.6 * n)]
    assert np.mean(tail == 0.0) > 0.6, np.mean(tail == 0.0)
    assert np.mean(head > 0.0) > 0.9, np.mean(head > 0.0)


def test_glide_voicing_recall():
    """F0 glides must not break voicing: the legacy full-window YIN
    integration (64 ms) let the lag drift across the span and the CMNDF
    minimum rose past the voicing threshold -- measured recall ~0.4-0.7
    on fully voiced short glide fixtures (the YIN-paper fixed ~2-period
    span restores it)."""
    rng = np.random.default_rng(1)
    for i in range(4):
        dur = float(rng.uniform(0.25, 0.45))
        x, f0_true = testsig.make_test_utterance(duration=dur,
                                                 seed=10 + i)
        cfg = f0mod.F0Config(f0_floor=90.0)
        tr = np.asarray(f0mod.track(cfg, jnp.asarray(x, jnp.float32)))
        nf = min(len(f0_true), len(tr))
        v = tr[:nf] > 0
        assert np.mean(v) > 0.9, (i, np.mean(v))
        rel = np.abs(tr[:nf][v] - f0_true[:nf][v]) / f0_true[:nf][v]
        assert np.median(rel) < 0.005, (i, np.median(rel))


def test_self_contained_pipeline():
    """Raw audio -> tracked F0 -> analyze -> synthesize, no external F0."""
    x, f0_true = testsig.make_test_utterance(duration=1.0)
    cfg = f0mod.F0Config()
    f0_est = np.asarray(f0mod.track(cfg, jnp.asarray(x, jnp.float32)))
    opt = create_aoptions()
    chunk = layer0.analyze(opt, x, f0_est[:len(f0_true)])
    out = layer0.synthesize(create_soptions(), chunk)
    s = snr_db(x, np.asarray(out.y_sin))
    # tracked F0 + phase-slope refinement must stay close to the known-F0
    # round trip
    assert s >= 30.0, s


def test_batch_tracking():
    xs = []
    for i in range(3):
        x, _ = testsig.make_test_utterance(duration=0.5, seed=i)
        xs.append(x)
    batch = jnp.asarray(np.stack(xs), jnp.float32)
    cfg = f0mod.F0Config()
    out = np.asarray(f0mod.track_batch(cfg, batch))
    assert out.shape[0] == 3
    assert np.all(np.isfinite(out))


def test_octave_traps():
    """Octave robustness (VERDICT r2 #3): under a strong formant at
    2*F0 or 3*F0 the CMNDF dips at the half/double lag and the plain
    pYIN+Viterbi tracker demonstrably octave-errs (measured: f0=130
    trap -> 100% octave-DOWN, f0=200 trap -> 100% octave-UP with
    hs_weight=0).  The harmonic-comb observation term must fix these
    to zero octave errors."""
    for f0b, mult in ((130.0, 2.0), (200.0, 2.0), (110.0, 3.0),
                      (90.0, 2.0)):
        x, f0t = testsig.make_octave_trap(f0_base=f0b, fmt_mult=mult)
        est = np.asarray(f0mod.track(f0mod.F0Config(), x))
        v = est > 0
        assert v.mean() > 0.9, (f0b, mult, v.mean())
        ref = np.interp(np.where(v)[0], np.arange(len(f0t)), f0t)
        frac_ok = np.mean(np.abs(est[v] / ref - 1.0) < 0.1)
        assert frac_ok == 1.0, (f0b, mult, frac_ok)
    # the baseline (comb disabled) really does fail these traps -- keeps
    # the fixture family honest if the tracker changes
    x, f0t = testsig.make_octave_trap(f0_base=130.0, fmt_mult=2.0)
    est0 = np.asarray(f0mod.track(f0mod.F0Config(hs_weight=0.0), x))
    v = est0 > 0
    ref = np.interp(np.where(v)[0], np.arange(len(f0t)), f0t)
    assert np.mean(np.abs(est0[v] / ref - 1.0) < 0.1) < 0.5
