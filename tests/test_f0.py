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
