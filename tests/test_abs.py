"""Analysis-by-synthesis refinement tests (models/abs.py) -- a
capability the C reference cannot express: gradient descent through the
synthesizer recovers accuracy a closed-form estimator leaves behind."""
import dataclasses

import numpy as np

from libllsm2_tpu import create_aoptions, create_soptions
from libllsm2_tpu.models import abs as absmod, layer0
from libllsm2_tpu.utils import testsig


def snr_db(ref, est):
    n = min(len(ref), len(est))
    lo, hi = int(0.05 * n), int(0.95 * n)
    e = np.asarray(ref)[lo:hi] - np.asarray(est)[lo:hi]
    return 10 * np.log10(np.sum(np.asarray(ref)[lo:hi] ** 2)
                         / max(np.sum(e ** 2), 1e-20))


def test_abs_refine_recovers_crippled_analysis():
    """Start from a deliberately weakened analysis (single pass, no
    correction) and refine against the clean input: the waveform loss
    must drop monotonically-ish and the harmonic SNR must recover most
    of what the full estimator achieves."""
    x, f0, xh = testsig.synth_hard_utterance(
        duration=0.6, register="female", seed=3, jitter=0.01, shimmer=0.1,
        noise_level=0.0, burst=False, unvoiced_tail_frac=0.0)
    opt_weak = dataclasses.replace(create_aoptions(), hm_passes=1,
                                   hm_correction="none")
    sopt = create_soptions()
    chunk = layer0.analyze(opt_weak, x, f0)
    snr_before = snr_db(xh, np.asarray(layer0.synthesize(sopt, chunk).y_sin))

    refined, losses = absmod.abs_refine(sopt, chunk, x, n_steps=100, lr=0.1)
    snr_after = snr_db(xh, np.asarray(layer0.synthesize(sopt, refined).y_sin))

    # the loss FLOOR is the OLA edge error (first/last half-windows), so
    # assert improvement, not a large ratio; the voiced-core SNR is the
    # real oracle (measured: 48.1 -> ~57 dB, above even the explicit
    # Gauss-Seidel pass)
    losses = np.asarray(losses)
    assert losses[-1] < 0.95 * losses[0], (losses[0], losses[-1])
    assert snr_after > snr_before + 6.0, (snr_before, snr_after)
    # masked (unvoiced / above-Nyquist) slots stay zero
    m = np.asarray(chunk.hm_mask)
    assert float(np.abs(np.asarray(refined.ampl) * (1 - m)).max()) == 0.0


def test_abs_refine_noop_on_perfect_chunk():
    """Refining against the chunk's own resynthesis must not degrade it
    (the optimum is the starting point)."""
    x, f0 = testsig.make_test_utterance(duration=0.4, seed=2)
    opt = create_aoptions()
    sopt = create_soptions()
    chunk = layer0.analyze(opt, x, f0)
    y_own = np.asarray(layer0.synthesize(sopt, chunk).y_sin)
    refined, losses = absmod.abs_refine(sopt, chunk, y_own, n_steps=20,
                                        lr=0.01)
    y_ref = np.asarray(layer0.synthesize(sopt, refined).y_sin)
    assert snr_db(y_own, y_ref) > 35.0
