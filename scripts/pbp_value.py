"""Does PbP beat the sinusoidal render anywhere? (VERDICT r4 next #4)

SURVEY.md:63 claims PbP gives "higher quality under aggressive pitch/Rd
edits"; rounds 3-4 only ever measured PARITY (within ~1 dB).  This
experiment searches for a regime with a DIRECTION, on the physics where
PbP should win: the sinusoidal render OLA-crossfades whole frames
(2*nhop = 10 ms), so when source parameters change FAST at LOW F0 the
crossfade mixes two phase-incoherent pulse shapes across a large
fraction of a period -- while PbP switches shape per pulse, exactly how
a physical glottis behaves (and how the ground-truth fixture is built:
synth_lf_speech holds Rd constant per glottal cycle).

Regimes swept (all on a low-F0 male fixture, formant defaults):
  rd-step-N    Rd alternates 0.6 <-> 2.4 every N frames (edit applied to
               an analyzed constant-Rd chunk; truth re-synthesized with
               the same per-cycle-held Rd track)
  rd-sweep     one fast linear sweep 0.4 -> 2.7 over the utterance
  f0x2+step    pitch shift x2 on top of the Rd alternation

Metric: harmonic amplitude-track SNR vs the ground-truth render's
analysis (phase-free; same oracle as tests/test_pbp.py).

Run: python scripts/pbp_value.py            (~2 min CPU)
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")

from libllsm2_tpu import create_aoptions, create_soptions
from libllsm2_tpu.models import edits, layer0, layer1, pbp
from libllsm2_tpu.utils import testsig


def track_snr(ca, cb, f0):
    aa, ab = np.asarray(ca.ampl), np.asarray(cb.ampl)
    m = ((np.asarray(ca.hm_mask) * np.asarray(cb.hm_mask)) > 0) \
        & (np.asarray(f0) > 0)[:, None]
    m[:4] = False
    m[len(m) - 4:] = False
    g = np.sum(aa[m] * ab[m]) / max(np.sum(ab[m] ** 2), 1e-12)
    return 10 * np.log10(np.sum(aa[m] ** 2)
                         / max(np.sum((aa - g * ab)[m] ** 2), 1e-12))


def run_regime(name, f0_base, rd_track_fn, f0_mult=1.0, nfrm=200):
    opt = create_aoptions()
    sopt = create_soptions()
    f0t = np.full(nfrm, f0_base, np.float64)
    x, _ = testsig.synth_lf_speech(f0t, rd=0.6, noise_level=0.0)
    l1 = layer1.chunk_to_layer1(layer0.analyze(opt, x, jnp.asarray(f0t)))

    rd_t = rd_track_fn(nfrm).astype(np.float32)
    l1e = l1.replace(rd=jnp.asarray(rd_t))
    if f0_mult != 1.0:
        l1e = edits.pitch_shift(l1e, f0_mult)
    f0e = f0t * f0_mult

    y_sin = np.asarray(
        layer0.synthesize(sopt, layer1.chunk_to_layer0(l1e)).y_sin)
    y_pbp = np.asarray(pbp.pbp_synthesize(sopt, l1e).y_sin)

    x_t, _ = testsig.synth_lf_speech(f0e, rd=rd_t.astype(np.float64),
                                     noise_level=0.0)
    f0ej = jnp.asarray(f0e)
    ch_t = layer0.analyze(opt, np.asarray(x_t, np.float64), f0ej)
    s_sin = track_snr(ch_t, layer0.analyze(opt, y_sin, f0ej), f0e)
    s_pbp = track_snr(ch_t, layer0.analyze(opt, y_pbp, f0ej), f0e)
    print(f"{name:<22} f0={f0_base:3.0f} x{f0_mult:.1f}: "
          f"sin {s_sin:6.2f}  pbp {s_pbp:6.2f}  "
          f"delta {s_pbp - s_sin:+5.2f} dB", flush=True)
    return s_sin, s_pbp


def main():
    def steps(n_hold):
        def fn(nfrm):
            t = (np.arange(nfrm) // n_hold) % 2
            return np.where(t == 0, 0.6, 2.4)
        return fn

    def sweep(nfrm):
        return np.linspace(0.4, 2.7, nfrm)

    def const(v):
        return lambda nfrm: np.full(nfrm, v)

    for f0b in (70.0, 110.0):
        run_regime("rd-const-2.4 (ctrl)", f0b, const(2.4))
        for hold in (8, 4, 2):
            run_regime(f"rd-step-{hold}", f0b, steps(hold))
        run_regime("rd-sweep", f0b, sweep)
        run_regime("f0x2+rd-step-4", f0b, steps(4), f0_mult=2.0)
        run_regime("f0x0.6+rd-step-4", f0b, steps(4), f0_mult=0.6)
        print()


if __name__ == "__main__":
    main()
