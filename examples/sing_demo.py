"""Singing synthesis from one analyzed vowel: the concatenative pipeline
the reference ecosystem is known for (analyze a sustained sample once,
then per note: formant-preserving pitch shift + time stretch + vibrato,
spliced with phase-aligned crossfades).

  python examples/sing_demo.py            # writes examples/out/20_melody.wav
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (midi note, duration s); a simple phrase
MELODY = [(57, 0.35), (60, 0.35), (64, 0.35), (65, 0.5),
          (64, 0.35), (60, 0.35), (57, 0.9)]


def midi_hz(m):
    return 440.0 * 2.0 ** ((m - 69) / 12.0)


def main():
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass

    from libllsm2_tpu import create_aoptions, create_soptions
    from libllsm2_tpu.models import edits, layer0, layer1
    from libllsm2_tpu.utils import audio, testsig

    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")
    os.makedirs(outdir, exist_ok=True)
    fs, thop = 16000.0, 0.005

    # one sustained vowel sample (flat 150 Hz, 0.5 s) analyzed once
    nfrm = 100
    f0 = np.full(nfrm, 150.0)
    x, _ = testsig.synth_harmonic(f0, fs=fs, thop=thop, seed=7,
                                  noise_level=0.03)
    opt = create_aoptions()
    unit = layer1.chunk_to_layer1(layer0.analyze(opt, x, f0))
    base_dur = nfrm * thop

    song = None
    for note, dur in MELODY:
        n = edits.pitch_shift(unit, midi_hz(note) / 150.0)
        n = edits.time_stretch(n, dur / base_dur)
        if dur >= 0.5:                       # vibrato on held notes
            n = edits.vibrato(n, rate_hz=5.5, depth_semitones=0.4)
        song = n if song is None else edits.concat(song, n, 6)

    y = np.asarray(layer0.synthesize(create_soptions(), song).y)
    audio.wavwrite(f"{outdir}/20_melody.wav", y, fs)
    print(f"rendered {len(y) / fs:.2f} s melody -> {outdir}/20_melody.wav")


if __name__ == "__main__":
    main()
