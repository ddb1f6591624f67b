"""Generate listening demos into examples/out/ (synthetic fixture in,
WAVs out): round trip, formant-preserving pitch shift, time stretch,
PbP with Rd edits, coder round trip, F0-tracked self-contained pipeline.

  python examples/make_demos.py [duration_s]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(duration=2.0):
    import jax

    # honor JAX_PLATFORMS despite the image's sitecustomize override
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass
    import jax.numpy as jnp

    from libllsm2_tpu import create_aoptions, create_soptions
    from libllsm2_tpu.models import coder, edits, layer0, layer1, pbp
    from libllsm2_tpu.ops import f0 as f0mod
    from libllsm2_tpu.utils import audio, testsig

    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")
    os.makedirs(outdir, exist_ok=True)
    fs = 16000.0

    x, f0 = testsig.make_test_utterance(duration=duration, noise_level=0.06)
    audio.wavwrite(f"{outdir}/00_input.wav", x, fs)

    opt, sopt = create_aoptions(), create_soptions()
    chunk = layer0.analyze(opt, x, f0)
    audio.wavwrite(f"{outdir}/01_roundtrip.wav",
                   np.asarray(layer0.synthesize(sopt, chunk).y), fs)

    l1 = layer1.chunk_to_layer1(chunk)
    for r in (0.5, 2.0):
        y = np.asarray(layer0.synthesize(sopt, edits.pitch_shift(l1, r)).y)
        audio.wavwrite(f"{outdir}/02_pitch_x{r}.wav", y, fs)
    y = np.asarray(layer0.synthesize(sopt, edits.time_stretch(chunk, 1.5)).y)
    audio.wavwrite(f"{outdir}/03_stretch_x1.5.wav", y, fs)

    audio.wavwrite(f"{outdir}/04_pbp.wav",
                   np.asarray(pbp.pbp_synthesize(sopt, l1).y), fs)
    for rd in (0.4, 2.5):
        mod = l1.replace(rd=np.full(l1.nfrm, rd, np.float32))
        audio.wavwrite(f"{outdir}/05_pbp_rd{rd}.wav",
                       np.asarray(pbp.pbp_synthesize(sopt, mod).y), fs)

    cc = coder.CoderConfig(conf=chunk.conf)
    back = coder.decode(cc, coder.encode(cc, l1))
    audio.wavwrite(f"{outdir}/06_coder_roundtrip.wav",
                   np.asarray(layer0.synthesize(sopt, back).y), fs)

    f0_est = np.asarray(f0mod.track(
        f0mod.F0Config(fs=fs), jnp.asarray(x, jnp.float32)))[:len(f0)]
    chunk2 = layer0.analyze(opt, x, f0_est)
    audio.wavwrite(f"{outdir}/07_selfcontained_trackedF0.wav",
                   np.asarray(layer0.synthesize(sopt, chunk2).y), fs)

    y = np.asarray(layer0.synthesize(
        sopt, edits.vibrato(l1, rate_hz=5.5, depth_semitones=0.5)).y)
    audio.wavwrite(f"{outdir}/08_vibrato.wav", y, fs)
    y = np.asarray(layer0.synthesize(
        sopt, edits.tremolo(chunk, rate_hz=5.5, depth_db=4.0)).y)
    audio.wavwrite(f"{outdir}/09_tremolo.wav", y, fs)
    y = np.asarray(layer0.synthesize(
        sopt, edits.formant_shift(l1, 1.25)).y)
    audio.wavwrite(f"{outdir}/10_formant_x1.25.wav", y, fs)
    y = np.asarray(layer0.synthesize(
        sopt, edits.breathiness(l1, 8.0, rd_delta=0.6)).y)
    audio.wavwrite(f"{outdir}/11_breathy.wav", y, fs)

    # a second voice for morph/concat demos
    f0b = testsig.make_f0_track(l1.nfrm, opt.conf.thop, f0_base=210.0)
    xb, _ = testsig.synth_lf_speech(
        f0b, formants=((500, 70), (1500, 100), (2400, 150)),
        noise_level=0.02)
    lb = layer1.chunk_to_layer1(layer0.analyze(opt, np.asarray(xb), f0b))
    t = np.linspace(0.0, 1.0, l1.nfrm).astype(np.float32)
    y = np.asarray(layer0.synthesize(sopt, edits.morph(l1, lb, t)).y)
    audio.wavwrite(f"{outdir}/12_morph_sweep.wav", y, fs)
    y = np.asarray(layer0.synthesize(sopt, edits.concat(chunk, lb, 8)).y)
    audio.wavwrite(f"{outdir}/13_concat.wav", y, fs)
    print(f"demos written to {outdir}")


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 2.0)
