"""Edge-case robustness: silence, all-unvoiced, F0 at the floor/ceiling,
very short utterances -- the masked-lane NaN traps called out in
SURVEY.md section 7 "Hard parts"."""
import numpy as np
import jax.numpy as jnp
import pytest

from libllsm2_tpu import create_aoptions, create_soptions
from libllsm2_tpu.models import coder, layer0, layer1, pbp
from libllsm2_tpu.utils import testsig


def _pipeline(x, f0):
    opt = create_aoptions()
    chunk = layer0.analyze(opt, x, f0)
    out = layer0.synthesize(create_soptions(), chunk)
    return chunk, np.asarray(out.y)


def test_silence_input():
    nfrm = 60
    x = np.zeros(nfrm * 80)
    chunk, y = _pipeline(x, np.zeros(nfrm))
    assert np.all(np.isfinite(y))
    assert np.abs(y).max() < 1e-3


def test_all_unvoiced_noise():
    rng = np.random.default_rng(0)
    nfrm = 60
    x = rng.standard_normal(nfrm * 80) * 0.1
    chunk, y = _pipeline(x, np.zeros(nfrm))
    assert np.all(np.isfinite(y))
    assert 0.3 < np.std(y) / np.std(x) < 3.0


def test_f0_at_floor_and_ceiling():
    for f0v in (42.0, 590.0):
        nfrm = 80
        f0 = np.full(nfrm, f0v)
        x, _ = testsig.synth_harmonic(f0, nharmonics=20)
        chunk, y = _pipeline(x, f0)
        assert np.all(np.isfinite(y)), f0v
        assert np.std(y) > 0.05 * np.std(x), f0v


def test_very_short_utterance():
    x, f0 = testsig.make_test_utterance(duration=0.05)  # 10 frames
    chunk, y = _pipeline(x, f0)
    assert np.all(np.isfinite(y))


def test_voicing_boundary_transitions():
    """Alternating voiced/unvoiced runs must not blow up phases/masks."""
    nfrm = 90
    f0 = np.full(nfrm, 150.0)
    f0[20:30] = 0.0
    f0[60:75] = 0.0
    x, _ = testsig.synth_harmonic(f0, noise_level=0.1)
    chunk, y = _pipeline(x, f0)
    assert np.all(np.isfinite(y))
    m = np.asarray(chunk.hm_mask)
    assert m[25].sum() == 0 and m[40].sum() > 0


def test_layer1_and_pbp_on_sparse_voicing():
    nfrm = 80
    f0 = np.full(nfrm, 160.0)
    f0[:10] = 0.0
    f0[-10:] = 0.0
    x, _ = testsig.synth_harmonic(f0, noise_level=0.05)
    opt = create_aoptions()
    l1 = layer1.chunk_to_layer1(layer0.analyze(opt, x, f0))
    out = pbp.pbp_synthesize(create_soptions(), l1)
    assert np.all(np.isfinite(np.asarray(out.y)))
    cc = coder.CoderConfig(conf=l1.conf)
    back = coder.decode(cc, coder.encode(cc, l1))
    out2 = layer0.synthesize(create_soptions(), back)
    assert np.all(np.isfinite(np.asarray(out2.y)))


def test_48khz_pipeline():
    """Non-16k sample rates: conf carries fs; whole pipeline must work."""
    from libllsm2_tpu import ChunkConf, create_soptions
    import dataclasses
    fs, thop = 48000.0, 0.005
    nfrm = 80
    f0 = np.full(nfrm, 220.0)
    x, _ = testsig.synth_harmonic(f0, fs=fs, thop=thop, nharmonics=40)
    conf = ChunkConf(fs=fs, fnyq=12000.0, chanfreq=(3000.0, 6000.0, 9000.0),
                     nspec=513)
    opt = dataclasses.replace(create_aoptions(), conf=conf)
    chunk = layer0.analyze(opt, x, f0)
    out = layer0.synthesize(create_soptions(fs=fs), chunk)
    y = np.asarray(out.y_sin)
    assert np.all(np.isfinite(y))
    lo, hi = int(0.1 * len(x)), int(0.9 * len(x))
    e = x[lo:hi] - y[lo:hi]
    snr = 10 * np.log10(np.sum(x[lo:hi] ** 2) / max(np.sum(e ** 2), 1e-20))
    assert snr > 35.0, snr


def test_long_utterance_30s():
    """Memory/shape sanity for long inputs (frame axis ~6000)."""
    x, f0 = testsig.make_test_utterance(duration=30.0)
    chunk, y = _pipeline(x, f0)
    assert np.all(np.isfinite(y))
    assert len(y) == len(x)
    # phase stays coherent to the end: SNR on the last 2 seconds
    lo = len(x) - 32000
    e = x[lo:-800] - y[lo:-800]
    snr = 10 * np.log10(np.sum(x[lo:-800] ** 2) / max(np.sum(e ** 2), 1e-20))
    assert snr > 30.0, snr


@pytest.mark.parametrize("kw", [
    dict(nchannel=2, chanfreq=(3000.0,)),
    dict(nchannel=6, chanfreq=(1000.0, 2000.0, 3000.0, 4500.0, 6000.0)),
    dict(maxnhar=24, fnyq=4000.0),
    dict(npsd=32, nspec=129),
    dict(maxnhar_e=2),
    dict(thop=0.01),
    dict(rel_winsize=3.0, f0_floor=60.0),
])
def test_conf_sweep(kw):
    """Arbitrary conf combinations must compile and round-trip finitely."""
    import dataclasses
    from libllsm2_tpu import ChunkConf, create_soptions
    conf = ChunkConf(**kw)
    conf.validate()
    opt = dataclasses.replace(create_aoptions(), conf=conf)
    nhop = conf.nhop
    nfrm = int(0.4 / conf.thop)
    f0 = np.full(nfrm, 150.0)
    x, _ = testsig.synth_harmonic(f0, thop=conf.thop, noise_level=0.05)
    chunk = layer0.analyze(opt, x, f0)
    out = layer0.synthesize(create_soptions(), chunk)
    y = np.asarray(out.y)
    assert np.all(np.isfinite(y))
    assert np.std(y) > 0.05 * np.std(x)
