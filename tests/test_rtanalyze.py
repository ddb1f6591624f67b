"""Streaming (block) analysis: runtime.rtanalyze.RTAnalyzer.

The reference has no analysis-side streaming (llsmrt.c streams synthesis
only); the oracle here is the rebuild's own offline analyze -- streamed
frames must EQUAL offline frames (finite-horizon argument in
rtanalyze.py), including phases: the chunk's phase convention (each
frame's phase at its own center) is analysis-shift-invariant, which the
phase oracles below pin across every block seam."""
import dataclasses

import numpy as np
import pytest

from libllsm2_tpu import create_aoptions, create_soptions
from libllsm2_tpu.models import layer0
from libllsm2_tpu.runtime.rtanalyze import RTAnalyzer, concat_frames
from libllsm2_tpu.utils import testsig

OPT = dataclasses.replace(
    create_aoptions(maxnhar=24, npsd=32, nspec=65, f0_floor=90.0,
                    fnyq=6000.0),
    track_denoise=False)   # the denoiser's floor statistics are global


@pytest.fixture(scope="module")
def fixture():
    x, f0 = testsig.make_test_utterance(duration=1.0, noise_level=0.04)
    offline = layer0.analyze(OPT, x, f0)
    return np.asarray(x, np.float32), np.asarray(f0, np.float32), offline


def _stream(x, f0, block, halo, x_pieces=997, f0_pieces=13):
    """Feed in deliberately misaligned pieces."""
    rta = RTAnalyzer(OPT, block_hops=block, halo_hops=halo)
    outs = []
    xi = fi = 0
    while xi < len(x) or fi < len(f0):
        got = rta.feed(x[xi: xi + x_pieces] if xi < len(x) else None,
                       f0[fi: fi + f0_pieces] if fi < len(f0) else None)
        if got is not None:
            outs.append(got)
        xi += x_pieces
        fi += f0_pieces
    tail = rta.flush()
    if tail is not None:
        outs.append(tail)
    return concat_frames(outs)


def _snr(ref, got):
    ref, got = np.asarray(ref, np.float64), np.asarray(got, np.float64)
    err = np.sum((ref - got) ** 2)
    return 10 * np.log10(np.sum(ref ** 2) / max(err, 1e-30))


def test_stream_equals_offline(fixture):
    x, f0, off = fixture
    st = _stream(x, f0, block=32, halo=24)
    assert st.nfrm == off.nfrm

    np.testing.assert_allclose(np.asarray(st.f0), np.asarray(off.f0),
                               atol=1e-3)
    assert _snr(off.ampl, st.ampl) >= 45.0, _snr(off.ampl, st.ampl)

    # amplitude-weighted circular phase error across all block seams
    # (pins the shift-invariance of the per-frame-center phase convention)
    w = np.asarray(off.ampl) * np.asarray(off.hm_mask)
    dph = np.angle(np.exp(1j * (np.asarray(st.phse) - np.asarray(off.phse))))
    err = float(np.sum(w * np.abs(dph)) / np.sum(w))
    assert err < 0.05, err

    assert _snr(off.psd, st.psd) >= 35.0, _snr(off.psd, st.psd)
    assert _snr(off.edc, st.edc) >= 35.0, _snr(off.edc, st.edc)
    assert _snr(off.eenv_a, st.eenv_a) >= 30.0, _snr(off.eenv_a, st.eenv_a)
    we = np.asarray(off.eenv_a)
    dpe = np.angle(np.exp(1j * (np.asarray(st.eenv_p)
                                - np.asarray(off.eenv_p))))
    erre = float(np.sum(we * np.abs(dpe)) / np.sum(we))
    assert erre < 0.1, erre


def test_stream_render_matches_offline(fixture):
    """End-to-end: synthesizing the streamed chunk reproduces the offline
    render (harmonic part; noise shares the seed through equal params)."""
    x, f0, off = fixture
    st = _stream(x, f0, block=32, halo=24)
    sopt = create_soptions()
    y_off = np.asarray(layer0.synthesize(sopt, off).y_sin)
    y_st = np.asarray(layer0.synthesize(sopt, st).y_sin)
    assert _snr(y_off, y_st) >= 40.0, _snr(y_off, y_st)


def test_feed_granularity_invariance(fixture):
    """One big feed and many misaligned tiny feeds produce identical
    frames (same block decomposition)."""
    x, f0, off = fixture
    a = _stream(x, f0, block=32, halo=24, x_pieces=10 ** 9,
                f0_pieces=10 ** 9)
    b = _stream(x, f0, block=32, halo=24, x_pieces=331, f0_pieces=7)
    np.testing.assert_array_equal(np.asarray(a.ampl), np.asarray(b.ampl))
    np.testing.assert_array_equal(np.asarray(a.phse), np.asarray(b.phse))


def test_stream_with_denoiser_smokes(fixture):
    """Default options (denoiser on) stream fine; floors are per-block, so
    only closeness is asserted."""
    x, f0, off_nodenoise = fixture
    opt = dataclasses.replace(OPT, track_denoise=True)
    rta = RTAnalyzer(opt, block_hops=32, halo_hops=24)
    got = rta.feed(x, f0)
    tail = rta.flush()
    st = concat_frames([c for c in (got, tail) if c is not None])
    assert st.nfrm == len(f0)
    a = np.asarray(st.ampl)
    assert np.all(np.isfinite(a))
    assert _snr(off_nodenoise.ampl, a) >= 20.0
