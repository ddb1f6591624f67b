"""Multi-stream serving pool (runtime.rtserve.StreamPool).

No reference analog (llsmrt.c streams ONE voice); the oracle is the
rebuild's own solo streaming path: every pool stream must produce
BIT-IDENTICAL output to a solo RTSynthesizer fed the same frames with the
same derived noise seed -- the pool batches the very same compiled
_render_frames/_render_pulses programs, just with a [n_streams*block]
leading axis."""
import dataclasses

import numpy as np
import pytest

from libllsm2_tpu import create_aoptions, create_soptions
from libllsm2_tpu.models import layer0, layer1
from libllsm2_tpu.runtime import rtsynth
from libllsm2_tpu.runtime.rtserve import StreamPool
from libllsm2_tpu.utils import testsig

OPT = dataclasses.replace(
    create_aoptions(maxnhar=24, npsd=32, nspec=65, f0_floor=90.0,
                    fnyq=6000.0),
    track_denoise=False)
SOPT = create_soptions()


@pytest.fixture(scope="module")
def voices():
    """Three different voices with different lengths."""
    chunks = []
    for dur, f0b in ((0.8, 120.0), (0.6, 200.0), (1.0, 160.0)):
        f0 = testsig.make_f0_track(int(dur / OPT.conf.thop), OPT.conf.thop,
                                   f0_base=f0b)
        x, _ = testsig.synth_lf_speech(f0, noise_level=0.02)
        chunks.append(layer0.analyze(OPT, np.asarray(x), f0))
    return chunks


def _solo(chunk, seed_offset, **kw):
    sopt = dataclasses.replace(SOPT, noise_seed=SOPT.noise_seed
                               + seed_offset)
    return rtsynth.stream_chunk(sopt, chunk, block=16, **kw)


def _drain_pool(pool, chunks, feed_piece=7):
    """Feed chunks to the pool in small pieces, servicing as we go;
    returns per-stream collected audio."""
    outs = [[] for _ in chunks]
    pos = [0] * len(chunks)
    while True:
        fed_any = False
        for s, c in enumerate(chunks):
            if pos[s] < c.nfrm:
                end = min(pos[s] + feed_piece, c.nfrm)
                pool.feed(s, [c.frame(i) for i in range(pos[s], end)])
                pos[s] = end
                fed_any = True
        while pool.service():
            pass
        for s in range(len(chunks)):
            got = pool.fetch(s, pool.readable(s))
            if len(got):
                outs[s].append(got)
        if not fed_any:
            break
    for s in range(len(chunks)):
        pool.end_stream(s)
        got = pool.fetch(s, pool.readable(s))
        if len(got):
            outs[s].append(got)
    return [np.concatenate(o) for o in outs]


def test_pool_matches_solo_bitexact(voices):
    pool = StreamPool(SOPT, OPT.conf, n_streams=3, feed_block=16)
    got = _drain_pool(pool, voices)
    for s, c in enumerate(voices):
        ref = _solo(c, s)
        assert got[s].shape == ref.shape
        np.testing.assert_array_equal(got[s], ref)


def test_pool_one_dispatch_per_tick(voices):
    """All due streams ride ONE device dispatch per service tick."""
    pool = StreamPool(SOPT, OPT.conf, n_streams=3, feed_block=8)
    for s, c in enumerate(voices):
        pool.feed(s, c)
    n = pool.service()
    assert n == 3
    assert pool.dispatches == 1
    while pool.service():
        pass
    # every tick rendered 8 hops for every due stream: dispatch count is
    # bounded by the LONGEST stream's tick count, not the sum of streams
    longest = max(c.nfrm for c in voices)
    assert pool.dispatches <= -(-longest // 8) + 1


def test_pool_pbp_mode_matches_solo(voices):
    c0 = layer1.chunk_to_layer1(voices[0])
    c1 = layer1.chunk_to_layer1(voices[1])
    pool = StreamPool(SOPT, OPT.conf, n_streams=2, feed_block=16,
                      synth_mode="pbp")
    got = _drain_pool(pool, [c0, c1])
    for s, c in enumerate((c0, c1)):
        ref = _solo(c, s, synth_mode="pbp")
        assert got[s].shape == ref.shape
        np.testing.assert_allclose(got[s], ref, atol=1e-5)
        assert float(np.std(got[s])) > 1e-3   # pulses actually rendered


def test_stream_recycling(voices):
    """end_stream + reset_stream reuses the slot (and its compiled
    programs) for a new voice with unchanged output."""
    pool = StreamPool(SOPT, OPT.conf, n_streams=2, feed_block=16)
    got = _drain_pool(pool, [voices[0], voices[1]])
    np.testing.assert_array_equal(got[0], _solo(voices[0], 0))
    pool.reset_stream(0)
    pool.reset_stream(1)
    got2 = _drain_pool(pool, [voices[2], voices[0]])
    np.testing.assert_array_equal(got2[0], _solo(voices[2], 0))
    np.testing.assert_array_equal(got2[1], _solo(voices[0], 1))


def test_pool_sharded_over_mesh_matches_solo(voices):
    """Multi-chip serving: the batched render row-sharded over an
    8-device mesh produces the same audio as the unsharded pool (and the
    solo path).  Pure data parallelism -- no collectives; each device
    renders its streams' rows."""
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]), ("serve",))
    pool = StreamPool(SOPT, OPT.conf, n_streams=8, feed_block=8,
                      mesh=mesh)
    got = _drain_pool(pool, voices + voices[:1])  # 4 active, 4 idle
    for s in range(3):
        np.testing.assert_array_equal(got[s], _solo(voices[s], s))
    np.testing.assert_array_equal(got[3], _solo(voices[0], 3))
    with pytest.raises(AssertionError):
        StreamPool(SOPT, OPT.conf, n_streams=6, mesh=mesh)


def test_pool_sharded_pbp_matches_solo(voices):
    """PbP pulses also render correctly under the mesh (the pooled pulse
    budget rounds up to a device multiple)."""
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:4]), ("serve",))
    c0 = layer1.chunk_to_layer1(voices[0])
    pool = StreamPool(SOPT, OPT.conf, n_streams=4, feed_block=16,
                      synth_mode="pbp", mesh=mesh)
    got = _drain_pool(pool, [c0])
    ref = _solo(c0, 0, synth_mode="pbp")
    np.testing.assert_allclose(got[0], ref, atol=1e-5)
    assert float(np.std(got[0])) > 1e-3


def test_idle_streams_cost_nothing(voices):
    """A pool wider than its load still renders correct audio for the
    active streams (idle rows are zero-masked)."""
    pool = StreamPool(SOPT, OPT.conf, n_streams=8, feed_block=16)
    got = _drain_pool(pool, voices[:1])
    np.testing.assert_array_equal(got[0], _solo(voices[0], 0))
    for s in range(1, 8):
        assert pool.readable(s) == 0


def test_long_stream_soak(voices):
    """Serving soak: one pool slot streams ~60 s of looped voice (12k
    frames, many ring wraparounds at capacity 256 frames, cycle
    accumulator carried across ~9k voiced hops).  The render must stay
    finite, non-degenerate, and OLA-coherent at the END of the stream
    (cumulative phase/cycle drift or a ring-index bug would surface as
    cancellation or wrap corruption by then)."""
    frames = rtsynth.RTSynthesizer.chunk_frames_np(voices[0])
    pool = StreamPool(SOPT, OPT.conf, n_streams=2, feed_block=16,
                      capacity_frames=256)
    total = 12000
    fed = 0
    got = []
    pos = 0
    while fed < total:
        take = min(64, total - fed, len(frames) - pos)
        pool.feed(0, frames[pos:pos + take])
        fed += take
        pos = (pos + take) % len(frames)
        while pool.service():
            pass
        got.append(pool.fetch(0, pool.readable(0)))
    pool.end_stream(0)
    got.append(pool.fetch(0, pool.readable(0)))
    y = np.concatenate(got)
    nhop = OPT.conf.nhop
    assert len(y) >= (total - 2) * nhop
    assert np.all(np.isfinite(y))
    # energy stationarity: the looped voice's level must not decay or
    # blow up across the stream (OLA incoherence shows as decay)
    e0 = float(np.mean(y[10 * nhop:500 * nhop] ** 2))
    e1 = float(np.mean(y[-500 * nhop:-10 * nhop] ** 2))
    assert 0.5 < e1 / e0 < 2.0, (e0, e1)
    # tail coherence: per-10-hop-segment periodicity at the LOCAL f0 of
    # the looped voice (the track glides, and the loop splices end to
    # start, so one global lag is not a valid oracle); skip segments
    # adjacent to a splice
    f0s = np.asarray(voices[0].f0)
    L = len(f0s)
    ps = []
    for start in range(total - 420, total - 20, 10):
        idx = np.arange(start, start + 10) % L
        if idx[0] > idx[-1]:                   # spans the loop splice
            continue
        f_loc = f0s[idx]
        if np.any(f_loc <= 0):
            continue
        seg = y[start * nhop:(start + 10) * nhop]
        lag = int(round(16000.0 / float(np.median(f_loc))))
        a, b = seg[:-lag], seg[lag:]
        ps.append(float(np.dot(a, b) / np.sqrt(
            np.dot(a, a) * np.dot(b, b) + 1e-20)))
    assert len(ps) > 10
    assert np.mean(ps) > 0.8, (np.mean(ps), ps[:8])
