"""Chunk pytree invariants (reference test analog: test-structs.c --
container/frame create-copy invariants, SURVEY.md section 4)."""
import jax
import jax.numpy as jnp
import numpy as np

from libllsm2_tpu import ChunkConf, create_chunk, cumulative_cycles
from libllsm2_tpu.container import phase_propagate, phase_sync


def test_create_chunk_shapes():
    conf = ChunkConf()
    ch = create_chunk(conf, 100)
    assert ch.f0.shape == (100,)
    assert ch.ampl.shape == (100, conf.maxnhar)
    assert ch.psd.shape == (100, conf.npsd)
    assert ch.eenv_a.shape == (100, conf.nchannel, conf.maxnhar_e)
    assert not ch.has_layer1


def test_chunk_is_pytree():
    conf = ChunkConf()
    ch = create_chunk(conf, 10)
    leaves = jax.tree.leaves(ch)
    assert len(leaves) == 8  # layer-1 fields are None
    ch2 = jax.tree.map(lambda a: a + 1.0, ch)
    assert float(ch2.f0[0]) == 1.0
    assert ch2.conf == conf  # static aux preserved


def test_cumulative_cycles_matches_float64():
    rng = np.random.default_rng(0)
    f0 = rng.uniform(80, 300, size=2000)
    thop = 0.005
    # trapezoidal, matching ops.harmonics.sample_cycles integration
    ref = np.concatenate([[0.0], np.cumsum(0.5 * (f0[:-1] + f0[1:]) * thop)])
    ref = ref % 1.0
    got = np.asarray(cumulative_cycles(jnp.array(f0, jnp.float32), thop))
    err = np.abs((got - ref + 0.5) % 1.0 - 0.5)
    assert err.max() < 1e-3, err.max()  # < 0.006 rad at the fundamental


def test_phase_propagate_roundtrip():
    conf = ChunkConf()
    ch = create_chunk(conf, 50)
    rng = np.random.default_rng(1)
    f0 = jnp.array(rng.uniform(100, 200, 50), jnp.float32)
    phse = jnp.array(rng.uniform(-3, 3, (50, conf.maxnhar)), jnp.float32)
    mask = jnp.ones((50, conf.maxnhar), jnp.float32)
    ch = ch.replace(f0=f0, phse=phse, hm_mask=mask)
    back = phase_propagate(phase_propagate(ch, +1), -1)
    err = np.abs(np.angle(np.exp(1j * np.asarray(back.phse - ch.phse))))
    assert err.max() < 1e-2, err.max()


def test_phase_sync_zeroes_fundamental():
    conf = ChunkConf()
    ch = create_chunk(conf, 5)
    rng = np.random.default_rng(2)
    phse = jnp.array(rng.uniform(-3, 3, (5, conf.maxnhar)), jnp.float32)
    ch = ch.replace(phse=phse, hm_mask=jnp.ones_like(phse),
                    f0=jnp.full(5, 150.0))
    out = phase_sync(ch)
    np.testing.assert_allclose(np.asarray(out.phse[:, 0]), 0.0, atol=1e-5)


def test_phase_shift_advances_by_time():
    conf = ChunkConf()
    ch = create_chunk(conf, 4)
    f0 = jnp.full(4, 100.0)
    ch = ch.replace(f0=f0, hm_mask=jnp.ones((4, conf.maxnhar)))
    dt = 0.0025  # quarter period at 100 Hz
    from libllsm2_tpu.container import phase_shift
    out = phase_shift(ch, dt)
    # fundamental advances by 2*pi*100*0.0025 = pi/2
    np.testing.assert_allclose(np.asarray(out.phse[:, 0]), np.pi / 2,
                               atol=1e-5)
    # harmonic 2 (slot 1) advances by pi
    np.testing.assert_allclose(np.abs(np.asarray(out.phse[:, 1])), np.pi,
                               atol=1e-5)


def test_extras_attach_detach_and_jit():
    conf = ChunkConf()
    ch = create_chunk(conf, 8)
    ch = ch.attach("marks", jnp.arange(8.0))
    assert float(ch.get("marks")[3]) == 3.0
    # extras travel through pytree transforms
    ch2 = jax.tree.map(lambda a: a * 2, ch)
    assert float(ch2.get("marks")[3]) == 6.0
    ch3 = ch.detach("marks")
    assert ch3.get("marks") is None
    assert ch.get("missing", 42) == 42
