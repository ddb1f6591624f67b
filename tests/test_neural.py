"""Neural coder-frame model: training converges, sharded step runs
(the framework's training workload; SURVEY.md 3.5 ML-interop purpose)."""
import numpy as np
import jax
import jax.numpy as jnp

from libllsm2_tpu import create_aoptions
from libllsm2_tpu.models import coder, layer0, layer1, neural
from libllsm2_tpu.parallel import mesh as meshlib
from libllsm2_tpu.utils import testsig


def _coder_dataset(n_utts=4):
    opt = create_aoptions()
    cc = coder.CoderConfig(conf=opt.conf)
    vecs = []
    for i in range(n_utts):
        x, f0 = testsig.make_test_utterance(duration=0.3, seed=i,
                                            noise_level=0.05)
        l1 = layer1.chunk_to_layer1(layer0.analyze(opt, x, f0))
        vecs.append(np.asarray(coder.encode(cc, l1)))
    return np.concatenate(vecs, axis=0), cc


def test_training_reduces_loss():
    data, cc = _coder_dataset()
    norm = neural.Normalizer(data)
    data_n = jnp.asarray(norm.fwd(data), jnp.float32)
    cfg = neural.AEConfig(dims=cc.dims, hidden=64, latent=16, depth=1,
                          lr=3e-3)
    params = neural.init_params(cfg, jax.random.PRNGKey(0))
    opt_state = neural.make_optimizer(cfg).init(params)
    losses = []
    for step in range(60):
        params, opt_state, loss = neural.train_step(cfg, params, opt_state,
                                                    data_n)
        losses.append(float(loss))
    assert losses[-1] < 0.3 * losses[0], (losses[0], losses[-1])


def test_sharded_train_step():
    data, cc = _coder_dataset(2)
    n = (len(data) // 8) * 8
    data = jnp.asarray(data[:n], jnp.float32)
    cfg = neural.AEConfig(dims=cc.dims, hidden=32, latent=8, depth=1)
    params = neural.init_params(cfg, jax.random.PRNGKey(1))
    opt_state = neural.make_optimizer(cfg).init(params)
    m = meshlib.make_mesh(8)
    data = meshlib.shard_batch(data, m)
    params2, _, loss = neural.train_step(cfg, params, opt_state, data)
    assert np.isfinite(float(loss))
    # parameters stay replicated (grad all-reduce, not sharded update)
    leaf = jax.tree.leaves(params2)[0]
    assert leaf.sharding.is_fully_replicated


def test_roundtrip_through_model_synthesizes():
    """coder -> normalized AE -> inverse -> decode -> synthesize: the full
    ML loop produces audio."""
    from libllsm2_tpu import create_soptions

    data, cc = _coder_dataset(2)
    norm = neural.Normalizer(data)
    cfg = neural.AEConfig(dims=cc.dims, hidden=64, latent=24, depth=1,
                          lr=3e-3)
    params = neural.init_params(cfg, jax.random.PRNGKey(2))
    opt_state = neural.make_optimizer(cfg).init(params)
    d = jnp.asarray(norm.fwd(data), jnp.float32)
    for _ in range(100):
        params, opt_state, loss = neural.train_step(cfg, params, opt_state, d)
    recon = norm.inv(np.asarray(neural.forward(cfg, params, d)))
    # f0 column must survive the bottleneck reasonably
    f0_in, f0_out = data[:, 0], recon[:, 0]
    voiced = f0_in > 0
    err = np.abs(f0_out[voiced] - f0_in[voiced]) / f0_in[voiced]
    assert np.median(err) < 0.15, np.median(err)
    # decoded chunk synthesizes finite audio
    chunk = coder.decode(cc, jnp.asarray(recon[:40], jnp.float32))
    out = layer0.synthesize(create_soptions(), chunk)
    assert np.all(np.isfinite(np.asarray(out.y)))
