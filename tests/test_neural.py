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


def test_tensor_parallel_train_step_matches_dp():
    """Megatron-style tp sharding (hidden dim over the model axis,
    neural.tp_param_specs) on a (batch=4, model=2) mesh: the training
    step runs with sharded parameters and its loss trajectory matches
    the unsharded step (same data, same init) to float tolerance."""
    data, cc = _coder_dataset(2)
    n = (len(data) // 8) * 8
    data = jnp.asarray(data[:n], jnp.float32)
    cfg = neural.AEConfig(dims=cc.dims, hidden=32, latent=8, depth=1)
    params0 = neural.init_params(cfg, jax.random.PRNGKey(3))

    # reference: unsharded
    params_r = params0
    opt_r = neural.make_optimizer(cfg).init(params_r)
    ref = []
    for _ in range(5):
        params_r, opt_r, loss = neural.train_step(cfg, params_r, opt_r,
                                                  data)
        ref.append(float(loss))

    m = meshlib.make_tp_mesh(8, model_parallel=2)
    params_t = neural.shard_params_tp(cfg, params0, m)
    opt_t = neural.make_optimizer(cfg).init(params_t)
    data_s = meshlib.shard_batch(data, m)
    got = []
    for _ in range(5):
        params_t, opt_t, loss = neural.train_step(cfg, params_t, opt_t,
                                                  data_s)
        got.append(float(loss))
    np.testing.assert_allclose(got, ref, rtol=2e-2)
    # weights actually live sharded on the model axis
    w = params_t["enc_in"]["w"]
    assert not w.sharding.is_fully_replicated
    assert np.all(np.isfinite(np.asarray(w)))


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
