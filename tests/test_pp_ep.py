"""Pipeline-parallel and expert-parallel training (parallel.pipeline /
parallel.expert): forward equality vs a single-device reference, loss
trajectories matching the unsharded run, and the collective layout
actually materializing (blocks/experts sharded over their mesh axis).
No reference analog (SURVEY.md §2 parallelism table)."""
import numpy as np
import jax
import jax.numpy as jnp

from libllsm2_tpu.parallel import expert, mesh as meshlib, pipeline


def _toy_batch(n, dims, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((n, dims)), jnp.float32)


# ---------------------------------------------------------------- pipeline

def test_pipeline_forward_matches_reference():
    cfg = pipeline.TrunkConfig(dims=20, hidden=32, n_blocks=8, n_micro=4)
    params = pipeline.init_trunk_params(cfg, jax.random.PRNGKey(0))
    x = _toy_batch(16, cfg.dims)
    ref = np.asarray(pipeline.forward_reference(cfg, params, x))

    for n_stages in (2, 4, 8):
        mesh = meshlib.make_pipe_mesh(n_stages)
        got = np.asarray(pipeline.pp_forward(
            cfg, pipeline.shard_params_pp(params, mesh), x, mesh))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_pipeline_train_matches_unsharded():
    """5-step pp-train loss trajectory == a plain single-device Adam run
    on the same trunk (grad flows back through the ppermute pipeline)."""
    cfg = pipeline.TrunkConfig(dims=12, hidden=16, n_blocks=4, n_micro=4,
                               lr=3e-3)
    params0 = pipeline.init_trunk_params(cfg, jax.random.PRNGKey(1))
    x = _toy_batch(32, cfg.dims, seed=1)

    # reference: same model, no pipeline
    import optax
    opt = pipeline.make_optimizer(cfg)

    @jax.jit
    def ref_step(params, opt_state):
        def loss_fn(p):
            return jnp.mean((pipeline.forward_reference(cfg, p, x) - x) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    p_r, s_r = params0, opt.init(params0)
    ref = []
    for _ in range(5):
        p_r, s_r, loss = ref_step(p_r, s_r)
        ref.append(float(loss))

    mesh = meshlib.make_pipe_mesh(4)
    p_p = pipeline.shard_params_pp(params0, mesh)
    s_p = pipeline.make_optimizer(cfg).init(p_p)
    got = []
    for _ in range(5):
        p_p, s_p, loss = pipeline.train_step_pp(cfg, p_p, s_p, x, mesh)
        got.append(float(loss))
    np.testing.assert_allclose(got, ref, rtol=1e-4)
    assert not p_p["blocks"]["w"].sharding.is_fully_replicated


# ------------------------------------------------------------------ expert

def test_moe_ep_forward_matches_dense_reference():
    """With capacity large enough that nothing drops, the all_to_all
    expert-parallel forward equals the dense single-device evaluation of
    the same top-1 routing."""
    cfg = expert.MoEConfig(dims=20, hidden=32, n_experts=8)
    params = expert.init_moe_params(cfg, jax.random.PRNGKey(2))
    x = _toy_batch(64, cfg.dims, seed=2)

    ref = np.asarray(expert.moe_forward_reference(cfg, params, x,
                                                  capacity=64))
    for n_dev in (2, 4, 8):
        mesh = meshlib.make_expert_mesh(n_dev)
        ps = expert.shard_params_ep(cfg, params, mesh)
        xs = jax.device_put(
            x, jax.NamedSharding(mesh,
                                 jax.sharding.PartitionSpec("expert")))
        got, aux = expert.moe_forward_ep(cfg, ps, xs, mesh,
                                         capacity=64 // n_dev)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5,
                                   atol=2e-5)
        assert np.isfinite(float(aux)) and float(aux) > 0.5


def test_moe_capacity_overflow_passes_residual():
    """Tokens beyond an expert's capacity must fall through the residual
    identity (their MoE contribution is exactly zero), not corrupt the
    output."""
    cfg = expert.MoEConfig(dims=8, hidden=16, n_experts=2)
    params = expert.init_moe_params(cfg, jax.random.PRNGKey(3))
    x = _toy_batch(32, cfg.dims, seed=3)
    full = np.asarray(expert.moe_forward_reference(cfg, params, x,
                                                   capacity=32))
    tight = np.asarray(expert.moe_forward_reference(cfg, params, x,
                                                    capacity=1))
    # at capacity 1, exactly one token per expert keeps its slot; the
    # dropped rest must equal the pure-residual path, the kept ones the
    # full render
    h = jax.nn.gelu(expert._dense(params["entry"], x, cfg.compute_dtype))
    resid = np.asarray(expert._dense(params["exit"], h, cfg.compute_dtype))
    disp, _, _, _ = expert._route(cfg, params["gate"], h, 1)
    kept = np.asarray(jnp.sum(disp, axis=(1, 2))) > 0.5
    assert kept.sum() == cfg.n_experts
    np.testing.assert_allclose(tight[~kept], resid[~kept], rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(tight[kept], full[kept], rtol=1e-5,
                               atol=1e-6)


def test_moe_ep_training_reduces_loss():
    cfg = expert.MoEConfig(dims=16, hidden=32, n_experts=8, lr=3e-3)
    params = expert.init_moe_params(cfg, jax.random.PRNGKey(4))
    mesh = meshlib.make_expert_mesh(8)
    ps = expert.shard_params_ep(cfg, params, mesh)
    ss = expert.make_optimizer(cfg).init(ps)
    x = jax.device_put(
        _toy_batch(128, cfg.dims, seed=4),
        jax.NamedSharding(mesh, jax.sharding.PartitionSpec("expert")))
    losses = []
    for _ in range(40):
        ps, ss, loss = expert.train_step_ep(cfg, ps, ss, x, mesh)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    assert not ps["experts"]["w"].sharding.is_fully_replicated
