"""Expert-parallel Mixture-of-Experts layer for the neural frame model.

No reference analog (the C library is single-threaded DSP; SURVEY.md §2
"Parallelism & distributed-communication components") — this is the
expert-parallel member of the rebuild's parallelism family (dp / tp /
pp / frame-sp / ep), built the TPU way: tokens are data-sharded over the
same 1-D ("expert",) mesh axis the experts are sharded over, routing is
Switch-style top-1 with capacity, dispatch and return ride
`lax.all_to_all`, and every routing step is a ONE-HOT MATMUL — no
gathers anywhere (XLA TPU gathers measured 25-100x slower than the
matmul/slice equivalents on this stack; CLAUDE.md gotchas).

Model shape: entry dense (dims -> hidden) -> MoE residual block
(hidden -> hidden through one of n_experts expert FFNs, top-1 gated,
overflow tokens pass through the residual identity) -> exit dense
(hidden -> dims).  Training adds the standard Switch load-balancing
auxiliary loss.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.neural import _dense, _dense_init
from .mesh import EXPERT_AXIS


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    dims: int
    hidden: int = 64
    n_experts: int = 8
    capacity_factor: float = 2.0   # per (source shard, expert) slots:
                                   # C = ceil(cf * n_local / n_experts)
    aux_weight: float = 1e-2       # Switch load-balance loss weight
    lr: float = 1e-3
    compute_dtype: Any = jnp.float32


def init_moe_params(cfg: MoEConfig, key) -> Dict:
    keys = jax.random.split(key, cfg.n_experts + 3)
    experts = [_dense_init(keys[i], cfg.hidden, cfg.hidden)
               for i in range(cfg.n_experts)]
    return {
        "entry": _dense_init(keys[-3], cfg.dims, cfg.hidden),
        "gate": jax.random.normal(keys[-2], (cfg.hidden, cfg.n_experts),
                                  jnp.float32) * 0.02,
        "experts": jax.tree.map(lambda *xs: jnp.stack(xs), *experts),
        "exit": _dense_init(keys[-1], cfg.hidden, cfg.dims),
    }


def _route(cfg: MoEConfig, gate_w, h, capacity: int):
    """Top-1 routing with per-(shard, expert) capacity.

    Returns (dispatch [n, E, C] one-hot, gate weight [n], aux-loss terms).
    Position-in-expert comes from a cumsum over the one-hot matrix —
    gather/scatter-free by construction.
    """
    E = cfg.n_experts
    logits = h.astype(jnp.float32) @ gate_w
    probs = jax.nn.softmax(logits, axis=-1)                 # [n, E]
    eidx = jnp.argmax(probs, axis=-1)                       # [n]
    onehot = jax.nn.one_hot(eidx, E, dtype=jnp.float32)     # [n, E]
    gw = jnp.sum(probs * onehot, axis=-1)                   # [n]
    pos = (jnp.sum(jnp.cumsum(onehot, axis=0) * onehot, axis=-1)
           .astype(jnp.int32) - 1)
    keep = (pos >= 0) & (pos < capacity)
    dispatch = (onehot * keep[:, None].astype(jnp.float32))[:, :, None] \
        * jax.nn.one_hot(pos, capacity, dtype=jnp.float32)[:, None, :]
    # Switch aux terms (to be averaged globally by the caller): fraction
    # of tokens per expert x mean gate prob per expert
    frac = jnp.mean(onehot, axis=0)                         # [E]
    mean_prob = jnp.mean(probs, axis=0)                     # [E]
    return dispatch, gw, frac, mean_prob


def _expert_ffn(cfg: MoEConfig, expert_params, x):
    """One expert's FFN on its [.., C, hidden] token slots."""
    return jax.nn.gelu(_dense(expert_params, x, cfg.compute_dtype))


def moe_forward_reference(cfg: MoEConfig, params, x, capacity: int):
    """Single-device dense reference: every expert computed on every
    token slot via the same one-hot dispatch algebra (the EP equality
    oracle; tests/test_cluster.py)."""
    h = jax.nn.gelu(_dense(params["entry"], x, cfg.compute_dtype))
    dispatch, gw, _, _ = _route(cfg, params["gate"], h, capacity)
    slots = jnp.einsum("nec,nh->ech", dispatch, h)          # [E, C, h]
    y = jax.vmap(lambda p, s: _expert_ffn(cfg, p, s))(
        params["experts"], slots)                            # [E, C, h]
    back = jnp.einsum("nec,ech->nh", dispatch, y)
    h = h + back * gw[:, None]
    return _dense(params["exit"], h, cfg.compute_dtype)


def _moe_forward_local(cfg: MoEConfig, params, x, n_dev: int,
                       capacity: int):
    """Runs INSIDE shard_map over the expert axis: x is this shard's
    [n_local, dims] tokens; params["experts"] leaves carry this shard's
    n_experts/n_dev experts; everything else is replicated.

    Returns (y_local, aux_loss) — aux is already the global mean.
    """
    E, k = cfg.n_experts, cfg.n_experts // n_dev
    h = jax.nn.gelu(_dense(params["entry"], x, cfg.compute_dtype))
    dispatch, gw, frac, mean_prob = _route(cfg, params["gate"], h,
                                           capacity)
    slots = jnp.einsum("nec,nh->ech", dispatch, h)          # [E, C, h]
    # all_to_all: each device keeps its k experts' slots from EVERY
    # source shard: [E, C, h] -> [n_dev * k, C, h] where the leading
    # axis is (source shard, local expert)
    recv = jax.lax.all_to_all(slots, EXPERT_AXIS, split_axis=0,
                              concat_axis=0, tiled=True)
    recv = recv.reshape(n_dev, k, capacity, -1).swapaxes(0, 1)
    y = jax.vmap(lambda p, s: _expert_ffn(cfg, p, s))(
        params["experts"], recv)                             # [k,n_dev,C,h]
    y = y.swapaxes(0, 1).reshape(E, capacity, -1)
    back = jax.lax.all_to_all(y, EXPERT_AXIS, split_axis=0,
                              concat_axis=0, tiled=True)     # [E, C, h]
    h = h + jnp.einsum("nec,ech->nh", dispatch, back) * gw[:, None]
    out = _dense(params["exit"], h, cfg.compute_dtype)
    aux = E * jnp.sum(jax.lax.pmean(frac, EXPERT_AXIS)
                      * jax.lax.pmean(mean_prob, EXPERT_AXIS))
    return out, aux


def ep_param_shardings(cfg: MoEConfig, mesh):
    """NamedShardings on a ("expert",) mesh: experts split on their
    stacked leading axis, everything else replicated."""
    exp = NamedSharding(mesh, P(EXPERT_AXIS))
    repl = NamedSharding(mesh, P())
    return {
        "entry": {"w": repl, "b": repl},
        "gate": repl,
        "experts": {"w": exp, "b": exp},
        "exit": {"w": repl, "b": repl},
    }


def shard_params_ep(cfg: MoEConfig, params, mesh):
    """Place MoE params on the expert mesh (before optimizer.init, so
    optax state inherits the shardings)."""
    return jax.tree.map(jax.device_put, params,
                        ep_param_shardings(cfg, mesh))


def _capacity(cfg: MoEConfig, n_local: int) -> int:
    return max(1, int(-(-cfg.capacity_factor * n_local // cfg.n_experts)))


def moe_forward_ep(cfg: MoEConfig, params, x, mesh, capacity=None):
    """Expert-parallel forward over the ("expert",) mesh; tokens [B, dims]
    sharded over the same axis.  Returns (y [B, dims], aux scalar)."""
    n_dev = mesh.shape[EXPERT_AXIS]
    assert cfg.n_experts % n_dev == 0
    if capacity is None:
        capacity = _capacity(cfg, x.shape[0] // n_dev)
    fn = jax.shard_map(
        functools.partial(_moe_forward_local, cfg, n_dev=n_dev,
                          capacity=capacity),
        mesh=mesh,
        in_specs=({"entry": P(), "gate": P(),
                   "experts": P(EXPERT_AXIS), "exit": P()},
                  P(EXPERT_AXIS)),
        out_specs=(P(EXPERT_AXIS), P()),
    )
    return fn(params, x)


def make_optimizer(cfg: MoEConfig):
    return optax.adamw(cfg.lr, weight_decay=1e-5)


@functools.partial(jax.jit, static_argnums=(0, 4))
def _train_step_impl(cfg, params, opt_state, batch, mesh):
    def loss_fn(p):
        pred, aux = moe_forward_ep(cfg, p, batch, mesh)
        return jnp.mean((pred - batch) ** 2) + cfg.aux_weight * aux

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = make_optimizer(cfg).update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def train_step_ep(cfg: MoEConfig, params, opt_state, batch, mesh):
    """One jitted expert-parallel training step (reconstruction MSE +
    Switch aux loss).  `params` placed with shard_params_ep; `batch`
    [B, dims] sharded over the expert axis."""
    return _train_step_impl(cfg, params, opt_state, batch, mesh)
