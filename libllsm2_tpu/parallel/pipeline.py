"""Pipeline-parallel training of the neural frame model's residual trunk.

The reference has no parallelism at all (single-threaded C; SURVEY.md §2
"Parallelism & distributed-communication components"), so this is a new
first-class component of the rebuild, built the TPU way: a GPipe-style
schedule written as a `lax.scan` over pipeline ticks inside a
`jax.shard_map` over a 1-D ("pipe",) mesh.  Each device holds one
contiguous stage of the trunk (the stacked residual blocks are sharded on
their leading axis); activations hop to the next stage with
`lax.ppermute` over ICI.  The backward pass needs no hand-written
schedule: `jax.grad` transposes the scan+ppermute into the reverse
pipeline automatically (ppermute's transpose is the inverted
permutation), which is the idiomatic-JAX analog of GPipe's 1F1B-ish
reverse sweep.

Model shape: entry dense (dims -> hidden, replicated; computed
identically on every stage) -> n_blocks identical residual blocks
(hidden -> hidden, the pipelined trunk) -> exit dense (hidden -> dims,
replicated).  The uniform trunk is what makes the single-`scan` schedule
possible; the tiny boundary layers are replicated rather than pipelined
(their cost is negligible and redundant compute beats a pipeline bubble).
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
from .mesh import PIPE_AXIS


@dataclasses.dataclass(frozen=True)
class TrunkConfig:
    dims: int                 # coder vector size (in == out)
    hidden: int = 128
    n_blocks: int = 8         # residual trunk length; n_stages must divide it
    n_micro: int = 4          # microbatches per step; batch must divide
    lr: float = 1e-3
    compute_dtype: Any = jnp.float32


def init_trunk_params(cfg: TrunkConfig, key) -> Dict:
    keys = jax.random.split(key, cfg.n_blocks + 2)
    blocks = [_dense_init(keys[i], cfg.hidden, cfg.hidden)
              for i in range(cfg.n_blocks)]
    return {
        "entry": _dense_init(keys[-2], cfg.dims, cfg.hidden),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "exit": _dense_init(keys[-1], cfg.hidden, cfg.dims),
    }


def _apply_blocks(cfg: TrunkConfig, blocks, h):
    """Sequentially apply a stack of residual blocks (leading axis)."""
    def body(hc, blk):
        return hc + jax.nn.gelu(_dense(blk, hc, cfg.compute_dtype)), None
    h, _ = jax.lax.scan(body, h, blocks)
    return h


def forward_reference(cfg: TrunkConfig, params, x):
    """Single-device reference forward (the pipeline equality oracle)."""
    h = jax.nn.gelu(_dense(params["entry"], x, cfg.compute_dtype))
    h = _apply_blocks(cfg, params["blocks"], h)
    return _dense(params["exit"], h, cfg.compute_dtype)


def _pipe_forward_local(cfg: TrunkConfig, params, x, n_stages: int):
    """Runs INSIDE shard_map over the pipe axis.

    `params["blocks"]` leaves carry this stage's n_blocks/n_stages
    residual blocks; `x` is the replicated [B, dims] batch.  The GPipe
    schedule is one lax.scan over M + S - 1 ticks: stage 0 injects
    microbatch t, every stage applies its blocks to whatever arrived,
    and ppermute ships the result one stage down.  The last stage's
    outputs (valid from tick S-1 on) are psum-broadcast so the exit
    layer + loss run replicated.
    """
    s = jax.lax.axis_index(PIPE_AXIS)
    M = cfg.n_micro
    B = x.shape[0]
    assert B % M == 0, f"batch {B} not divisible by n_micro {M}"
    xm = x.reshape(M, B // M, -1)

    h = jax.nn.gelu(_dense(params["entry"], xm, cfg.compute_dtype))
    stream = jnp.pad(h, ((0, n_stages - 1), (0, 0), (0, 0)))
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    def tick(recv, xt):
        inp = jnp.where(s == 0, xt, recv)
        out = _apply_blocks(cfg, params["blocks"], inp)
        nxt = jax.lax.ppermute(out, PIPE_AXIS, perm)
        return nxt, out

    # the carry must be marked device-varying over the pipe axis up
    # front (shard_map's vma tracking): ppermute's output varies even
    # though the zeros initial value does not
    init = jax.lax.pcast(jnp.zeros_like(h[0]), (PIPE_AXIS,), to="varying")
    _, outs = jax.lax.scan(tick, init, stream)
    res = outs[n_stages - 1:]                      # [M, B//M, hidden]
    res = jnp.where(s == n_stages - 1, res, 0.0)
    res = jax.lax.psum(res, PIPE_AXIS)
    y = _dense(params["exit"], res, cfg.compute_dtype)
    return y.reshape(B, -1)


def pp_param_shardings(mesh):
    """NamedShardings for init_trunk_params' pytree on a ("pipe",) mesh:
    the trunk's stacked leading axis splits into stages; boundary layers
    replicate."""
    staged = NamedSharding(mesh, P(PIPE_AXIS))
    repl = NamedSharding(mesh, P())
    return {
        "entry": {"w": repl, "b": repl},
        "blocks": {"w": staged, "b": staged},
        "exit": {"w": repl, "b": repl},
    }


def shard_params_pp(params, mesh):
    """Place the trunk params on the pipe mesh.  Shard BEFORE
    optimizer.init so optax state leaves inherit the shardings."""
    return jax.tree.map(jax.device_put, params, pp_param_shardings(mesh))


def pp_forward(cfg: TrunkConfig, params, x, mesh):
    """Pipelined forward over the ("pipe",) mesh; equals
    forward_reference to float tolerance (tests/test_cluster.py)."""
    n_stages = mesh.shape[PIPE_AXIS]
    assert cfg.n_blocks % n_stages == 0
    fn = jax.shard_map(
        functools.partial(_pipe_forward_local, cfg, n_stages=n_stages),
        mesh=mesh,
        in_specs=({"entry": P(), "blocks": P(PIPE_AXIS), "exit": P()},
                  P()),
        out_specs=P(),
    )
    return fn(params, x)


def make_optimizer(cfg: TrunkConfig):
    return optax.adamw(cfg.lr, weight_decay=1e-5)


@functools.partial(jax.jit, static_argnums=(0, 4))
def _train_step_impl(cfg, params, opt_state, batch, mesh):
    def loss_fn(p):
        pred = pp_forward(cfg, p, batch, mesh)
        return jnp.mean((pred - batch) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = make_optimizer(cfg).update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def train_step_pp(cfg: TrunkConfig, params, opt_state, batch, mesh):
    """One jitted pipeline-parallel training step (reconstruction MSE,
    mirroring neural.train_step).  `params` should be placed with
    shard_params_pp; `batch` is replicated [B, dims]."""
    return _train_step_impl(cfg, params, opt_state, batch, mesh)
