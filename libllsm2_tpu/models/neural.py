"""Neural frame model on LLSM coder vectors.

The reference's coder exists to feed frames to/from ML models (reference:
coder.c; SURVEY.md 3.5) but ships no model.  This module completes that
loop TPU-natively: a residual MLP autoencoder over coder vectors (usable
as a frame compressor, denoiser, or the decoder head of an acoustic
model), with a jitted optax training step that shards the batch axis over
a device mesh -- the framework's canonical *training* workload (the
forward/synthesis pipeline being the inference workload).

Pure-pytree parameters (no framework dependency); optax for the
optimizer; mixed precision: bfloat16 matmuls, float32 master weights.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class AEConfig:
    dims: int                 # coder vector size
    hidden: int = 256
    latent: int = 32
    depth: int = 2            # residual blocks per side
    lr: float = 1e-3
    compute_dtype: Any = jnp.bfloat16


def _dense_init(key, fan_in, fan_out):
    w = jax.random.normal(key, (fan_in, fan_out), jnp.float32)
    return {"w": w * jnp.sqrt(2.0 / fan_in),
            "b": jnp.zeros((fan_out,), jnp.float32)}


def init_params(cfg: AEConfig, key) -> Dict:
    keys = jax.random.split(key, 2 * cfg.depth + 4)
    p = {"enc_in": _dense_init(keys[0], cfg.dims, cfg.hidden),
         "enc_out": _dense_init(keys[1], cfg.hidden, cfg.latent),
         "dec_in": _dense_init(keys[2], cfg.latent, cfg.hidden),
         "dec_out": _dense_init(keys[3], cfg.hidden, cfg.dims)}
    for i in range(cfg.depth):
        p[f"enc_res{i}"] = _dense_init(keys[4 + i], cfg.hidden, cfg.hidden)
        p[f"dec_res{i}"] = _dense_init(keys[4 + cfg.depth + i],
                                       cfg.hidden, cfg.hidden)
    return p


def _dense(p, x, dtype):
    return jnp.dot(x.astype(dtype), p["w"].astype(dtype),
                   preferred_element_type=jnp.float32) + p["b"]


def encode(cfg: AEConfig, params, x):
    h = jax.nn.gelu(_dense(params["enc_in"], x, cfg.compute_dtype))
    for i in range(cfg.depth):
        h = h + jax.nn.gelu(_dense(params[f"enc_res{i}"], h,
                                   cfg.compute_dtype))
    return _dense(params["enc_out"], h, cfg.compute_dtype)


def decode(cfg: AEConfig, params, z):
    h = jax.nn.gelu(_dense(params["dec_in"], z, cfg.compute_dtype))
    for i in range(cfg.depth):
        h = h + jax.nn.gelu(_dense(params[f"dec_res{i}"], h,
                                   cfg.compute_dtype))
    return _dense(params["dec_out"], h, cfg.compute_dtype)


def forward(cfg: AEConfig, params, x):
    return decode(cfg, params, encode(cfg, params, x))


def loss_fn(cfg: AEConfig, params, batch, mask=None):
    """Masked MSE in the normalized coder space; batch [B, N, dims] or
    [B, dims]."""
    pred = forward(cfg, params, batch)
    err = (pred - batch) ** 2
    if mask is not None:
        err = err * mask[..., None]
        return jnp.sum(err) / jnp.maximum(
            jnp.sum(mask) * batch.shape[-1], 1.0)
    return jnp.mean(err)


def make_optimizer(cfg: AEConfig):
    return optax.adamw(cfg.lr, weight_decay=1e-5)


@functools.partial(jax.jit, static_argnums=0)
def train_step(cfg: AEConfig, params, opt_state, batch, mask=None):
    """One jitted training step.  Shard `batch` over the mesh's batch axis
    before calling (mesh.shard_batch): GSPMD keeps the forward/backward
    data-parallel and all-reduces gradients over ICI."""
    loss, grads = jax.value_and_grad(
        lambda p: loss_fn(cfg, p, batch, mask))(params)
    updates, opt_state = make_optimizer(cfg).update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def tp_param_specs(cfg: AEConfig):
    """Megatron-style tensor-parallel PartitionSpecs for init_params'
    pytree over a (batch, model) mesh (parallel.mesh.make_tp_mesh).

    Column-parallel entry layers shard the hidden OUT dimension (their
    bias shards with it); row-parallel residual/exit layers shard the
    hidden IN dimension, producing partial sums that GSPMD all-reduces
    over the model axis (their bias is replicated).  Activations between
    them stay sharded on hidden; only the small latent/dims boundaries
    are replicated."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import MODEL_AXIS as M
    col = {"w": P(None, M), "b": P(M)}
    row = {"w": P(M, None), "b": P()}
    specs = {"enc_in": col, "enc_out": row,
             "dec_in": col, "dec_out": row}
    for i in range(cfg.depth):
        # residual blocks are a single square matmul: row-parallel, so
        # the partial-sum psum lands on the (replicated-on-hidden)
        # residual stream that the next block's dot re-shards
        specs[f"enc_res{i}"] = row
        specs[f"dec_res{i}"] = row
    return specs


def shard_params_tp(cfg: AEConfig, params, mesh):
    """Place the init_params dict on the mesh per tp_param_specs.  Shard
    params BEFORE optimizer.init: optax state leaves are created with
    zeros_like and inherit the parameter shardings, and train_step's jit
    then propagates them (GSPMD inserts the model-axis collectives)."""
    from jax.sharding import NamedSharding

    specs = tp_param_specs(cfg)
    return {name: {k: jax.device_put(a, NamedSharding(mesh, specs[name][k]))
                   for k, a in layer.items()}
            for name, layer in params.items()}


class Normalizer:
    """Per-dimension standardization of coder vectors (host-side)."""

    def __init__(self, vectors):
        import numpy as np
        v = np.asarray(vectors).reshape(-1, vectors.shape[-1])
        self.mean = v.mean(axis=0)
        self.std = v.std(axis=0) + 1e-6

    def fwd(self, v):
        return (v - self.mean) / self.std

    def inv(self, v):
        return v * self.std + self.mean
