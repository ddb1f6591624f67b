"""Phoneme-conditioned acoustic model over LLSM coder vectors.

Completes the framework's TTS loop (the reference's coder exists to feed
frames to/from ML models -- reference: coder.c; SURVEY.md 3.5 -- but
ships no model): phone identity + position features in, coder vectors
out, trained with the same data-parallel recipe as models.neural and
served through coder.decode_frames -> RTSynthesizer / StreamPool
(the streaming-vector-decode shape in models/coder.py).

TPU-native choices:
  - gather-free embedding: one-hot x embedding-matrix matmul (MXU);
  - the sequence context is a stack of residual dilated 1-D convolutions
    expressed as shift-and-matmul (static pads + slices -- no gather, no
    dynamic shapes; each tap is one [hidden, hidden] MXU contraction);
  - bfloat16 compute, float32 master weights, like models.neural;
  - pure-pytree parameters + optax; batch axis shards over a mesh with
    parallel.mesh.shard_batch (GSPMD all-reduces the gradients).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class AcousticConfig:
    dims: int                       # coder vector size (model output)
    n_phones: int
    n_feats: int = 2                # continuous per-frame features
    embed: int = 32
    hidden: int = 64
    dilations: Tuple[int, ...] = (1, 2, 4, 8)   # kernel-3 blocks
    lr: float = 3e-3
    compute_dtype: Any = jnp.bfloat16


def _dense_init(key, fan_in, fan_out):
    w = jax.random.normal(key, (fan_in, fan_out), jnp.float32)
    return {"w": w * jnp.sqrt(2.0 / fan_in),
            "b": jnp.zeros((fan_out,), jnp.float32)}


def init_params(cfg: AcousticConfig, key) -> Dict:
    nb = len(cfg.dilations)
    keys = jax.random.split(key, 3 * nb + 3)
    p = {"embed": jax.random.normal(keys[-1], (cfg.n_phones, cfg.embed),
                                    jnp.float32) * 0.3,
         "in": _dense_init(keys[0], cfg.embed + cfg.n_feats, cfg.hidden),
         "out": _dense_init(keys[1], cfg.hidden, cfg.dims)}
    for i in range(nb):
        # kernel-3 conv = 3 dense taps applied to shifted copies
        p[f"conv{i}"] = {
            "w": jnp.stack([_dense_init(keys[2 + 3 * i + t], cfg.hidden,
                                        cfg.hidden)["w"] / jnp.sqrt(3.0)
                            for t in range(3)]),
            "b": jnp.zeros((cfg.hidden,), jnp.float32)}
    return p


def _shift(h: jnp.ndarray, off: int) -> jnp.ndarray:
    """Shift along the frame axis by `off` (static), zero-padded."""
    if off == 0:
        return h
    n = h.shape[1]
    if off > 0:   # tap looks back: h[:, i-off]
        return jnp.pad(h, ((0, 0), (off, 0), (0, 0)))[:, :n]
    return jnp.pad(h, ((0, 0), (0, -off), (0, 0)))[:, -off:]


def forward(cfg: AcousticConfig, params, ids: jnp.ndarray,
            feats: jnp.ndarray) -> jnp.ndarray:
    """ids [B, N] int32, feats [B, N, n_feats] -> [B, N, dims]
    (normalized coder space)."""
    dt = cfg.compute_dtype
    onehot = jax.nn.one_hot(ids, cfg.n_phones, dtype=dt)
    emb = jnp.dot(onehot, params["embed"].astype(dt),
                  preferred_element_type=jnp.float32)
    h = jnp.concatenate([emb, feats.astype(jnp.float32)], axis=-1)
    h = jax.nn.gelu(jnp.dot(h.astype(dt), params["in"]["w"].astype(dt),
                            preferred_element_type=jnp.float32)
                    + params["in"]["b"])
    for i, d in enumerate(cfg.dilations):
        cw, cb = params[f"conv{i}"]["w"], params[f"conv{i}"]["b"]
        y = cb
        for t, off in enumerate((-d, 0, d)):
            y = y + jnp.dot(_shift(h, off).astype(dt), cw[t].astype(dt),
                            preferred_element_type=jnp.float32)
        h = h + jax.nn.gelu(y)
    return jnp.dot(h.astype(dt), params["out"]["w"].astype(dt),
                   preferred_element_type=jnp.float32) + params["out"]["b"]


def loss_fn(cfg: AcousticConfig, params, batch, dim_weights=None):
    """Masked MSE in normalized coder space.  batch = (ids, feats,
    targets, mask); dim_weights [dims] optionally emphasizes slots
    (e.g. F0) whose errors matter more downstream."""
    ids, feats, targets, mask = batch
    pred = forward(cfg, params, ids, feats)
    err = (pred - targets) ** 2
    if dim_weights is not None:
        err = err * dim_weights
    err = err * mask[..., None]
    return jnp.sum(err) / jnp.maximum(jnp.sum(mask) * cfg.dims, 1.0)


def make_optimizer(cfg: AcousticConfig):
    return optax.adamw(cfg.lr, weight_decay=1e-5)


@functools.partial(jax.jit, static_argnums=0)
def train_step(cfg: AcousticConfig, params, opt_state, batch,
               dim_weights=None):
    """One jitted step.  Shard every array in `batch` over the mesh's
    batch axis first (parallel.mesh.shard_batch) for data-parallel
    training; parameters stay replicated (gradient all-reduce)."""
    loss, grads = jax.value_and_grad(
        lambda p: loss_fn(cfg, p, batch, dim_weights))(params)
    updates, opt_state = make_optimizer(cfg).update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def predict_vectors(cfg: AcousticConfig, params, ids, feats, norm,
                    unvoiced_below: float = 0.0):
    """Model output denormalized back to raw coder vectors (host
    convenience; norm is a models.neural.Normalizer fitted on targets).

    unvoiced_below: regression noise puts small positive values in the
    F0 slot on unvoiced frames; snapping anything below the analysis
    floor to exactly 0 restores the voiced/unvoiced decision before the
    vectors hit coder.decode_frames (slot 0 = "f0" in
    coder.CoderConfig.layout)."""
    import numpy as np
    pred = norm.inv(np.asarray(forward(cfg, params, ids, feats)))
    if unvoiced_below > 0.0:
        f0 = pred[..., 0]
        pred[..., 0] = np.where(f0 >= unvoiced_below, f0, 0.0)
    return pred.astype(np.float32)
