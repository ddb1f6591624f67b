"""Discrete neural speech codec: product VQ-VAE over LLSM coder vectors.

The reference's coder produces fixed-width float vectors for ML interop
(reference: coder.c; SURVEY.md 3.5).  Modern acoustic LMs want DISCRETE
tokens; this module closes that gap TPU-natively: the models.neural
residual-MLP autoencoder compresses a coder vector to a small latent,
which a product quantizer (G groups x S codes) snaps to its nearest
codebook entries -- one frame becomes G small integers
(G * log2(S) bits, e.g. 4 x 8 = 32 bits/frame against 118 float32
slots' 3776), and the token sequence round-trips through the decoder
back to coder vectors that coder.decode_frames can render.

TPU-native choices: nearest-code search is one batched matmul distance
(no gather -- code lookup is a one-hot x codebook einsum on the MXU);
training uses the straight-through estimator with codebook + commitment
losses (van den Oord et al.'s VQ-VAE objective, loss-based variant);
bf16 matmuls, fp32 master weights, optax, dp-shardable like
models.neural.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from . import neural


@dataclasses.dataclass(frozen=True)
class VQConfig:
    dims: int                   # coder vector size
    hidden: int = 128
    latent: int = 32
    depth: int = 2
    groups: int = 4             # product-quantization groups
    codebook: int = 256         # codes per group
    beta: float = 0.25          # commitment loss weight
    lr: float = 1e-3
    compute_dtype: Any = jnp.bfloat16

    @property
    def ae(self) -> neural.AEConfig:
        return neural.AEConfig(dims=self.dims, hidden=self.hidden,
                               latent=self.latent, depth=self.depth,
                               lr=self.lr,
                               compute_dtype=self.compute_dtype)

    @property
    def sub(self) -> int:
        assert self.latent % self.groups == 0
        return self.latent // self.groups

    @property
    def bits_per_frame(self) -> int:
        import math
        return self.groups * int(math.log2(self.codebook))


def init_params(cfg: VQConfig, key) -> Dict:
    k1, k2 = jax.random.split(key)
    return {"ae": neural.init_params(cfg.ae, k1),
            # unit-scale init: encoder outputs are O(1) after the gelu
            # stack; dead codes are handled by the commitment pull
            "codebook": jax.random.normal(
                k2, (cfg.groups, cfg.codebook, cfg.sub), jnp.float32) * 0.5}


def _nearest(cfg: VQConfig, codebook, z):
    """z [..., latent] -> (indices [..., G] int32, zq [..., latent]).
    Distance via the expanded form so the inner term is one matmul;
    lookup via one-hot matmul (gather-free)."""
    zs = z.reshape(z.shape[:-1] + (cfg.groups, cfg.sub))
    dots = jnp.einsum("...gd,gsd->...gs", zs, codebook,
                      preferred_element_type=jnp.float32)
    c2 = jnp.sum(codebook ** 2, axis=-1)                 # [G, S]
    d2 = c2 - 2.0 * dots                                 # ||z||^2 constant
    idx = jnp.argmin(d2, axis=-1)                        # [..., G]
    onehot = jax.nn.one_hot(idx, cfg.codebook, dtype=z.dtype)
    zq = jnp.einsum("...gs,gsd->...gd", onehot, codebook,
                    preferred_element_type=jnp.float32)
    return idx.astype(jnp.int32), zq.reshape(z.shape)


def forward(cfg: VQConfig, params, x):
    """x [..., dims] (normalized coder space) -> (recon, aux losses)."""
    z = neural.encode(cfg.ae, params["ae"], x)
    _, zq = _nearest(cfg, params["codebook"], z)
    commit = jnp.mean((z - jax.lax.stop_gradient(zq)) ** 2)
    codebk = jnp.mean((jax.lax.stop_gradient(z) - zq) ** 2)
    z_st = z + jax.lax.stop_gradient(zq - z)             # straight-through
    recon = neural.decode(cfg.ae, params["ae"], z_st)
    return recon, commit, codebk


def loss_fn(cfg: VQConfig, params, batch, mask=None):
    recon, commit, codebk = forward(cfg, params, batch)
    err = (recon - batch) ** 2
    if mask is not None:
        err = err * mask[..., None]
        rec = jnp.sum(err) / jnp.maximum(jnp.sum(mask) * cfg.dims, 1.0)
    else:
        rec = jnp.mean(err)
    return rec + cfg.beta * commit + codebk, rec


def make_optimizer(cfg: VQConfig):
    return optax.adamw(cfg.lr, weight_decay=1e-5)


@functools.partial(jax.jit, static_argnums=0)
def train_step(cfg: VQConfig, params, opt_state, batch, mask=None):
    """One jitted step; shard `batch` over the mesh batch axis for dp
    (parallel.mesh.shard_batch), parameters stay replicated."""
    (loss, rec), grads = jax.value_and_grad(
        lambda p: loss_fn(cfg, p, batch, mask), has_aux=True)(params)
    updates, opt_state = make_optimizer(cfg).update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, rec


@functools.partial(jax.jit, static_argnums=0)
def encode_tokens(cfg: VQConfig, params, x) -> jnp.ndarray:
    """Normalized coder vectors [..., dims] -> tokens [..., groups]
    int32 (the LM-facing representation)."""
    z = neural.encode(cfg.ae, params["ae"], x)
    idx, _ = _nearest(cfg, params["codebook"], z)
    return idx


@functools.partial(jax.jit, static_argnums=0)
def decode_tokens(cfg: VQConfig, params, idx) -> jnp.ndarray:
    """Tokens [..., groups] -> normalized coder vectors [..., dims]
    (denormalize with the fitted neural.Normalizer, then render via
    coder.decode / decode_frames)."""
    onehot = jax.nn.one_hot(idx, cfg.codebook, dtype=jnp.float32)
    zq = jnp.einsum("...gs,gsd->...gd", onehot, params["codebook"],
                    preferred_element_type=jnp.float32)
    zq = zq.reshape(zq.shape[:-2] + (cfg.latent,))
    return neural.decode(cfg.ae, params["ae"], zq)
