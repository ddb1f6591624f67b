"""Analysis-by-synthesis refinement: gradient-optimize chunk parameters
through the differentiable synthesizer.

This capability has no analog in the C reference (layer0.c's analysis is
a fixed-form estimator): because the whole synthesis path here is JAX,
any parameter of the model can be fitted directly to a waveform target
by backpropagating through the oscillator bank -- the classical
"analysis-by-synthesis" loop as a few lines of optax.  Uses:

  - squeeze the last dB out of a difficult analysis (leakage, strong
    AM/FM) by refining amplitudes/phases against the input;
  - invert EDITED or decoded parameters toward a reference recording;
  - serve as the decoder half of neural parameter estimators (the
    gradient flows on to whatever produced the chunk).

Only the deterministic harmonic part is fitted (the noise component is
keyed-PRNG stochastic; its gradient w.r.t. harmonic parameters is zero
and its sample noise would bias a waveform loss).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..fp import FP
import optax

from ..config import SynthesisOptions
from ..container import Chunk
from ..ops import harmonics


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def abs_refine(sopt: SynthesisOptions, chunk: Chunk, target: jnp.ndarray,
               n_steps: int = 60, lr: float = 0.03
               ) -> Tuple[Chunk, jnp.ndarray]:
    """Refine a chunk's harmonic amplitudes/phases by gradient descent on
    the waveform error of the HARMONIC resynthesis against `target`.

    Amplitudes are optimized in the log domain (positivity; relative
    steps), phases directly; masked slots stay zero.  Returns the
    refined chunk and the per-step loss trace [n_steps].

    target: [nx] waveform at sopt.fs (nx = nfrm * nhop; longer targets
    are truncated, shorter zero-padded).
    """
    conf = chunk.conf
    fs = sopt.fs
    nhop = int(round(conf.thop * fs))
    nx = chunk.nfrm * nhop
    t = jnp.asarray(target, FP)
    t = jnp.pad(t[:nx], (0, max(0, nx - t.shape[0])))
    centers = jnp.arange(chunk.nfrm, dtype=jnp.int32) * nhop
    cyc = harmonics.sample_cycles(chunk.f0, nhop, fs, nx)
    mask = chunk.hm_mask

    params = {
        "la": jnp.log(jnp.maximum(chunk.ampl, 1e-6)),
        "ph": chunk.phse,
    }

    def render(p):
        segs = harmonics.oscillator_bank(
            cyc, centers, jnp.exp(p["la"]) * mask, p["ph"], mask,
            nhop=nhop, use_pallas=False)
        return harmonics.overlap_add_half(segs, nhop, nx)

    def loss_fn(p):
        return jnp.mean((render(p) - t) ** 2)

    opt = optax.adam(lr)
    state = opt.init(params)

    def step(carry, _):
        p, s = carry
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s, p)
        return (optax.apply_updates(p, updates), s), loss

    (params, _), losses = jax.lax.scan(step, (params, state),
                                       jnp.arange(n_steps))
    refined = dataclasses.replace(
        chunk,
        ampl=jnp.exp(params["la"]) * mask,
        phse=params["ph"] * mask)
    return refined, losses
