"""Chunk data model: the TPU-native analog of the reference's generic
container / frame types (reference: container.c -> llsm_container,
frame.c -> llsm_hmframe / llsm_nmframe / llsm_chunk).

Where the C library stores one heap-allocated frame per hop with per-frame
variable harmonic counts, the TPU-native chunk is a single struct-of-arrays
pytree: every field is padded to conf.maxnhar (etc.) with an explicit
validity mask, so the whole utterance -- or a whole batch of utterances --
is one set of rectangular arrays that jit/vmap/pjit over cleanly
(SURVEY.md section 7, design decision 1).  The conf travels with the data
as static aux info, preserving the reference's self-describing-chunk
property (llsm.h -> LLSM_CONF_*).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .fp import FP

from .config import ChunkConf


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Chunk:
    """One utterance (or a batch, with leading batch axes) of LLSM frames.

    Harmonic model (reference: frame.c -> llsm_hmframe):
      f0        [..., N]        F0 per frame, Hz; 0 = unvoiced
      ampl      [..., N, K]     harmonic amplitudes, slot k = harmonic (k+1)*f0
      phse      [..., N, K]     harmonic phases at the frame center [rad]
      hm_mask   [..., N, K]     1 where the harmonic exists

    Noise model (reference: frame.c -> llsm_nmframe):
      psd       [..., N, npsd]  residual PSD on the warped axis (linear power)
      edc       [..., N, C]     per-channel temporal-envelope DC (amplitude)
      eenv_a/p  [..., N, C, Ke] envelope harmonic amplitudes / phases

    Layer 1 (reference: layer1.c; attached alongside layer 0, not replacing):
      rd        [..., N]        LF model Rd parameter
      vtmagn    [..., N, nspec] vocal-tract log-magnitude on the rfft grid
      vsphse    [..., N, K]     voice-source residual phases
    """

    f0: jnp.ndarray
    ampl: jnp.ndarray
    phse: jnp.ndarray
    hm_mask: jnp.ndarray
    psd: jnp.ndarray
    edc: jnp.ndarray
    eenv_a: jnp.ndarray
    eenv_p: jnp.ndarray
    rd: Optional[jnp.ndarray] = None
    vtmagn: Optional[jnp.ndarray] = None
    vsphse: Optional[jnp.ndarray] = None
    # user-attached entries (reference: container.c -> llsm_container_attach:
    # the C container holds arbitrary extra slots; here a string-keyed dict
    # of arrays that travels through jit/vmap like any pytree leaf)
    extras: Optional[dict] = None
    conf: ChunkConf = dataclasses.field(
        default=ChunkConf(), metadata=dict(static=True))

    @property
    def nfrm(self) -> int:
        return self.f0.shape[-1]

    @property
    def has_layer1(self) -> bool:
        return self.rd is not None

    @property
    def voiced(self) -> jnp.ndarray:
        return self.f0 > 0.0

    def replace(self, **kw) -> "Chunk":
        return dataclasses.replace(self, **kw)

    def frame(self, i) -> "Chunk":
        """Single-frame view (keeps the frame axis with length 1), the
        analog of indexing chunk->frames[i] in the reference."""
        take = lambda a: None if a is None else jax.lax.dynamic_slice_in_dim(
            a, i, 1, axis=0)
        return Chunk(
            f0=take(self.f0), ampl=take(self.ampl), phse=take(self.phse),
            hm_mask=take(self.hm_mask), psd=take(self.psd), edc=take(self.edc),
            eenv_a=take(self.eenv_a), eenv_p=take(self.eenv_p),
            rd=take(self.rd), vtmagn=take(self.vtmagn),
            vsphse=take(self.vsphse),
            extras=None if self.extras is None else
            {k: take(v) for k, v in self.extras.items()},
            conf=self.conf)

    # -- generic attachment (reference: container.c ->
    #    llsm_container_attach / _detach / _get) --------------------------
    def attach(self, name: str, value) -> "Chunk":
        extras = dict(self.extras or {})
        extras[name] = value
        return self.replace(extras=extras)

    def detach(self, name: str) -> "Chunk":
        extras = dict(self.extras or {})
        extras.pop(name, None)
        return self.replace(extras=extras or None)

    def get(self, name: str, default=None):
        return (self.extras or {}).get(name, default)


def create_chunk(conf: ChunkConf, nfrm: int, batch_shape=()) -> Chunk:
    """Zero-initialized chunk (reference: frame.c -> llsm_create_chunk)."""
    z = lambda *s: jnp.zeros(batch_shape + s, FP)
    K, C, Ke = conf.maxnhar, conf.nchannel, conf.maxnhar_e
    return Chunk(
        f0=z(nfrm), ampl=z(nfrm, K), phse=z(nfrm, K), hm_mask=z(nfrm, K),
        psd=z(nfrm, conf.npsd), edc=z(nfrm, C),
        eenv_a=z(nfrm, C, Ke), eenv_p=z(nfrm, C, Ke), conf=conf)


# ---------------------------------------------------------------------------
# Phase utilities (reference: frame.c -> llsm_frame_phaseshift,
# llsm_frame_phasesync, llsm_chunk_phasepropagate)
# ---------------------------------------------------------------------------

def _frac(x):
    return x - jnp.floor(x)


def cumulative_cycles(f0: jnp.ndarray, thop: float) -> jnp.ndarray:
    """Fundamental phase in cycles (mod 1) at each frame center:
    c_i = frac(sum_{j<i} f0_j * thop).

    The cross-frame prefix sum is the ONLY sequential dependency in
    synthesis (SURVEY.md section 3.2); it is computed with
    jax.lax.associative_scan on the frame axis so a frame-sharded chunk
    propagates phase via XLA collectives instead of a host loop.  Keeping
    every partial mod 1 bounds float32 rounding to ~1 ulp/step.
    """
    f0z = jnp.where(f0 > 0, f0, 0.0)
    # trapezoidal integration, matching ops.harmonics.sample_cycles (which
    # integrates the linear interpolation of the frame-rate F0 track)
    d = _frac(0.5 * (f0z[..., :-1] + f0z[..., 1:]) * thop)
    c = jax.lax.associative_scan(lambda a, b: _frac(a + b), d, axis=-1)
    # exclusive: phase at frame i accumulates hops before i
    return _frac(jnp.concatenate(
        [jnp.zeros_like(f0z[..., :1]), c], axis=-1))


def phase_propagate(chunk: Chunk, sign: int) -> Chunk:
    """Add (sign=+1) or remove (sign=-1) the linear inter-frame phase
    advance 2 pi (k+1) * cumcycles_i from every harmonic phase.

    After propagate(-1), phases are relative (edit-friendly: frames can be
    interpolated / retimed); propagate(+1) restores absolute phase
    coherence before synthesis.  Reference: frame.c ->
    llsm_chunk_phasepropagate.
    """
    K = chunk.ampl.shape[-1]
    cyc = cumulative_cycles(chunk.f0, chunk.conf.thop)      # [..., N]
    kharm = jnp.arange(1, K + 1, dtype=FP)
    ph = _frac(cyc[..., :, None] * kharm)                   # [..., N, K]
    phse = chunk.phse + sign * 2.0 * jnp.pi * ph
    phse = jnp.arctan2(jnp.sin(phse), jnp.cos(phse))        # wrap to (-pi, pi]
    return chunk.replace(phse=phse * chunk.hm_mask)


def phase_shift(chunk: Chunk, dt: float) -> Chunk:
    """Shift every frame's harmonic phases by a time offset dt [s]:
    phi_k += 2 pi (k+1) f0 dt (reference: frame.c -> llsm_frame_phaseshift
    applied chunk-wide).  Used to realign frames after retiming edits."""
    K = chunk.ampl.shape[-1]
    kharm = jnp.arange(1, K + 1, dtype=FP)
    cyc = _frac(jnp.where(chunk.f0 > 0, chunk.f0, 0.0) * dt)
    ph = _frac(cyc[..., :, None] * kharm)
    phse = chunk.phse + 2.0 * jnp.pi * ph
    phse = jnp.arctan2(jnp.sin(phse), jnp.cos(phse))
    return chunk.replace(phse=phse * chunk.hm_mask)


def phase_sync(chunk: Chunk) -> Chunk:
    """Shift each frame's phases so the fundamental has phase 0
    (reference: frame.c -> llsm_frame_phasesync applied chunk-wide)."""
    K = chunk.ampl.shape[-1]
    kharm = jnp.arange(1, K + 1, dtype=FP)
    shift = chunk.phse[..., :, :1] * kharm                  # (k+1)*phi_0
    phse = chunk.phse - shift
    phse = jnp.arctan2(jnp.sin(phse), jnp.cos(phse))
    return chunk.replace(phse=phse * chunk.hm_mask)
