"""Parameter-domain edits: pitch shift with formant preservation and time
stretch via frame interpolation (BASELINE config 4; the reference exposes
these as user-side manipulations of the chunk between llsm_chunk_tolayer1
and llsm_chunk_tolayer0 -- see SURVEY.md 3.3).

All edits are pure pytree -> pytree functions, jit-safe, and compose.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fp import CP, FP

from ..container import Chunk, phase_propagate
from . import layer1


def pitch_shift(chunk: Chunk, ratio: float) -> Chunk:
    """Multiply F0 by `ratio`, preserving formants via the layer-1
    vocal-tract envelope.  The chunk must carry layer-1 parameters
    (layer1.chunk_to_layer1); harmonics are regenerated from the
    F0-independent envelope, which is exactly the reference's formant-
    preserving mechanism (layer1.c -> llsm_frame_tolayer0 after editing
    f0)."""
    assert chunk.has_layer1, "pitch_shift requires layer-1 parameters"
    shifted = chunk.replace(f0=chunk.f0 * ratio)
    return layer1.chunk_to_layer0(shifted)


def _interp_frames(a: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation of per-frame data [N, ...] at fractional frame
    positions [M] -> [M, ...]."""
    n = a.shape[0]
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 2)
    t = jnp.clip(pos - i0, 0.0, 1.0)
    t = t.reshape(t.shape + (1,) * (a.ndim - 1))
    return a[i0] * (1.0 - t) + a[i0 + 1] * t


def _interp_circular(ph: jnp.ndarray, w: jnp.ndarray, pos: jnp.ndarray):
    """Amplitude-weighted circular interpolation of phases."""
    z = w * jnp.exp(1j * ph.astype(CP))
    zi = _interp_frames(z, pos)
    return jnp.angle(zi)


def time_stretch(chunk: Chunk, ratio: float) -> Chunk:
    """Stretch the utterance duration by `ratio` via frame interpolation
    (BASELINE config 4: x1.5).  Phases are made relative with
    phase_propagate(-1), interpolated circularly, then re-propagated over
    the new frame grid so harmonic phase coherence is regenerated for the
    new timing."""
    n = chunk.nfrm
    m = max(int(round(n * ratio)), 2)
    pos = jnp.clip(jnp.arange(m, dtype=FP) / ratio, 0.0, n - 1.0)

    rel = phase_propagate(chunk, -1)

    # voicing: a target frame is voiced only if both source neighbors are
    voiced_f = (chunk.f0 > 0).astype(FP)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 2)
    voiced_new = (voiced_f[i0] > 0) & (voiced_f[i0 + 1] > 0)

    f0i = _interp_frames(chunk.f0, pos)
    f0_new = jnp.where(voiced_new, f0i, 0.0)

    ampl = _interp_frames(rel.ampl, pos)
    phse = _interp_circular(rel.phse, jnp.maximum(rel.ampl, 1e-8), pos)
    mask = (_interp_frames(rel.hm_mask, pos) > 0.999).astype(FP)
    mask = mask * voiced_new[:, None]

    out = Chunk(
        f0=f0_new, ampl=ampl * mask, phse=phse * mask, hm_mask=mask,
        psd=_interp_frames(chunk.psd, pos),
        edc=_interp_frames(chunk.edc, pos),
        eenv_a=_interp_frames(chunk.eenv_a, pos),
        eenv_p=_interp_circular(chunk.eenv_p,
                                jnp.maximum(chunk.eenv_a, 1e-8), pos),
        rd=None if chunk.rd is None else _interp_frames(chunk.rd, pos),
        vtmagn=(None if chunk.vtmagn is None
                else _interp_frames(chunk.vtmagn, pos)),
        vsphse=(None if chunk.vsphse is None
                else _interp_circular(chunk.vsphse,
                                      jnp.ones_like(chunk.vsphse), pos)),
        conf=chunk.conf)
    return phase_propagate(out, +1)


def formant_shift(chunk: Chunk, ratio: float) -> Chunk:
    """Scale all formant frequencies by `ratio` (> 1 raises them) by
    warping the layer-1 vocal-tract envelope's frequency axis, then
    regenerate the layer-0 harmonics.  F0 is untouched -- the classic
    gender/size voice transformation the reference enables by letting the
    user resample VTMAGN between tolayer1 and tolayer0 (layer1.c; the C
    library ships no helper, the edit is user-side there too).

    The warp is a static two-tap interpolation MATRIX applied with one
    matmul -- per-row fancy indexing would lower to an XLA gather
    (measured 25-100x slower than matmul/slice forms on TPU)."""
    assert chunk.has_layer1, "formant_shift requires layer-1 parameters"
    nspec = chunk.vtmagn.shape[-1]
    pos = jnp.arange(nspec, dtype=FP) / ratio      # sample source bins
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, nspec - 2)
    t = jnp.clip(pos - i0.astype(FP), 0.0, 1.0)
    W = (jax.nn.one_hot(i0, nspec, dtype=FP) * (1.0 - t)[:, None]
         + jax.nn.one_hot(i0 + 1, nspec, dtype=FP) * t[:, None])
    shifted = chunk.replace(vtmagn=chunk.vtmagn @ W.T)
    return layer1.chunk_to_layer0(shifted)


def breathiness(chunk: Chunk, gain_db: float,
                rd_delta: float = 0.0) -> Chunk:
    """Scale the noise component by `gain_db` (aspiration level) and
    optionally relax the glottal tension (rd_delta > 0 is breathier);
    harmonics are regenerated only when Rd changes.  PSD is stored
    linear-power on the warped axis and edc/eenv_a are amplitude
    envelopes, so power scales by g^2 and amplitudes by g."""
    g = float(10.0 ** (gain_db / 20.0))
    out = chunk.replace(psd=chunk.psd * g * g, edc=chunk.edc * g,
                        eenv_a=chunk.eenv_a * g)
    if rd_delta != 0.0:
        assert out.has_layer1, "rd_delta requires layer-1 parameters"
        out = out.replace(rd=jnp.clip(out.rd + rd_delta, 0.1, 2.7))
        out = layer1.chunk_to_layer0(out)
    return out
