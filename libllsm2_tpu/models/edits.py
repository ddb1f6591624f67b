"""Parameter-domain edits: pitch shift with formant preservation, time
stretch via frame interpolation (BASELINE config 4), vibrato/tremolo,
two-utterance voice morphing and phase-coherent chunk concatenation (the
reference exposes all of these as user-side manipulations of the chunk
between llsm_chunk_tolayer1 and llsm_chunk_tolayer0 -- see SURVEY.md 3.3;
the C library ships the phase utilities, the edits themselves are
user code there too).

All edits are pure pytree -> pytree functions, jit-safe, and compose.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fp import CP, FP

from ..container import Chunk, cumulative_cycles, phase_propagate
from . import layer1


def _wrap(ph):
    return jnp.arctan2(jnp.sin(ph), jnp.cos(ph))


def _vs_propagate(vsphse: jnp.ndarray, f0: jnp.ndarray, thop: float,
                  sign: int) -> jnp.ndarray:
    """Add (+1) / remove (-1) the fundamental's linear inter-frame ramp
    2 pi (k+1) cumcycles_i from the voice-source phases, the vsphse analog
    of container.phase_propagate (reference: frame.c ->
    llsm_chunk_phasepropagate; vsphse inherits the ramp from phse through
    layer1's vsphse = phse - minphase - source definition)."""
    K = vsphse.shape[-1]
    cyc = cumulative_cycles(f0, thop)                       # [..., N]
    kharm = jnp.arange(1, K + 1, dtype=FP)
    ph = (cyc[..., :, None] * kharm) % 1.0
    return _wrap(vsphse + sign * 2.0 * jnp.pi * ph)


def _repitch_vsphse(chunk: Chunk, f0_new: jnp.ndarray) -> Chunk:
    """Re-anchor the voice-source phases to a new F0 track: remove the old
    fundamental ramp, re-add the new one.  Without this every F0 edit
    leaves vsphse advancing at the OLD rate, so the regenerated layer-0
    phases disagree with the new per-hop phase advance and the synthesis
    OLA partially cancels (measured: Hilbert-envelope roughness of the
    pitch-shifted harmonic render drops to the unedited level with the
    re-ramp; see tests/test_edits.py::test_pitch_shift_phase_coherence)."""
    rel = _vs_propagate(chunk.vsphse, chunk.f0, chunk.conf.thop, -1)
    vs = _vs_propagate(rel, f0_new, chunk.conf.thop, +1)
    return chunk.replace(f0=f0_new, vsphse=vs)


def pitch_shift(chunk: Chunk, ratio: float) -> Chunk:
    """Multiply F0 by `ratio`, preserving formants via the layer-1
    vocal-tract envelope.  The chunk must carry layer-1 parameters
    (layer1.chunk_to_layer1); harmonics are regenerated from the
    F0-independent envelope, which is exactly the reference's formant-
    preserving mechanism (layer1.c -> llsm_frame_tolayer0 after editing
    f0).  Voice-source phases are re-propagated onto the new F0 track so
    the inter-frame phase advance stays OLA-coherent."""
    assert chunk.has_layer1, "pitch_shift requires layer-1 parameters"
    return layer1.chunk_to_layer0(_repitch_vsphse(chunk, chunk.f0 * ratio))


def vibrato(chunk: Chunk, rate_hz: float = 5.5,
            depth_semitones: float = 0.35) -> Chunk:
    """Apply sinusoidal pitch vibrato: f0 *= 2^(depth/12 * sin(2 pi rate t))
    with formants preserved (harmonics regenerated through the layer-1
    envelope, like pitch_shift).  The chunk must carry layer-1
    parameters."""
    assert chunk.has_layer1, "vibrato requires layer-1 parameters"
    t = jnp.arange(chunk.nfrm, dtype=FP) * chunk.conf.thop
    mod = 2.0 ** ((depth_semitones / 12.0)
                  * jnp.sin(2.0 * jnp.pi * rate_hz * t))
    return layer1.chunk_to_layer0(_repitch_vsphse(chunk, chunk.f0 * mod))


def tremolo(chunk: Chunk, rate_hz: float = 5.5,
            depth_db: float = 3.0) -> Chunk:
    """Apply sinusoidal amplitude modulation to BOTH components:
    gain_i = 10^(depth/20 * sin(2 pi rate t_i)) scales harmonic and noise
    amplitudes (psd is linear power -> gain^2).  Works on layer-0 chunks;
    layer-1 parameters, if present, stay valid (vtmagn describes the
    un-modulated tract) -- re-derive layer 1 after the edit if you need
    the modulation folded in."""
    t = jnp.arange(chunk.nfrm, dtype=FP) * chunk.conf.thop
    g = 10.0 ** ((depth_db / 20.0) * jnp.sin(2.0 * jnp.pi * rate_hz * t))
    return chunk.replace(ampl=chunk.ampl * g[:, None],
                         psd=chunk.psd * (g * g)[:, None],
                         edc=chunk.edc * g[:, None],
                         eenv_a=chunk.eenv_a * g[:, None, None])


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


def _retime(chunk: Chunk, pos: jnp.ndarray) -> Chunk:
    """Resample a chunk's frames at fractional source positions [M],
    returning a RELATIVE-phase chunk (phse and vsphse have the
    fundamental's inter-frame ramp removed; callers re-propagate onto the
    retimed F0 track).  Shared core of time_stretch and morph."""
    n = chunk.nfrm

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

    if chunk.vsphse is None:
        vsphse = None
    else:
        vs_rel = _vs_propagate(chunk.vsphse, chunk.f0, chunk.conf.thop, -1)
        vsphse = _interp_circular(vs_rel, jnp.maximum(rel.ampl, 1e-8), pos)

    return Chunk(
        f0=f0_new, ampl=ampl * mask, phse=phse * mask, hm_mask=mask,
        psd=_interp_frames(chunk.psd, pos),
        edc=_interp_frames(chunk.edc, pos),
        eenv_a=_interp_frames(chunk.eenv_a, pos),
        eenv_p=_interp_circular(chunk.eenv_p,
                                jnp.maximum(chunk.eenv_a, 1e-8), pos),
        rd=None if chunk.rd is None else _interp_frames(chunk.rd, pos),
        vtmagn=(None if chunk.vtmagn is None
                else _interp_frames(chunk.vtmagn, pos)),
        vsphse=vsphse,
        conf=chunk.conf)


def _reramp(rel: Chunk) -> Chunk:
    """Restore absolute phases on a relative-domain chunk: re-add the
    fundamental ramp of rel.f0 to phse AND vsphse."""
    out = phase_propagate(rel, +1)
    if rel.vsphse is not None:
        out = out.replace(vsphse=_vs_propagate(
            rel.vsphse, rel.f0, rel.conf.thop, +1))
    return out


def time_stretch(chunk: Chunk, ratio: float) -> Chunk:
    """Stretch the utterance duration by `ratio` via frame interpolation
    (BASELINE config 4: x1.5).  Phases are made relative with
    phase_propagate(-1), interpolated circularly, then re-propagated over
    the new frame grid so harmonic phase coherence is regenerated for the
    new timing (voice-source phases get the same treatment, keeping
    layer-1/PbP renders of the stretched chunk coherent)."""
    n = chunk.nfrm
    m = max(int(round(n * ratio)), 2)
    pos = jnp.clip(jnp.arange(m, dtype=FP) / ratio, 0.0, n - 1.0)
    return _reramp(_retime(chunk, pos))


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


def creak(chunk: Chunk, depth: float = 0.5, subdiv: int = 2) -> Chunk:
    """Induce creaky voice / vocal fry: re-render the utterance at
    f0/subdiv with the in-between (sub)harmonics scaled by `depth`
    relative to the vocal-tract envelope.  This is the harmonic-domain
    signature of a period-`subdiv`d pulse train with alternating pulse
    amplitudes (see utils.testsig.synth_creaky_utterance: even pattern
    harmonics carry the mean pulse spectrum, odd ones the alternation)
    -- depth 0 is the original voice at a nominal f0/subdiv analysis,
    depth 1 full diplophonia.  Requires layer-1 parameters.  Note the
    harmonic grid halves its bandwidth coverage: maxnhar slots now span
    maxnhar*f0/subdiv Hz."""
    assert chunk.has_layer1, "creak requires layer-1 parameters"
    out = layer1.chunk_to_layer0(
        _repitch_vsphse(chunk, chunk.f0 / float(subdiv)))
    k = jnp.arange(1, out.ampl.shape[-1] + 1)
    scale = jnp.where((k % subdiv) != 0, depth, 1.0).astype(FP)
    return out.replace(ampl=out.ampl * scale)


# ---------------------------------------------------------------------------
# Two-chunk edits: voice morphing and phase-coherent concatenation
# ---------------------------------------------------------------------------

def _blend_frames(a: Chunk, b: Chunk, wb: jnp.ndarray) -> Chunk:
    """Per-frame blend of two RELATIVE-phase chunks on the same frame grid
    with per-frame b-weight wb [N] (wa = 1 - wb).  Rules: where both are
    voiced, F0 blends geometrically, log-domain fields (vtmagn) linearly,
    phases circularly (amplitude-weighted); where only one is voiced that
    side wins outright; voicing itself follows the dominant side.  Noise
    fields blend in the log domain unconditionally (noise exists in
    unvoiced frames too).  Returns a relative-domain chunk."""
    assert a.conf == b.conf, "blend requires matching ChunkConf"
    wb = jnp.clip(wb, 0.0, 1.0)
    wa = 1.0 - wb
    va, vb = a.f0 > 0, b.f0 > 0
    both = va & vb
    f0g = jnp.exp(wa * jnp.log(jnp.maximum(a.f0, 1e-3))
                  + wb * jnp.log(jnp.maximum(b.f0, 1e-3)))
    voiced = both | (va & (wa > 0.5)) | (vb & (wb > 0.5))
    f0 = jnp.where(both, f0g, jnp.where(va, a.f0, b.f0)) * voiced

    wa_c, wb_c = wa[:, None], wb[:, None]

    ampl = wa_c * a.ampl + wb_c * b.ampl
    z = (wa_c * a.ampl * jnp.exp(1j * a.phse.astype(CP))
         + wb_c * b.ampl * jnp.exp(1j * b.phse.astype(CP)))
    phse = jnp.angle(z).astype(FP)
    mask = ((wa_c * a.hm_mask + wb_c * b.hm_mask) > 1e-3).astype(FP)
    mask = mask * voiced[:, None]

    def log_lerp(x, y, floor):
        return jnp.exp(wa.reshape(wa.shape + (1,) * (x.ndim - 1))
                       * jnp.log(jnp.maximum(x, floor))
                       + wb.reshape(wb.shape + (1,) * (y.ndim - 1))
                       * jnp.log(jnp.maximum(y, floor)))

    ze = (wa[:, None, None] * a.eenv_a * jnp.exp(1j * a.eenv_p.astype(CP))
          + wb[:, None, None] * b.eenv_a * jnp.exp(1j * b.eenv_p.astype(CP)))

    has_l1 = a.has_layer1 and b.has_layer1
    if has_l1:
        rd = jnp.where(both, wa * a.rd + wb * b.rd,
                       jnp.where(va, a.rd, b.rd))
        vtmagn = jnp.where(both[:, None], wa_c * a.vtmagn + wb_c * b.vtmagn,
                           jnp.where(va[:, None], a.vtmagn, b.vtmagn))
        zs = (wa_c * jnp.maximum(a.ampl, 1e-8)
              * jnp.exp(1j * a.vsphse.astype(CP))
              + wb_c * jnp.maximum(b.ampl, 1e-8)
              * jnp.exp(1j * b.vsphse.astype(CP)))
        vsphse = jnp.angle(zs).astype(FP)
    else:
        rd = vtmagn = vsphse = None

    return Chunk(
        f0=f0, ampl=ampl * mask, phse=phse * mask, hm_mask=mask,
        psd=log_lerp(a.psd, b.psd, 1e-12),
        edc=log_lerp(a.edc, b.edc, 1e-10),
        eenv_a=log_lerp(a.eenv_a, b.eenv_a, 1e-10),
        eenv_p=jnp.angle(ze).astype(FP),
        rd=rd, vtmagn=vtmagn, vsphse=vsphse, conf=a.conf)


def morph(a: Chunk, b: Chunk, t) -> Chunk:
    """Voice morph between two layer-1 chunks: 0 -> a, 1 -> b, with b
    linearly time-normalized onto a's frame grid.  F0 interpolates
    geometrically (perceptual pitch), the vocal-tract envelope linearly in
    the log domain (formants glide between the voices), Rd linearly, and
    the noise model in the log-power domain; harmonics are regenerated
    from the blended layer-1 parameters (layer1.c -> llsm_frame_tolayer0),
    so the result stays a valid utterance at every t -- the classic
    source-filter morph the reference's layer-1 parameterization exists
    to enable (SURVEY.md 3.3).  `t` may be a scalar or a per-frame [nfrm]
    array (time-varying morph)."""
    assert a.has_layer1 and b.has_layer1, "morph requires layer-1 chunks"
    assert a.conf == b.conf, "morph requires matching ChunkConf"
    na, nb = a.nfrm, b.nfrm
    pos = (jnp.arange(na, dtype=FP) * ((nb - 1.0) / max(na - 1.0, 1.0)))
    b_on_a = _retime(b, pos)
    a_rel = phase_propagate(a, -1).replace(
        vsphse=_vs_propagate(a.vsphse, a.f0, a.conf.thop, -1))
    wb = jnp.broadcast_to(jnp.asarray(t, FP), (na,))
    blended = _blend_frames(a_rel, b_on_a, wb)
    return layer1.chunk_to_layer0(_reramp(blended))


def concat(a: Chunk, b: Chunk, crossfade_frames: int = 8) -> Chunk:
    """Splice chunk b after chunk a with a phase-coherent crossfade of
    `crossfade_frames` frames: both chunks are taken to relative phase
    (phase_propagate(-1)), the overlap region is frame-blended (amplitude
    lerp, amplitude-weighted circular phase, geometric F0 where both
    voiced), and phases are re-propagated over the joined F0 track --
    concatenative-synthesis unit joining built from the reference's phase
    utilities (frame.c -> llsm_chunk_phasepropagate; the C library leaves
    the splice itself to the user).  Layer-1 parameters are blended when
    both chunks carry them, otherwise dropped."""
    assert a.conf == b.conf, "concat requires matching ChunkConf"
    na, nb = a.nfrm, b.nfrm
    xf = int(crossfade_frames)
    assert 0 < xf <= min(na, nb), "crossfade must fit inside both chunks"
    n = na + nb - xf

    def rel(c):
        r = phase_propagate(c, -1)
        if c.vsphse is not None:
            r = r.replace(vsphse=_vs_propagate(c.vsphse, c.f0,
                                               c.conf.thop, -1))
        return r

    ra, rb = rel(a), rel(b)
    has_l1 = a.has_layer1 and b.has_layer1

    # Glottal-epoch / phase-convention alignment: the relative phases of
    # the two units differ by an arbitrary per-harmonic constant (for a
    # re-split chunk, exactly 2 pi k c0 where c0 is the fundamental phase
    # at the split), which would make the crossfade partially cancel high
    # harmonics.  Estimate the amplitude-weighted circular offset per
    # harmonic over the overlap and rotate b into a's convention -- an
    # all-pass correction, inaudible on its own, that makes re-splicing a
    # chunk exactly transparent (see tests/test_edits.py).
    wov = (ra.ampl[na - xf:] * rb.ampl[:xf]
           * ((ra.f0[na - xf:] > 0) & (rb.f0[:xf] > 0))[:, None])
    zov = jnp.sum(wov * jnp.exp(1j * (ra.phse[na - xf:]
                                      - rb.phse[:xf]).astype(CP)), axis=0)
    rot = jnp.where(jnp.abs(zov) > 1e-12, jnp.angle(zov), 0.0).astype(FP)
    rb = rb.replace(phse=_wrap(rb.phse + rot) * rb.hm_mask)
    if has_l1:
        rb = rb.replace(vsphse=_wrap(rb.vsphse + rot))

    def pad_after(x, total):
        if x is None:
            return None
        return jnp.pad(x, ((0, total - x.shape[0]),) + ((0, 0),)
                       * (x.ndim - 1))

    def pad_before(x, total):
        if x is None:
            return None
        return jnp.pad(x, ((total - x.shape[0], 0),) + ((0, 0),)
                       * (x.ndim - 1))

    def extend(c, pad):
        return Chunk(
            f0=pad(c.f0, n), ampl=pad(c.ampl, n), phse=pad(c.phse, n),
            hm_mask=pad(c.hm_mask, n), psd=pad(c.psd, n), edc=pad(c.edc, n),
            eenv_a=pad(c.eenv_a, n), eenv_p=pad(c.eenv_p, n),
            rd=pad(c.rd, n) if has_l1 else None,
            vtmagn=pad(c.vtmagn, n) if has_l1 else None,
            vsphse=pad(c.vsphse, n) if has_l1 else None,
            conf=c.conf)

    a_ext = extend(ra, pad_after)
    b_ext = extend(rb, pad_before)
    ramp = (jnp.arange(xf, dtype=FP) + 0.5) / xf
    wb = jnp.concatenate([jnp.zeros(na - xf, FP), ramp,
                          jnp.ones(nb - xf, FP)])
    return _reramp(_blend_frames(a_ext, b_ext, wb))


def excerpt(chunk: Chunk, start: int, stop: int) -> Chunk:
    """Cut frames [start, stop) out of a chunk.  Frame-center phases stay
    mutually consistent under slicing (synthesis places frame i at
    i*thop and only relative timing between adjacent frames matters), so
    this is a plain frame-axis slice of every per-frame field."""
    return jax.tree.map(lambda x: x[start:stop], chunk)
