"""Fixed-width frame coder for ML interop (reference: coder.c ->
llsm_create_coder / llsm_coder_encode / llsm_coder_decode; SURVEY.md 3.5).

Encodes a layer-1 frame into one fixed-dimension float vector -- F0,
Rd, band-envelope summary, vocal-tract magnitude resampled to a chosen
dimensionality, warped noise PSD resampled likewise -- and decodes back.
The coder is intentionally lossy in phase: decoding regenerates phases
from the vocal tract's minimum phase + LF source phase (vsphse = 0),
which is exactly what makes the vectors usable as ML model targets.

The exact upstream vector layout is marked [M] in SURVEY.md (mount was
empty); this layout covers the same information set and is documented
here as the interchange format.  Encode/decode are pure jnp pack/unpack,
vmapped over frames, jit-safe.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..fp import FP

from ..config import ChunkConf
from ..container import Chunk
from ..ops import interp
from . import layer1

LOG_FLOOR = layer1.LOG_FLOOR


@dataclasses.dataclass(frozen=True)
class CoderConfig:
    """Coder dimensions (reference: llsm_create_coder arguments).

    with_phase=True additionally packs the voice-source residual phases
    (vsphse) and envelope-harmonic phases (eenv_p), making the coder
    round trip near-lossless -- for storage/transmission rather than ML
    targets (phases are poor regression targets, which is why the
    default layout drops them; VERDICT r1 missing #6)."""
    conf: ChunkConf = ChunkConf()
    nvt: int = 64       # vocal-tract magnitude dims in the vector
    npsd_c: int = 32    # noise PSD dims in the vector
    with_phase: bool = False

    @property
    def dims(self) -> int:
        _, off, size = self.layout()[-1]
        return off + size

    def layout(self):
        """(name, start, size) triples describing the vector layout."""
        c = self.conf
        fields = [("f0", 1), ("rd", 1), ("edc", c.nchannel),
                  ("vtmagn", self.nvt), ("psd", self.npsd_c),
                  ("eenv_a", c.nchannel * c.maxnhar_e)]
        if self.with_phase:
            fields += [("eenv_p", c.nchannel * c.maxnhar_e),
                       ("vsphse", c.maxnhar)]
        out, off = [], 0
        for name, size in fields:
            out.append((name, off, size))
            off += size
        return out


def _resample_lastdim(a: jnp.ndarray, m: int) -> jnp.ndarray:
    n = a.shape[-1]
    pos = jnp.linspace(0.0, n - 1.0, m)
    return interp.interp1_uniform(a, pos)


@functools.partial(jax.jit, static_argnums=0)
def encode(coder: CoderConfig, chunk: Chunk) -> jnp.ndarray:
    """Chunk (with layer-1 parameters) -> [nfrm, coder.dims] float vectors
    (reference: coder.c -> llsm_coder_encode, applied chunk-wide)."""
    assert chunk.has_layer1, "coder encodes layer-1 chunks"
    c = coder.conf
    n = chunk.nfrm
    vt = jax.vmap(lambda v: _resample_lastdim(v, coder.nvt))(chunk.vtmagn)
    psd_log = jnp.log(jnp.maximum(chunk.psd, 1e-20))
    psd = jax.vmap(lambda v: _resample_lastdim(v, coder.npsd_c))(psd_log)
    parts = [
        chunk.f0[:, None],
        chunk.rd[:, None],
        chunk.edc,
        vt,
        psd,
        chunk.eenv_a.reshape(n, -1),
    ]
    if coder.with_phase:
        parts += [chunk.eenv_p.reshape(n, -1), chunk.vsphse]
    return jnp.concatenate(parts, axis=-1)


@functools.partial(jax.jit, static_argnums=0)
def decode_layer1(coder: CoderConfig, vectors: jnp.ndarray) -> Chunk:
    """[nfrm, dims] vectors -> layer-1 chunk (rd / vtmagn / noise model
    populated, harmonics left empty) -- for parameter-domain editing or
    pulse-by-pulse synthesis (reference: coder.c -> the layer-1 decode
    variant of llsm_coder_decode; layout [M], see module docstring)."""
    c = coder.conf
    n = vectors.shape[0]
    sl = {name: vectors[:, off:off + size]
          for name, off, size in coder.layout()}
    # vectors come from ML models, so every slot is clamped to its
    # physical range (like the Rd clamp below): unbounded log-domain
    # values overflow exp() into inf/NaN audio, negative band energies
    # break the noise path, and a fundamental above conf.f0_ceil
    # overruns the PbP path's static pulse budgets.  The bounds are
    # generous -- real encodes never bind them (encode floors psd at
    # log(1e-20) = -46.05, inside the -50 clip; round-trip tests are
    # bit-unchanged).
    f0 = jnp.clip(sl["f0"][:, 0], 0.0, c.f0_ceil)
    voiced = f0 > 0
    vtmagn = jax.vmap(lambda v: _resample_lastdim(v, c.nspec))(sl["vtmagn"])
    vtmagn = jnp.clip(vtmagn, LOG_FLOOR, 15.0)
    vtmagn = jnp.where(voiced[:, None], vtmagn, LOG_FLOOR)
    psd = jnp.exp(jnp.clip(
        jax.vmap(lambda v: _resample_lastdim(v, c.npsd))(sl["psd"]),
        -50.0, 30.0))
    K = c.maxnhar
    zk = jnp.zeros((n, K), FP)
    eenv_p = (sl["eenv_p"].reshape(n, c.nchannel, c.maxnhar_e)
              if coder.with_phase
              else jnp.zeros((n, c.nchannel, c.maxnhar_e), FP))
    vsphse = sl["vsphse"] if coder.with_phase else zk
    return Chunk(
        f0=f0, ampl=zk, phse=zk, hm_mask=zk, psd=psd,
        edc=jnp.maximum(sl["edc"], 0.0),
        eenv_a=sl["eenv_a"].reshape(n, c.nchannel, c.maxnhar_e),
        eenv_p=eenv_p,
        # vectors may come from ML models (the coder's whole purpose):
        # clamp Rd into the LF table's valid range -- log(rd<=0) would
        # NaN the entire decoded chunk
        rd=jnp.clip(sl["rd"][:, 0], layer1.RD_MIN, layer1.RD_MAX),
        vtmagn=vtmagn, vsphse=vsphse, conf=c)


@functools.partial(jax.jit, static_argnums=0)
def decode_frames(coder: CoderConfig, vectors: jnp.ndarray) -> Chunk:
    """Streaming decode: [M, dims] -> layer-0 frames ready for a
    block-by-block feed, so an acoustic model can emit coder vectors
    and the render stays phase-coherent over an unbounded stream (the
    offline `decode` propagates phases within one chunk only, which
    breaks at block seams).  The TTS-serving shape: model -> vectors ->
    decode_frames -> RTSynthesizer / StreamPool.

    Phase mode must match the coder (static, so misuse cannot be
    detected here):
      - with_phase=False (default): frames carry per-frame RELATIVE
        phases (minphase(VT) + LF source) -- feed a synthesizer built
        with phase_mode="propagate" (its fundamental-cycle carry
        replaces the chunk-level propagation).
      - with_phase=True: vsphse restores the ABSOLUTE analyzed phases
        (accumulated cycles included) -- feed the default
        phase_mode="absolute"; propagate mode would add the cycle ramp
        a second time and decohere the OLA."""
    return layer1.chunk_to_layer0(decode_layer1(coder, vectors))


@dataclasses.dataclass(frozen=True)
class Quantizer:
    """Per-slot affine integer quantizer for coder vectors (host-side
    numpy).  The reference stores coder vectors as raw FP_TYPE; for
    transmission/storage the rebuild adds an int8/int16 transport:
    code = round((v - lo) / step), v' = lo + code * step, with per-slot
    [lo, hi] fitted from data (robust percentiles so a single outlier
    frame cannot blow up every slot's step size).

    Slots that contain exact zeros (the F0 slot's unvoiced frames --
    the voiced/unvoiced DECISION) get lo forced to 0.0 so that 0
    round-trips bit-exactly and voicing is preserved.

    Slots flagged in `dpcm` are coded as closed-loop DPCM along the
    FRAME axis instead: frame 0 absolute (the [lo, hi] affine code),
    then each frame the saturating delta of the true value against the
    decoder's own reconstruction, on the fitted [dlo, dhi] delta range.
    For slowly-varying tracks this is worth the delta-range ratio in
    step size (~20-40x for Rd) at the same bit width.  Why Rd needs it:
    the LF source's harmonic PHASES move steeply with Rd near the
    source-spectrum nulls, so the 8-bit absolute step of 0.011 Rd
    de-coheres pulse shapes frame to frame (render SNR 14 dB --
    docs/STATUS.md item 34); closed-loop DPCM tracks the smooth
    (Viterbi-regularized) Rd contour to ~1e-3.

    f0_slot (round-5 fix -- without it DPCM measured WORSE than absolute
    coding: voicing-boundary Rd jumps of ~1.4 blew the fitted max-|diff|
    delta range up 100x, scripts/rate_distortion.py): index of the F0
    slot.  When set, the delta range is fitted from voiced->voiced
    consecutive diffs only, unvoiced frames are coded ABSOLUTE, and the
    closed loop re-syncs absolute at each voiced-run ONSET.  The decoder
    recovers the identical voicing flags from the decoded F0 slot (its
    zeros round-trip bit-exactly by the lo-forcing rule above), so no
    side channel is needed."""
    lo: "object"            # np.ndarray [dims] float32
    hi: "object"            # np.ndarray [dims] float32
    bits: int = 8
    dpcm: "object" = None   # np.ndarray [dims] bool, or None
    dlo: "object" = None    # np.ndarray [dims] float32 (DPCM slots)
    dhi: "object" = None
    f0_slot: "object" = None   # int, or None (legacy: no voicing resync)

    @property
    def step(self):
        import numpy as np
        levels = (1 << self.bits) - 1
        return np.maximum(self.hi - self.lo, 1e-12) / levels

    @property
    def dstep(self):
        import numpy as np
        levels = (1 << self.bits) - 1
        return np.maximum(self.dhi - self.dlo, 1e-12) / levels


def default_dpcm_mask(coder: CoderConfig):
    """Default DPCM slot selection for `fit_quantizer`: the Rd slot.
    (F0 stays absolute: its voiced<->0 voicing jumps would blow up the
    fitted delta range; every other slot is transparent at 8 bits.)"""
    import numpy as np
    mask = np.zeros(coder.dims, bool)
    for name, off, size in coder.layout():
        if name == "rd":
            mask[off:off + size] = True
    return mask


def f0_slot(coder: CoderConfig) -> int:
    """Index of the F0 slot in the coder vector (for
    fit_quantizer(f0_slot=...): voicing-aware DPCM resync)."""
    for name, off, size in coder.layout():
        if name == "f0":
            return off
    raise ValueError("coder layout has no f0 slot")


def fit_quantizer(vectors, bits: int = 8, pct: float = 0.1,
                  dpcm=None, f0_slot=None) -> Quantizer:
    """Fit per-slot ranges on a reference set of encoded vectors
    ([N, dims] or [B, N, dims]).

    dpcm: optional bool mask [dims] (see default_dpcm_mask) -- those
    slots get a delta range fitted from the frame-to-frame diffs (max
    |diff| + 25% slew headroom, symmetric) and are coded closed-loop.
    f0_slot: optional F0 slot index (see Quantizer docstring): the delta
    range is then fitted from voiced->voiced diffs only and the closed
    loop re-syncs absolute at voicing boundaries -- without this,
    voicing-boundary jumps blow the delta range up ~100x and DPCM codes
    WORSE than absolute (measured round 5)."""
    import numpy as np
    vv = np.asarray(vectors, np.float32)
    v = vv.reshape(-1, vv.shape[-1])
    lo = np.percentile(v, pct, axis=0).astype(np.float32)
    hi = np.percentile(v, 100.0 - pct, axis=0).astype(np.float32)
    has_zero = (v == 0.0).mean(axis=0) > 0.001
    lo = np.where(has_zero & (lo > 0.0), 0.0, lo)
    hi = np.maximum(hi, lo + 1e-6)
    dlo = dhi = None
    if dpcm is not None:
        dpcm = np.asarray(dpcm, bool)
        if f0_slot is not None and dpcm[int(f0_slot)]:
            # the voicing flags are recovered from the F0 slot's CODES
            # on both sides; delta-coding that slot would make the
            # decoder read deltas as absolutes and corrupt every DPCM
            # slot downstream
            raise ValueError("the f0 slot cannot itself be DPCM-coded "
                             "(it carries the voicing re-sync flags)")
        vr = vv.reshape(-1, vv.shape[-2], vv.shape[-1]) \
            if vv.ndim > 2 else vv[None]
        d = np.abs(np.diff(vr, axis=1))                  # [B, N-1, dims]
        if f0_slot is not None and d.size:
            pair_v = (vr[:, 1:, int(f0_slot)] > 0) \
                & (vr[:, :-1, int(f0_slot)] > 0)         # [B, N-1]
            d = np.where(pair_v[:, :, None], d, 0.0)
        dmax = d.max(axis=(0, 1)) if d.size else np.zeros(vv.shape[-1])
        # headroom for closed-loop slew after a saturated step; floor so
        # an all-constant slot still gets a usable (tiny) range
        r = np.maximum(1.25 * dmax, 1e-4).astype(np.float32)
        dlo, dhi = -r, r
    return Quantizer(lo=lo, hi=hi, bits=int(bits), dpcm=dpcm,
                     dlo=dlo, dhi=dhi,
                     f0_slot=None if f0_slot is None else int(f0_slot))


def _dpcm_voiced(q: Quantizer, codes_2d):
    """Voicing flags [B, N] from the coded F0 slot (decoder-side exact:
    the lo-forcing rule makes F0's zeros round-trip bit-exactly).
    Returns all-True when the quantizer has no f0_slot (legacy)."""
    import numpy as np
    if q.f0_slot is None:
        return np.ones(codes_2d.shape[:2], bool)
    s = int(q.f0_slot)
    return (q.lo[s] + codes_2d[:, :, s] * q.step[s]) > 0


def quantize(q: Quantizer, vectors):
    """[..., N, dims] float -> uint8/uint16 codes (saturating).  DPCM
    slots (q.dpcm) are coded closed-loop along the frame axis; with
    q.f0_slot set, unvoiced frames and voiced-run ONSETS are coded
    absolute (re-sync points the decoder recovers from the F0 slot)."""
    import numpy as np
    v = np.asarray(vectors, np.float32)
    levels = (1 << q.bits) - 1
    codes = np.round((np.clip(v, q.lo, q.hi) - q.lo) / q.step)
    if q.dpcm is not None and q.dpcm.any():
        m = q.dpcm
        dlo, dstep = q.dlo[m], q.dstep[m]
        flat = v.reshape(-1, *v.shape[-2:])
        out = codes.reshape(-1, *v.shape[-2:])
        voiced = _dpcm_voiced(q, out)
        # frame 0 stays the absolute code; decoder state starts there
        recon = q.lo[m] + out[:, 0][:, m] * q.step[m]
        prev_v = voiced[:, 0]
        for n in range(1, v.shape[-2]):
            use_d = (voiced[:, n] & prev_v)[:, None]
            delta = np.clip(flat[:, n][:, m] - recon, dlo, q.dhi[m])
            c = np.round((delta - dlo) / dstep)
            abs_recon = q.lo[m] + out[:, n][:, m] * q.step[m]
            out[:, n][:, m] = np.where(use_d, c, out[:, n][:, m])
            recon = np.where(use_d, recon + dlo + c * dstep, abs_recon)
            prev_v = voiced[:, n]
        codes = out.reshape(v.shape)
    return codes.astype(np.uint8 if q.bits <= 8 else np.uint16)


def dequantize(q: Quantizer, codes):
    """Codes -> float32 vectors (feedable to decode/decode_frames)."""
    import numpy as np
    c = np.asarray(codes, np.float32)
    v = (q.lo + c * q.step).astype(np.float32)
    if q.dpcm is not None and q.dpcm.any():
        m = q.dpcm
        dlo, dstep = q.dlo[m], q.dstep[m]
        flat = c.reshape(-1, *c.shape[-2:])
        out = v.reshape(-1, *c.shape[-2:])
        voiced = _dpcm_voiced(q, flat)
        recon = out[:, 0][:, m]
        prev_v = voiced[:, 0]
        for n in range(1, c.shape[-2]):
            use_d = (voiced[:, n] & prev_v)[:, None]
            recon = np.where(use_d, recon + dlo + flat[:, n][:, m] * dstep,
                             out[:, n][:, m])
            out[:, n][:, m] = recon
            prev_v = voiced[:, n]
        v = out.reshape(c.shape)
    return v


@functools.partial(jax.jit, static_argnums=0)
def decode(coder: CoderConfig, vectors: jnp.ndarray) -> Chunk:
    """[nfrm, dims] vectors -> layer-0 chunk ready for llsm_synthesize
    (reference: coder.c -> llsm_coder_decode, layer-0 variant):
    regenerates harmonic amplitudes/phases from the decoded layer-1
    parameters and restores inter-frame phase coherence."""
    chunk = layer1.chunk_to_layer0(decode_layer1(coder, vectors))
    if coder.with_phase:
        # vsphse was measured against the ABSOLUTE analyzed phases, so
        # minphase(VT) + LF phase + vsphse reconstructs them exactly --
        # propagating again would corrupt the restored coherence
        return chunk
    # phases in the decoded chunk are per-frame relative (vsphse = 0);
    # propagate to restore inter-frame coherence for synthesis
    from ..container import phase_propagate
    return phase_propagate(chunk, +1)
