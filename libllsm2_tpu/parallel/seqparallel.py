"""Frame-axis ("sequence") parallelism for single very long utterances.

Round-3 verdict finding: annotating the jitted single-utterance pipeline
with frame-axis shardings was NOT real parallelism -- `pallas_call` has no
GSPMD partitioning rule, so XLA all-gathered the inputs and ran the full
kernels replicated on every device (measured: per-device flop count 0.92x
the replicated compile, i.e. no speedup at 8 devices).

This module therefore shards the frame axis explicitly with `jax.shard_map`
(SURVEY.md section 5 "long-context"): each device runs the SAME Pallas/XLA
pipeline on its contiguous block of frames, extended by halo frames
exchanged over ICI with `lax.ppermute`.  The design splits by data rate:

  * SAMPLE-RATE stages (the roofline's heavy kernels: F0 refinement,
    harmonic projection, oscillator bank + OLA residual, band envelopes,
    warped PSD) run shard-local on the halo-extended block -- per-device
    work is N/S frames + O(halo).
  * FRAME-RATE track stages (deconvolution runs local-with-halo; the
    track denoiser, whose noise statistics and frame-axis FFT are global
    by definition, runs on `lax.all_gather`-ed tracks -- [N, maxnhar]
    floats, ~160x smaller than the signal -- redundantly on every device,
    then each device keeps its rows).
  * The fundamental cycle track needs a global prefix sum: each shard
    integrates its own block and the per-shard totals are combined with
    one tiny all_gather (mod-1 arithmetic, so magnitude never grows).

Exactness: every stage is bit-faithful to the single-device pipeline
except (a) float reassociation in the distributed cycle prefix sum
(~1e-7 cycles) and (b) the band-envelope analytic filterbank, whose
brick-wall FFT masks are inherently global -- shards compute it on the
halo-extended block (overlap-save), leaving a boundary truncation error
that decays like 1/distance into the halo (measured < 1e-3 relative at
the default halos; tests/test_parallel.py pins all fields).

Reference: the upstream C library is single-threaded (SURVEY.md section
2); parallelism is a new first-class component of the rebuild.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import AnalysisOptions, SynthesisOptions
from ..container import Chunk
from ..fp import FP
from ..models import layer0
from ..ops import harmonics
from .mesh import FRAME_AXIS


# ---------------------------------------------------------------------------
# halo plumbing
# ---------------------------------------------------------------------------

def _halo(ax: str, n_sh: int, blk, h: int):
    """Exchange halos along axis `ax`: returns (left, core, right) where
    left = the previous shard's last h rows and right = the next shard's
    first h rows (zeros at the global edges -- matching the zero padding
    the single-device pipeline applies beyond the signal)."""
    if h == 0:
        return blk
    to_right = [(i, i + 1) for i in range(n_sh - 1)]
    to_left = [(i + 1, i) for i in range(n_sh - 1)]
    left = lax.ppermute(blk[-h:], ax, to_right)   # my left halo
    right = lax.ppermute(blk[:h], ax, to_left)    # my right halo
    return jnp.concatenate([left, blk, right], axis=0)


def _gather_rows(ax: str, v):
    """all_gather core rows along the frame axis -> the full [N, ...]."""
    return lax.all_gather(v, ax, axis=0, tiled=True)


def _slice_rows(v_global, i0, size: int, h: int):
    """Rows [i0-h, i0-h+size) of a global array, zero rows beyond the
    edges (the single-device pipeline's _shift_rows / frame_hops
    convention)."""
    pad = ((h, h),) + ((0, 0),) * (v_global.ndim - 1)
    return lax.dynamic_slice_in_dim(jnp.pad(v_global, pad), i0, size, 0)


def _shard_cycles(ax: str, n_sh: int, f0_ext, nhop: int, fs: float,
                  hb: int, nl: int, edge_fix: bool = True):
    """Globally consistent mod-1 cycle track for the halo-extended block.

    sample_cycles integrates from the block start; the global offset at
    this shard's CORE start is the exclusive mod-1 prefix of the per-shard
    core integrals (one all_gather of S scalars).  At the global edges the
    single-device pipeline (i) holds F0 constant over the LAST frame (the
    lerp index clamp in sample_cycles) and (ii) edge-replicates cyc beyond
    the signal (frame_hops mode="edge"); both are reproduced here."""
    idx = lax.axis_index(ax)
    is_last = idx == n_sh - 1
    n_ext = f0_ext.shape[0]
    core_s, core_e = hb * nhop, (hb + nl) * nhop

    # (i) the last shard's right-halo F0 is edge-replicated for the lerp
    # (global: t clips at the final frame -> constant F0 there)
    fr = jnp.arange(n_ext)
    f0_cyc = jnp.where(is_last & (fr >= hb + nl), f0_ext[hb + nl - 1],
                       f0_ext)
    raw = harmonics.sample_cycles(f0_cyc, nhop, fs, n_ext * nhop)

    tot = (raw[core_e] - raw[core_s]) % 1.0       # my core's cycle count
    tots = lax.all_gather(tot, ax)                # [S]
    off = jnp.sum(jnp.where(jnp.arange(n_sh) < idx, tots, 0.0)) % 1.0
    cyc = (raw - raw[core_s] + off) % 1.0

    if edge_fix:
        pos = jnp.arange(cyc.shape[0])
        cyc = jnp.where((idx == 0) & (pos < core_s), cyc[core_s], cyc)
        cyc = jnp.where(is_last & (pos >= core_e), cyc[core_e - 1], cyc)
    return cyc


# ---------------------------------------------------------------------------
# analysis
# ---------------------------------------------------------------------------

def _analyze_local(opt: AnalysisOptions, n_sh: int, n_frm: int, x_blk,
                   f0_blk):
    """Per-shard analysis body (runs INSIDE shard_map over FRAME_AXIS).

    Mirrors layer0._analyze_jit stage by stage; see the module docstring
    for which stages are halo-local vs gathered."""
    ax = FRAME_AXIS
    conf = opt.conf
    nhop = conf.nhop
    nl = f0_blk.shape[0]
    hh = -(-conf.halfwin_max // nhop)

    # halo sizes (frames): see the derivation in docs/PARITY.md "frame
    # parallelism".  ha covers F0 refinement (window + probe + decimation
    # FIR < 2 hops) plus the refine-smoothing taps; hr covers the
    # back-half's needs beyond the core (projection/envelope windows + the
    # envelope filterbank's truncation halo + OLA/PSD margins); hb covers
    # exact projection+deconv for the core (and must contain hr).
    sm = max(opt.f0_refine_smooth, 1)
    ha = hh + 2 + (sm + 1) // 2
    he = 8                                     # envelope overlap-save halo
    hr = hh + he + 2
    hb = max((2 * hh + 2) * max(1, opt.hm_passes), hr)
    # one-hop ppermute halos require EVERY halo to fit within a single
    # neighbor shard: _halo's blk[-h:] silently clamps to nl rows when
    # h > nl (JAX slicing never errors) and all downstream offsets then
    # index the wrong rows -- so guard on the MAX halo, not the min.
    if max(ha, hb) >= nl:
        raise ValueError(
            f"frame-sharded analysis needs > {max(ha, hb)} frames per "
            f"shard (halo) -- got {nl}; use fewer devices or more frames")

    # --- stage A: F0 refinement (sample-rate, halo-local) ---
    f0 = f0_blk
    if opt.f0_refine:
        x_a = _halo(ax, n_sh, x_blk, ha * nhop)
        f0_a = _halo(ax, n_sh, f0_blk, ha)
        centers_a = jnp.arange(f0_a.shape[0], dtype=jnp.int32) * nhop
        f0_ref = harmonics.refine_f0(
            x_a, f0_a, centers_a, fs=conf.fs, halfwin_max=conf.halfwin_max,
            rel_winsize=conf.rel_winsize, use_pallas=opt.use_pallas,
            nhop=nhop, f0_ceil=conf.f0_ceil)
        if sm > 1:
            voiced_m = (f0_a > 0).astype(FP)
            delta = (f0_ref - f0_a) * voiced_m
            k = jnp.ones((sm,), FP)
            num = jnp.convolve(delta, k, mode="same")
            den = jnp.maximum(jnp.convolve(voiced_m, k, mode="same"), 1.0)
            f0_ref = jnp.where(voiced_m > 0, f0_a + num / den, 0.0)
        f0 = f0_ref[ha:ha + nl]

    # --- stage B: harmonic tracks (sample-rate, halo-local) ---
    x_b = _halo(ax, n_sh, x_blk, hb * nhop)
    f0_b = _halo(ax, n_sh, f0, hb)
    n_ext = f0_b.shape[0]
    centers_b = jnp.arange(n_ext, dtype=jnp.int32) * nhop
    cyc_b = _shard_cycles(ax, n_sh, f0_b, nhop, conf.fs, hb, nl)

    if opt.hm_method != "czt":
        # documented limitation (docs/PARITY.md "Frame parallelism"): the
        # "pp" pitch-synchronous framing derives per-frame window spans
        # from the GLOBAL cycle track before framing, so its halo size is
        # data-dependent (unbounded at low F0) -- it cannot ride the
        # static one-hop ppermute halos this module uses.  czt is the
        # default and the accuracy winner (57.3 vs 28.7 dB, test_ops).
        raise ValueError(
            "frame-sharded analysis supports hm_method='czt' only; "
            f"got {opt.hm_method!r} (pp framing needs data-dependent "
            "halos -- run it single-device)")
    ampl, phse, mask = harmonics.harmonic_analysis(
        x_b, f0_b, centers_b, cyc_b, fs=conf.fs, max_k=conf.maxnhar,
        halfwin_max=conf.halfwin_max, rel_winsize=conf.rel_winsize,
        fnyq=conf.fnyq, use_pallas=opt.use_pallas,
        frame_chunk=opt.frame_chunk, nhop=nhop,
        mxu=opt.hm_kernel == "matmul")
    deconv_cplx = (opt.hm_correction == "deconv" and opt.hm_passes <= 1
                   and opt.track_denoise and opt.track_lowpass_hz <= 0.0)
    if (opt.hm_correction == "deconv" and opt.hm_passes <= 1):
        # complex handoff to the denoiser (mirrors layer0._analyze_jit:
        # both paths must take the SAME numeric route or the sharded ==
        # unsharded equality pins drift)
        ampl, phse = layer0._deconv_correction(opt, f0_b, centers_b, cyc_b,
                                               ampl, phse, mask,
                                               return_complex=deconv_cplx)
    for _pass in range(max(opt.hm_passes - 1, 0)):
        segs = harmonics.oscillator_bank(cyc_b, centers_b, ampl, phse,
                                         mask, nhop=nhop,
                                         use_pallas=opt.use_pallas)
        y_sin_b = harmonics.overlap_add_half(segs, nhop, n_ext * nhop)
        da, dp, _ = harmonics.harmonic_analysis(
            x_b - y_sin_b, f0_b, centers_b, cyc_b, fs=conf.fs,
            max_k=conf.maxnhar, halfwin_max=conf.halfwin_max,
            rel_winsize=conf.rel_winsize, fnyq=conf.fnyq,
            use_pallas=opt.use_pallas, frame_chunk=opt.frame_chunk,
            nhop=nhop, mxu=opt.hm_kernel == "matmul")
        z = ampl * jnp.exp(1j * phse) + da * jnp.exp(1j * dp)
        ampl = jnp.abs(z) * mask
        phse = jnp.angle(z) * mask

    # --- frame-rate track stages: gather, compute globally, keep my rows
    # (the denoiser's Winsorized floor statistics and frame-axis FFT are
    # global by definition; [N, K] tracks are ~nhop*2 times smaller than
    # the signal, so the gather is cheap and the redundant compute is the
    # roofline's smallest stage) ---
    sl = slice(hb, hb + nl)
    a_g = _gather_rows(ax, ampl[sl])
    p_g = _gather_rows(ax, phse[sl])
    m_g = _gather_rows(ax, mask[sl])
    f0_g = _gather_rows(ax, f0)
    cycc_g = _gather_rows(ax, cyc_b[centers_b][sl])
    cg = jnp.arange(n_frm, dtype=jnp.int32)
    if opt.track_denoise and opt.track_lowpass_hz <= 0.0:
        # when deconv_cplx, (a_g, p_g) hold the gathered raw complex
        # (re, im) track -- pass it via the complex handoff
        a_g, p_g = layer0._track_denoise(
            conf, f0_g, cycc_g, cg, a_g, p_g, m_g, opt.track_denoise_hz,
            opt.track_denoise_strength, use_pallas=opt.use_pallas,
            spectral=opt.track_denoise_spectral,
            a_spec=opt.track_spectral_strength,
            spec_decimate=opt.track_spectral_decimate,
            c_complex=(a_g, p_g) if deconv_cplx else None)
    if opt.track_lowpass_hz > 0.0:
        a_g, p_g = layer0._track_lowpass(conf, f0_g, cycc_g, cg, a_g, p_g,
                                         m_g, opt.track_lowpass_hz)

    # --- back half (sample-rate, halo-local): residual -> noise model ---
    idx = lax.axis_index(ax)
    i0 = idx * nl
    n_sl = nl + 2 * hr
    a_s = _slice_rows(a_g, i0, n_sl, hr)
    p_s = _slice_rows(p_g, i0, n_sl, hr)
    m_s = _slice_rows(m_g, i0, n_sl, hr)
    f0_s = _slice_rows(f0_g, i0, n_sl, hr)
    off = (hb - hr) * nhop
    cyc_s = lax.dynamic_slice_in_dim(cyc_b, off, n_sl * nhop, 0)
    x_s = lax.dynamic_slice_in_dim(x_b, off, n_sl * nhop, 0)
    centers_s = jnp.arange(n_sl, dtype=jnp.int32) * nhop
    nx_s = n_sl * nhop

    segs = harmonics.oscillator_bank(cyc_s, centers_s, a_s, p_s, m_s,
                                     nhop=nhop, use_pallas=opt.use_pallas)
    y_sin = harmonics.overlap_add_half(segs, nhop, nx_s)
    residual = x_s - y_sin
    # single-device convention: the residual exists only on [0, nx) -- the
    # OLA truncation drops row 0's pre-signal half segment and frame_hops
    # zero-pads beyond both ends.  Zero the out-of-global-range halo so the
    # edge shards' psd windows and envelope filterbank see the same zeros
    # (without this, row 0's dropped half-segment leaks into the first
    # shard's halo and psd rows 0-1 were off by ~25%).
    gpos = jnp.arange(nx_s) + (i0 - hr) * nhop
    residual = jnp.where((gpos < 0) | (gpos >= n_frm * nhop), 0.0, residual)

    d_env = layer0._env_decimation(conf, opt.env_decimate, nx_s)
    envs = layer0._band_envelopes(residual, conf, d_env)
    fs_d = conf.fs / d_env
    nhop_d = nhop // d_env
    centers_d = jnp.arange(n_sl, dtype=jnp.int32) * nhop_d
    cyc_d = cyc_s[::d_env]
    h_d = -(-conf.halfwin_max // d_env)

    def env_chan(env_c):
        ea, ep, _, edc = harmonics.harmonic_analysis(
            env_c, f0_s, centers_d, cyc_d, fs=fs_d, max_k=conf.maxnhar_e,
            halfwin_max=h_d, rel_winsize=conf.rel_winsize,
            fnyq=min(conf.fnyq, 0.4 * fs_d), use_pallas=opt.use_pallas,
            frame_chunk=opt.frame_chunk, nhop=nhop_d, with_dc=True)
        return edc, ea, ep

    edc, eenv_a, eenv_p = jax.vmap(env_chan)(envs)
    core = slice(hr, hr + nl)
    edc = jnp.maximum(edc, 0.0).T[core]
    eenv_a = jnp.transpose(eenv_a, (1, 0, 2))[core]
    eenv_p = jnp.transpose(eenv_p, (1, 0, 2))[core]
    psd = layer0._warped_psd(residual, centers_s, conf)[core]

    a_c = lax.dynamic_slice_in_dim(a_g, i0, nl, 0)
    p_c = lax.dynamic_slice_in_dim(p_g, i0, nl, 0)
    m_c = lax.dynamic_slice_in_dim(m_g, i0, nl, 0)
    return f0, a_c, p_c, m_c, psd, edc, eenv_a, eenv_p


def analyze_frame_sharded(opt: AnalysisOptions, x, f0, mesh) -> Chunk:
    """Single-utterance analysis with the frame/sample axes partitioned
    over the mesh's frame axis via shard_map (each device computes ONLY
    its block of frames, plus halos).  Output arrays keep the frame-axis
    sharding.  Requires nfrm % n_shards == 0 and enough frames per shard
    to cover the halos."""
    n_sh = mesh.shape[FRAME_AXIS]
    f0 = jnp.asarray(f0, FP)
    n_frm = f0.shape[0]
    assert n_frm % n_sh == 0, (n_frm, n_sh)
    nhop = opt.conf.nhop
    nx = n_frm * nhop
    x = jnp.asarray(x, FP)
    x = jnp.pad(x[:nx], (0, max(0, nx - x.shape[0])))

    fn = jax.shard_map(
        functools.partial(_analyze_local, opt, n_sh, n_frm),
        mesh=mesh, in_specs=(P(FRAME_AXIS), P(FRAME_AXIS)),
        out_specs=P(FRAME_AXIS), check_vma=False)
    f0r, ampl, phse, mask, psd, edc, eenv_a, eenv_p = jax.jit(fn)(x, f0)
    return Chunk(f0=f0r, ampl=ampl, phse=phse, hm_mask=mask, psd=psd,
                 edc=edc, eenv_a=eenv_a, eenv_p=eenv_p, conf=opt.conf)


# ---------------------------------------------------------------------------
# synthesis
# ---------------------------------------------------------------------------

def _synth_local(opt: SynthesisOptions, conf, n_sh: int, n_frm: int,
                 f0_blk, ampl, phse, hm_mask, psd, edc, eenv_a, eenv_p,
                 rd, vtmagn, vsphse):
    """Per-shard synthesis body (INSIDE shard_map over FRAME_AXIS):
    oscillator bank + OLA and the WOLA noise shaper run on the local
    frames extended by a 2-frame halo; the per-frame noise spectra are
    keyed by GLOBAL frame index (layer0._synth_noise frame_base), so the
    sharded render equals the single-device render bit-for-bit in
    distribution and to float tolerance in value."""
    ax = FRAME_AXIS
    fs = opt.fs
    nhop = int(round(conf.thop * fs))
    nl = f0_blk.shape[0]
    hs = 2
    idx = lax.axis_index(ax)
    is_last = idx == n_sh - 1

    def ext(v, edge_replicate_last=False):
        v_e = _halo(ax, n_sh, v, hs)
        if edge_replicate_last:
            # the envelope/parameter lerp holds the LAST frame constant
            # over its hop (single-device tail convention): the fake rows
            # past the global end must replicate the last real row
            rows = jnp.arange(v_e.shape[0])
            fill = jnp.reshape(v_e[hs + nl - 1],
                               (1,) + v_e.shape[1:])
            m = (rows >= hs + nl)[(slice(None),) + (None,) * (v_e.ndim - 1)]
            return jnp.where(is_last & m, fill, v_e)
        return v_e

    f0_e = ext(f0_blk, edge_replicate_last=True)
    n_ext = f0_e.shape[0]
    nx_e = n_ext * nhop
    centers_e = jnp.arange(n_ext, dtype=jnp.int32) * nhop
    cyc_e = _shard_cycles(ax, n_sh, f0_e, nhop, fs, hs, nl)

    K = ampl.shape[-1]
    kharm = jnp.arange(1, K + 1, dtype=FP)
    a_e, p_e, m_e = ext(ampl), ext(phse), ext(hm_mask)
    nyq = (kharm[None, :] * jnp.where(f0_e > 0, f0_e, 100.0)[:, None]) \
        < 0.5 * fs
    m_e = m_e * nyq

    segs = harmonics.oscillator_bank(cyc_e, centers_e, a_e, p_e, m_e,
                                     nhop=nhop, use_pallas=opt.use_pallas)
    y_sin = harmonics.overlap_add_half(segs, nhop, nx_e)

    # noise: psd rows beyond the global end stay ZERO (those frames do not
    # exist -> no band segments), while the envelope-coefficient rows are
    # edge-replicated (the lerp tail convention).  eenv_p is measured
    # CENTER-REFERENCED and _env_coefs re-references it by -2 pi k cyc at
    # each row's own center -- a plainly replicated fake row would rotate
    # differently from the last real row and the tail lerp would no longer
    # be constant (the single-device convention).  Pre-advance the fake
    # rows' phases by the center-cycle delta so the ROTATED coefficients
    # replicate exactly.
    eenv_p_e = ext(eenv_p)
    Ke = eenv_p.shape[-1]
    ke = jnp.arange(1, Ke + 1, dtype=FP)
    cyc_c = cyc_e[centers_e]
    dphi = cyc_c - cyc_c[hs + nl - 1]
    fill_p = (eenv_p_e[hs + nl - 1][None]
              + 2.0 * jnp.pi * ke[None, None, :] * dphi[:, None, None])
    rows_p = (jnp.arange(n_ext) >= hs + nl)[:, None, None]
    eenv_p_e = jnp.where(is_last & rows_p, fill_p, eenv_p_e)
    chunk_e = Chunk(
        f0=f0_e, ampl=a_e, phse=p_e, hm_mask=m_e,
        psd=ext(psd),
        edc=ext(edc, True), eenv_a=ext(eenv_a, True),
        eenv_p=eenv_p_e,
        rd=None if rd is None else ext(rd, True),
        vtmagn=None if vtmagn is None else ext(vtmagn, True),
        vsphse=None if vsphse is None else ext(vsphse),
        conf=conf)
    key = jax.random.PRNGKey(opt.noise_seed)
    y_nos = layer0._synth_noise(chunk_e, cyc_e, nx_e, key, fs, nhop,
                                use_pallas=opt.use_pallas,
                                idft=opt.noise_idft,
                                frame_base=idx * nl - hs)

    core = slice(hs * nhop, (hs + nl) * nhop)
    return y_sin[core] + y_nos[core], y_sin[core], y_nos[core]


def synthesize_frame_sharded(sopt: SynthesisOptions, chunk: Chunk, mesh):
    """Single-utterance synthesis with the frame/sample axes partitioned
    over the mesh's frame axis via shard_map (2-frame halos; per-frame
    keyed noise spectra make the render shard-count-invariant)."""
    n_sh = mesh.shape[FRAME_AXIS]
    n_frm = chunk.nfrm
    assert n_frm % n_sh == 0, (n_frm, n_sh)
    assert n_frm // n_sh > 2, "need > 2 frames per shard (halo)"
    conf = chunk.conf
    assert abs(conf.thop * sopt.fs - round(conf.thop * sopt.fs)) < 1e-6, \
        "frame-sharded synthesis needs an integral hop at the output rate"

    args = (chunk.f0, chunk.ampl, chunk.phse, chunk.hm_mask, chunk.psd,
            chunk.edc, chunk.eenv_a, chunk.eenv_p, chunk.rd, chunk.vtmagn,
            chunk.vsphse)
    specs = tuple(None if a is None else P(FRAME_AXIS) for a in args)
    fn = jax.shard_map(
        functools.partial(_synth_local, sopt, conf, n_sh, n_frm),
        mesh=mesh, in_specs=specs,
        out_specs=P(FRAME_AXIS), check_vma=False)
    y, y_sin, y_nos = jax.jit(fn)(*args)
    return layer0.SynthResult(y=y, y_sin=y_sin, y_nos=y_nos, fs=sopt.fs)
