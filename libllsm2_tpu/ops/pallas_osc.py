"""Pallas TPU kernels for the additive-synthesis hot paths.

The harmonic projection and oscillator bank are the pipeline's hot loops
(reference: layer0.c analysis frame loop / sinusoidal synthesis;
SURVEY.md 3.1/3.2).  The jnp formulation materializes a
[frames, harmonics, samples] cosine tensor in HBM between the
transcendental and the contraction; these kernels keep the whole harmonic
accumulation in VMEM: each grid step loads one block of frames' cycle
offsets and harmonic coefficients and writes only the finished block --
HBM traffic drops from O(N*K*T) to O(N*(K+T)).

Mosaic-specific design points:
  - no per-harmonic transcendentals: e^{2j pi k dc} is built by a complex
    rotation recurrence z^{k+1} = z^k * z from one cos/sin of the base
    angle, so the inner loop is pure VPU mul/adds.  cos(2 pi k dc + phi)
    = cos(phi) Re z^k - sin(phi) Im z^k, with a*cos(phi), a*sin(phi)
    folded into [K, N]-layout coefficients on the host side;
  - the harmonic loop is a fori_loop over sublane-aligned chunks of 8
    rows (pl.ds with a provable multiple-of-8 start) with a static
    8-step unroll inside -- no dynamic lane indexing, bounded VMEM;
  - blocks keep the lane dimension either 128-aligned or equal to the
    full array dimension, per the TPU lowering rules;
  - DATA-ADAPTIVE WORK SKIPPING (round 2): the pitch-synchronous window
    is 2*halfwidth+1 ~ 1/f0 samples wide and only fnyq/f0 harmonics are
    live, but the static shapes are sized for f0_floor -- for typical
    speech F0s most of the static [W, K] rectangle is masked zeros.
    Callers pass each frame's active window interval [lo, hi) (and, for
    the oscillator bank, its live-harmonic count); per-frame-block
    bounds go in via scalar prefetch (SMEM), and the kernels skip whole
    window blocks (@pl.when) / truncate the carry-based harmonic loop.
    Work scales with the actual f0 instead of f0_floor with zero
    accuracy change (skipped work is provably zero-masked).  Measured
    v5e pitfall, do not reintroduce: a DYNAMIC trip count on a fori_loop
    whose body writes ref[pl.ds(...)] lowers ~30x slower (dynamic
    sublane offsets); the projection kernel therefore keeps its harmonic
    loop static and only the register-carry oscillator kernel uses a
    dynamic bound.

Both kernels fall back to interpreter mode off-TPU so CPU tests exercise
identical code paths.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FRAME_BLOCK = 128   # frames per grid step; also the coefficient lane block
KCHUNK = 8          # harmonic rows per fori_loop step (sublane tile)
W_BLOCK = 256       # window-sample chunk for the projection kernel.
                    # Do not shrink to 128: the finer [lo, hi) skip
                    # granularity loses more to per-grid-step overhead
                    # than it saves (measured -12% end-to-end on v5e,
                    # round 2)
TWO_PI = 6.283185307179586


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _block_max(v: jnp.ndarray, n: int, block: int, fill) -> jnp.ndarray:
    """Per-frame-block maxima [n_blocks] of a per-frame int array [N]."""
    pad = (-n) % block
    vp = jnp.pad(v.astype(jnp.int32), (0, pad), constant_values=fill)
    return jnp.max(vp.reshape(-1, block), axis=1)


def _block_min(v: jnp.ndarray, n: int, block: int, fill) -> jnp.ndarray:
    pad = (-n) % block
    vp = jnp.pad(v.astype(jnp.int32), (0, pad), constant_values=fill)
    return jnp.min(vp.reshape(-1, block), axis=1)


def _osc_kernel(klb_ref, dc_ref, ar_ref, ai_ref, out_ref):
    """One grid step: [F, T] segments from [K, F] rotated coefficients."""
    i = pl.program_id(0)
    ang = TWO_PI * dc_ref[:]           # [F, T]
    zr = jnp.cos(ang)
    zi = jnp.sin(ang)

    def chunk(j, carry):
        wr, wi, acc = carry
        base = pl.multiple_of(j * KCHUNK, KCHUNK)
        arc = ar_ref[pl.ds(base, KCHUNK), :]    # [8, F]
        aic = ai_ref[pl.ds(base, KCHUNK), :]
        for k in range(KCHUNK):                 # static unroll
            acc = acc + arc[k, :][:, None] * wr - aic[k, :][:, None] * wi
            nwr = wr * zr - wi * zi
            wi = wr * zi + wi * zr
            wr = nwr
        return wr, wi, acc

    # z^1 enters the loop: slot k holds harmonic (k+1).  Trip count comes
    # from the live-harmonic maximum of this frame block (slots beyond it
    # have zero coefficients, so skipping them changes nothing).
    nchunks = (klb_ref[i] + (KCHUNK - 1)) // KCHUNK
    init = (zr, zi, jnp.zeros_like(zr))
    _, _, acc = jax.lax.fori_loop(0, nchunks, chunk, init)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("block",))
def osc_bank_pallas(dc: jnp.ndarray, ampl: jnp.ndarray, phse: jnp.ndarray,
                    mask: jnp.ndarray, kl: jnp.ndarray | None = None,
                    block: int = FRAME_BLOCK) -> jnp.ndarray:
    """Fused oscillator bank: sum_k a_k cos(2 pi (k+1) dc + phi_k).

    dc [N, T] (cycle offsets, any mod-1 representative), ampl/phse/mask
    [N, K] -> segments [N, T] (no OLA window applied).  kl [N] (optional)
    = per-frame live-harmonic count; harmonics beyond it must be
    zero-masked (they are skipped).
    """
    N, T = dc.shape
    K = ampl.shape[1]
    Kp = _round_up(K, KCHUNK)
    a = (ampl * mask).astype(jnp.float32)
    ar = (a * jnp.cos(phse)).T.astype(jnp.float32)   # [K, N]
    ai = (a * jnp.sin(phse)).T.astype(jnp.float32)
    pad = (-N) % block
    dc = jnp.pad(dc, ((0, pad), (0, 0)))
    ar = jnp.pad(ar, ((0, Kp - K), (0, pad)))        # zero coef = no-op rows
    ai = jnp.pad(ai, ((0, Kp - K), (0, pad)))
    Np = N + pad
    if kl is None:
        klb = jnp.full((Np // block,), K, jnp.int32)
    else:
        klb = _block_max(jnp.clip(kl, 1, K), N, block, fill=1)
    out = pl.pallas_call(
        _osc_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Np // block,),
            in_specs=[
                pl.BlockSpec((block, T), lambda i, *_: (i, 0)),
                pl.BlockSpec((Kp, block), lambda i, *_: (0, i)),
                pl.BlockSpec((Kp, block), lambda i, *_: (0, i)),
            ],
            out_specs=pl.BlockSpec((block, T), lambda i, *_: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((Np, T), jnp.float32),
        interpret=_interpret(),
    )(klb, dc.astype(jnp.float32), ar, ai)
    return out[:N]


def _proj_win_kernel(klb_ref, lob_ref, hib_ref, hw_ref, dc_ref, fr_ref,
                     re_ref, im_ref, ws_ref, xs_ref, *, center, coefs):
    """Fused-window projection grid step (i, jw).

    Same harmonic accumulation as _proj_kernel, but the pitch-synchronous
    window is EVALUATED INSIDE the kernel from each frame's halfwidth
    (cosine-series w(u), compact support), and its sum is accumulated as a
    third output.  This removes three [N, W]-sized HBM round trips per
    projection pass (window materialization, the xw multiply, and the
    separate wsum reduction) -- the "framing+window bookkeeping" that
    dominated the projection stage beyond the 2.4 ms kernel (round-2
    profile, docs/STATUS.md).

    LIVE-HARMONIC CHUNK SKIPPING (round 3): only fnyq/f0 harmonic slots
    are live, so for typical speech F0s the top chunks of the static
    K-loop compute values the caller masks to zero anyway.  klb gives
    each frame block's live-slot maximum; the k-loop is a PYTHON-unrolled
    sequence of KCHUNK-row chunks, each predicated by @pl.when(base <
    klb[i]) with a STATIC store offset -- a dynamic fori_loop trip count
    over ref[pl.ds(...)] stores is the measured ~30x Mosaic pitfall this
    sidesteps (module docstring).  The z^k rotation carry crosses skipped
    chunks via one unconditional z^KCHUNK multiply per chunk (z^KCHUNK
    built by squaring), ~6 flops/elem vs the ~8*KCHUNK a live chunk
    costs.  Skipped rows stay at the jw==0 zero-init; callers mask those
    slots regardless, so the skip is exact.

    Rounding note: the squared z^KCHUNK carry changed the rounding of the
    ACROSS-chunk recurrence for ALL callers (including kl=None) relative
    to the pre-skip kernel, which carried the value after KCHUNK
    sequential rotation multiplies -- so bit-exactness regressions must
    not be written against pre-change outputs (covered by the
    fused-vs-unfused atol=2e-3 equality test)."""
    i = pl.program_id(0)
    jw = pl.program_id(1)
    wblock = dc_ref.shape[1]

    @pl.when(jw == 0)
    def _():
        re_ref[:] = jnp.zeros_like(re_ref)
        im_ref[:] = jnp.zeros_like(im_ref)
        ws_ref[:] = jnp.zeros_like(ws_ref)
        xs_ref[:] = jnp.zeros_like(xs_ref)

    @pl.when(((jw + 1) * wblock > lob_ref[i]) & (jw * wblock < hib_ref[i]))
    def _():
        hw = hw_ref[0, :]                                   # [F]
        noff = (jw * wblock - center
                + jax.lax.broadcasted_iota(jnp.int32, (1, wblock), 1)
                ).astype(jnp.float32)
        u = (noff / hw[:, None] + 1.0) * 0.5                # [F, Wb]
        w = jnp.full_like(u, coefs[0])
        for m in range(1, len(coefs)):
            w = w + coefs[m] * jnp.cos((TWO_PI * m) * u)
        w = jnp.where((u >= 0.0) & (u <= 1.0), w, 0.0)
        xw = fr_ref[:] * w
        ws_ref[:] = ws_ref[:] + jnp.sum(w, axis=-1)[None, :]
        # k = 0 row (sum of the windowed signal): callers derive the
        # windowed DC as xs/ws -- replaces layer0's separate gather-based
        # _windowed_dc pass in the noise-envelope analysis
        xs_ref[:] = xs_ref[:] + jnp.sum(xw, axis=-1)[None, :]
        ang = TWO_PI * dc_ref[:]
        zr = jnp.cos(ang)
        zi = jnp.sin(ang)
        K = re_ref.shape[0]
        kb = klb_ref[i]

        # z^KCHUNK by repeated squaring: the across-chunk carry step
        zcr, zci = zr, zi
        nsq = KCHUNK.bit_length() - 1
        assert (1 << nsq) == KCHUNK, "KCHUNK must be a power of two"
        for _ in range(nsq):
            nzcr = zcr * zcr - zci * zci
            zci = 2.0 * zcr * zci
            zcr = nzcr

        wr, wi = zr, zi                   # z^1: slot k holds harmonic k+1
        nchunks = K // KCHUNK
        for j in range(nchunks):

            @pl.when(j * KCHUNK < kb)
            def _(j=j, wr=wr, wi=wi):
                res, ims = [], []
                for _ in range(KCHUNK):
                    res.append(jnp.sum(wr * xw, axis=-1))
                    ims.append(-jnp.sum(wi * xw, axis=-1))
                    nwr = wr * zr - wi * zi
                    wi = wr * zi + wi * zr
                    wr = nwr
                re_ref[pl.ds(j * KCHUNK, KCHUNK), :] += jnp.stack(res)
                im_ref[pl.ds(j * KCHUNK, KCHUNK), :] += jnp.stack(ims)

            if j + 1 < nchunks:           # carry across (possibly skipped)
                nwr = wr * zcr - wi * zci
                wi = wr * zci + wi * zcr
                wr = nwr


@functools.partial(jax.jit, static_argnames=("max_k", "center", "window",
                                             "block", "wblock"))
def harmonic_project_win_pallas(dc: jnp.ndarray, frames: jnp.ndarray,
                                hw: jnp.ndarray, max_k: int,
                                lo: jnp.ndarray, hi: jnp.ndarray,
                                *, center: int, window: str = "hanning",
                                kl: jnp.ndarray | None = None,
                                block: int = FRAME_BLOCK,
                                wblock: int = W_BLOCK):
    """Fused window + projection: returns (re [N,K], im [N,K], wsum [N],
    xsum [N]) with re+j*im = sum_w frames[w]*win(w)*exp(-2j pi (k+1) dc[w]),
    wsum = sum_w win(w) and xsum = sum_w frames[w]*win(w) (the k=0 row),
    where win is the cosine-series window `window` centered at buffer
    position `center` with per-frame halfwidth hw.
    Entries of `frames` outside each frame's support need NOT be zeroed
    (the in-kernel window mask handles it); lo/hi give the per-frame
    active interval for whole-block skipping as in harmonic_project_pallas.
    kl [N] (optional) = per-frame live-harmonic slot count; slots >= the
    per-block maximum are skipped and returned as EXACT ZEROS (callers
    must mask those slots anyway -- they do, via the fnyq/voicing mask).
    """
    from .windows import COSINE_SERIES
    coefs = tuple(float(c) for c in COSINE_SERIES[window])
    N, W = dc.shape
    Kp = _round_up(max_k, KCHUNK)
    npad = (-N) % block
    wpad = (-W) % wblock
    dc = jnp.pad(dc, ((0, npad), (0, wpad)))
    fr = jnp.pad(frames, ((0, npad), (0, wpad)))
    # padded frames carry hw=2 and zero data -> zero contribution
    # ([1, Np] layout: frames in lanes, sublane block size 1 == full dim)
    hwp = jnp.pad(hw.astype(jnp.float32), (0, npad),
                  constant_values=2.0)[None, :]
    Np, Wp = N + npad, W + wpad
    nb = Np // block
    lob = _block_min(jnp.clip(lo, 0, W), N, block, fill=W)
    hib = _block_max(jnp.clip(hi, 0, W), N, block, fill=0)
    if kl is None:
        klb = jnp.full((nb,), Kp, jnp.int32)
    else:
        klb = _block_max(jnp.clip(kl, 0, max_k), N, block, fill=0)
    re, im, ws, xs = pl.pallas_call(
        functools.partial(_proj_win_kernel, center=center, coefs=coefs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nb, Wp // wblock),
            in_specs=[
                pl.BlockSpec((1, block), lambda i, jw, *_: (0, i)),
                pl.BlockSpec((block, wblock), lambda i, jw, *_: (i, jw)),
                pl.BlockSpec((block, wblock), lambda i, jw, *_: (i, jw)),
            ],
            out_specs=(
                pl.BlockSpec((Kp, block), lambda i, jw, *_: (0, i)),
                pl.BlockSpec((Kp, block), lambda i, jw, *_: (0, i)),
                pl.BlockSpec((1, block), lambda i, jw, *_: (0, i)),
                pl.BlockSpec((1, block), lambda i, jw, *_: (0, i)),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Kp, Np), jnp.float32),
            jax.ShapeDtypeStruct((Kp, Np), jnp.float32),
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
        ),
        interpret=_interpret(),
    )(klb, lob, hib, hwp, dc.astype(jnp.float32), fr.astype(jnp.float32))
    return re[:max_k].T[:N], im[:max_k].T[:N], ws[0, :N], xs[0, :N]


def _env_kernel(cyc_ref, e0_ref, e1_ref, b0_ref, b1_ref, r0_ref, r1_ref,
                i0_ref, i1_ref, env_ref, base_ref, *, C, Ke):
    """One frame block: render per-channel temporal noise envelopes.

    env[c, f, t] = lerp(edc) + sum_k lerp(ar)*cos(2 pi (k+1) cyc)
                               - lerp(ai)*sin(...)
    where lerp interpolates the per-frame coefficients (a0 -> a1) across
    the hop.  The small [F, C]/[F, C*Ke] coefficient blocks broadcast
    against the [F, T] sample grid entirely in VMEM -- the jnp reference
    materializes [nx, C, Ke] HBM tensors with 4-wide lanes (3% lane
    utilization), which made envelope rendering the dominant synthesis
    cost (round-2 profile, docs/STATUS.md)."""
    T = cyc_ref.shape[1]
    t = (jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
         ).astype(jnp.float32) * (1.0 / T)
    ph = TWO_PI * cyc_ref[:]
    c1 = jnp.cos(ph)
    s1 = jnp.sin(ph)

    def lerp(a0_ref, a1_ref, j):
        a0 = a0_ref[:, j:j + 1]
        return a0 + (a1_ref[:, j:j + 1] - a0) * t

    for c in range(C):
        edc = lerp(e0_ref, e1_ref, c)
        acc = edc
        wr, wi = c1, s1
        for k in range(Ke):
            ck = c * Ke + k
            acc = acc + lerp(r0_ref, r1_ref, ck) * wr \
                - lerp(i0_ref, i1_ref, ck) * wi
            nwr = wr * c1 - wi * s1
            wi = wr * s1 + wi * c1
            wr = nwr
        env_ref[c, :, :] = jnp.maximum(acc, 0.0)
        base_ref[c, :, :] = jnp.maximum(lerp(b0_ref, b1_ref, c), 1e-8)


@functools.partial(jax.jit, static_argnames=("block",))
def env_render_pallas(cyc: jnp.ndarray, edc: jnp.ndarray, ar: jnp.ndarray,
                      ai: jnp.ndarray, base: jnp.ndarray,
                      block: int = FRAME_BLOCK):
    """Fused envelope render: cyc [N*nhop] (mod-1 cycle track), edc [N, C],
    ar/ai [N, C, Ke] (rotated envelope-harmonic coefficients, already
    voicing-masked), base [N, C] (the unit-RMS modulator normalizer
    sqrt(edc^2 + sum a^2/2)) -> (env [C, N*nhop], base [C, N*nhop]).

    Sample t of frame i interpolates the coefficients of frames i and i+1
    (the last frame extends constant), matching layer0._render_envelopes'
    frame-structured lerp exactly."""
    N, C, Ke = ar.shape
    nhop = cyc.shape[0] // N
    cyc_hb = cyc.reshape(N, nhop).astype(jnp.float32)

    def pair(a):  # (a[i], a[i+1]) rows, last row constant-extended
        flat = a.reshape(N, -1).astype(jnp.float32)
        return flat, jnp.concatenate([flat[1:], flat[-1:]], axis=0)

    e0, e1 = pair(edc)
    b0, b1 = pair(base)
    r0, r1 = pair(ar)
    i0, i1 = pair(ai)
    pad = (-N) % block
    if pad:
        cyc_hb = jnp.pad(cyc_hb, ((0, pad), (0, 0)))
        e0, e1, b0, b1, r0, r1, i0, i1 = (
            jnp.pad(a, ((0, pad), (0, 0)))
            for a in (e0, e1, b0, b1, r0, r1, i0, i1))
    Np = N + pad
    env, base_o = pl.pallas_call(
        functools.partial(_env_kernel, C=C, Ke=Ke),
        grid=(Np // block,),
        in_specs=[
            pl.BlockSpec((block, nhop), lambda i: (i, 0)),
            pl.BlockSpec((block, C), lambda i: (i, 0)),
            pl.BlockSpec((block, C), lambda i: (i, 0)),
            pl.BlockSpec((block, C), lambda i: (i, 0)),
            pl.BlockSpec((block, C), lambda i: (i, 0)),
            pl.BlockSpec((block, C * Ke), lambda i: (i, 0)),
            pl.BlockSpec((block, C * Ke), lambda i: (i, 0)),
            pl.BlockSpec((block, C * Ke), lambda i: (i, 0)),
            pl.BlockSpec((block, C * Ke), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((C, block, nhop), lambda i: (0, i, 0)),
            pl.BlockSpec((C, block, nhop), lambda i: (0, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((C, Np, nhop), jnp.float32),
            jax.ShapeDtypeStruct((C, Np, nhop), jnp.float32),
        ),
        interpret=_interpret(),
    )(cyc_hb, e0, e1, b0, b1, r0, r1, i0, i1)
    return (env[:, :N].reshape(C, N * nhop),
            base_o[:, :N].reshape(C, N * nhop))


def _noise_mod_kernel(cyc_ref, e0_ref, e1_ref, b0_ref, b1_ref, r0_ref,
                      r1_ref, i0_ref, i1_ref, cur_ref, nxt_ref, out_ref,
                      *, C, Ke):
    """One frame block: envelope render + band OLA + modulation + band
    sum, fused.  cur/nxt [C, F, nhop] hold each band's WOLA segment
    halves aligned to hop blocks (hop i = seg_i[nhop:] + seg_{i+1}[:nhop]);
    out[f, t] = sum_c (cur[c] + nxt[c]) * max(env_c, 0)/max(edc_c, 1e-8).
    Extends _env_kernel so the [C, nx] env/base tensors and per-band OLA
    signals never touch HBM."""
    T = cyc_ref.shape[1]
    t = (jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
         ).astype(jnp.float32) * (1.0 / T)
    ph = TWO_PI * cyc_ref[:]
    c1 = jnp.cos(ph)
    s1 = jnp.sin(ph)

    def lerp(a0_ref, a1_ref, j):
        a0 = a0_ref[:, j:j + 1]
        return a0 + (a1_ref[:, j:j + 1] - a0) * t

    acc = jnp.zeros_like(c1)
    for c in range(C):
        edc = lerp(e0_ref, e1_ref, c)
        env = edc
        wr, wi = c1, s1
        for k in range(Ke):
            ck = c * Ke + k
            env = env + lerp(r0_ref, r1_ref, ck) * wr \
                - lerp(i0_ref, i1_ref, ck) * wi
            nwr = wr * c1 - wi * s1
            wi = wr * s1 + wi * c1
            wr = nwr
        base = lerp(b0_ref, b1_ref, c)
        ratio = jnp.maximum(env, 0.0) / jnp.maximum(base, 1e-8)
        acc = acc + (cur_ref[c, :, :] + nxt_ref[c, :, :]) * ratio
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("block",))
def noise_mod_ola_pallas(cyc: jnp.ndarray, edc: jnp.ndarray,
                         ar: jnp.ndarray, ai: jnp.ndarray,
                         base: jnp.ndarray, segs: jnp.ndarray,
                         block: int = FRAME_BLOCK) -> jnp.ndarray:
    """Fused noise-band OLA + temporal-envelope modulation + band sum.

    cyc [N*nhop] mod-1 cycle track; edc [N, C], ar/ai [N, C, Ke]
    (rotated, voicing-masked envelope coefficients, as env_render_pallas);
    segs [C, N, 2*nhop] = per-band WOLA noise segments (synthesis window
    already applied).  Returns y [N*nhop] =
    sum_c OLA(segs[c]) * env_c / base_c, identical to
    overlap_add_half + env/base modulation in layer0._synth_noise."""
    N, C, Ke = ar.shape
    nhop = cyc.shape[0] // N
    cyc_hb = cyc.reshape(N, nhop).astype(jnp.float32)
    cur = segs[:, :, nhop:].astype(jnp.float32)         # [C, N, nhop]
    nxt = jnp.concatenate([segs[:, 1:, :nhop],
                           jnp.zeros((C, 1, nhop), segs.dtype)],
                          axis=1).astype(jnp.float32)

    def pair(a):
        flat = a.reshape(N, -1).astype(jnp.float32)
        return flat, jnp.concatenate([flat[1:], flat[-1:]], axis=0)

    e0, e1 = pair(edc)
    b0, b1 = pair(base)
    r0, r1 = pair(ar)
    i0, i1 = pair(ai)
    pad = (-N) % block
    if pad:
        cyc_hb = jnp.pad(cyc_hb, ((0, pad), (0, 0)))
        cur = jnp.pad(cur, ((0, 0), (0, pad), (0, 0)))
        nxt = jnp.pad(nxt, ((0, 0), (0, pad), (0, 0)))
        e0, e1, b0, b1, r0, r1, i0, i1 = (
            jnp.pad(a, ((0, pad), (0, 0)))
            for a in (e0, e1, b0, b1, r0, r1, i0, i1))
    Np = N + pad
    y = pl.pallas_call(
        functools.partial(_noise_mod_kernel, C=C, Ke=Ke),
        grid=(Np // block,),
        in_specs=[
            pl.BlockSpec((block, nhop), lambda i: (i, 0)),
            pl.BlockSpec((block, C), lambda i: (i, 0)),
            pl.BlockSpec((block, C), lambda i: (i, 0)),
            pl.BlockSpec((block, C), lambda i: (i, 0)),
            pl.BlockSpec((block, C), lambda i: (i, 0)),
            pl.BlockSpec((block, C * Ke), lambda i: (i, 0)),
            pl.BlockSpec((block, C * Ke), lambda i: (i, 0)),
            pl.BlockSpec((block, C * Ke), lambda i: (i, 0)),
            pl.BlockSpec((block, C * Ke), lambda i: (i, 0)),
            pl.BlockSpec((C, block, nhop), lambda i: (0, i, 0)),
            pl.BlockSpec((C, block, nhop), lambda i: (0, i, 0)),
        ],
        out_specs=pl.BlockSpec((block, nhop), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Np, nhop), jnp.float32),
        interpret=_interpret(),
    )(cyc_hb, e0, e1, b0, b1, r0, r1, i0, i1, cur, nxt)
    return y[:N].reshape(N * nhop)


def _deconv_full_kernel(a_p, a_c, a_n, p_p, p_c, p_n, cy_p, cy_c, cy_n,
                        hw_ref, eq_p, eq_c, eq_n, oa_ref, op_ref,
                        *, D, nhop, stride, nq):
    """Whole amplitude-track deconvolution in one grid step (layer0.
    _deconv_correction, Pallas path): builds the T/X bands from the
    per-frame halfwidth and the cyc-modulated quadrature field, forms the
    phase-aligned complex tracks of this block and its neighbors from raw
    (ampl, phse, cyc_c), applies the banded Neumann step 2c - Sc with
    k +- 1 lane shifts, and converts back to (ampl, phse) -- nothing but
    the raw chunk fields and two tiny per-frame vectors ever reach HBM."""
    F, K = a_c.shape
    FH = F + 2 * D
    kh = (jax.lax.broadcasted_iota(jnp.int32, (1, K), 1) + 1
          ).astype(jnp.float32)

    # ONE haloed copy of each input covering frames [-D, F+D): every
    # band offset below reads rows of these instead of re-concatenating
    # shifted prev/cur/next views per d (which cost 2*(2D+1) sublane
    # relayouts of [F, K] arrays -- the kernel ran at ~2.5% of VPU peak
    # with the shifts, not the math, dominating).
    def halo(prev, cur, nxt):
        return jnp.concatenate([prev[F - D:], cur[:], nxt[:D]], 0)

    ah = halo(a_p, a_c, a_n)                                 # [FH, K]
    ph_h = halo(p_p, p_c, p_n)
    cy_h = halo(cy_p, cy_c, cy_n)
    eq_h = halo(eq_p, eq_c, eq_n)                            # [FH, 2nq]

    # phase-aligned complex tracks on the halo:
    # c' = a e^{j phi} e^{-2 pi j k cyc}, mod-1 phase argument
    ph = ph_h / TWO_PI - cy_h * kh
    ph = ph - jnp.round(ph)
    ang = TWO_PI * ph
    vre_h = ah * jnp.cos(ang)                                # [FH, K]
    vim_h = ah * jnp.sin(ang)
    cre_c = vre_h[D:D + F]
    cim_c = vim_h[D:D + F]

    # T/X bands for this block's frames: P[f, d, q] = w_i * w_ola at the
    # stride-quadrature points; X modulates by e^{2 pi j cyc(n)} whose
    # quadrature field eq comes in per frame row (halo rows f + d)
    r = (-nhop + (jax.lax.broadcasted_iota(jnp.int32, (1, nq), 1)
                  .astype(jnp.float32) + 0.5) * stride)      # [1, nq]
    w_ola = 0.5 + 0.5 * jnp.cos((jnp.pi / nhop) * r)         # [1, nq]
    hw = hw_ref[:]                                           # [F, 1]
    t_acc = jnp.zeros((F, 1), jnp.float32)
    tb_all = []
    xr_all = []
    xi_all = []
    for j, d in enumerate(range(-D, D + 1)):
        u = ((d * nhop + r) / hw + 1.0) * 0.5                # [F, nq]
        w = jnp.where((u >= 0.0) & (u <= 1.0),
                      0.5 - 0.5 * jnp.cos(TWO_PI * u), 0.0)
        P = w * w_ola                                        # [F, nq]
        er = eq_h[j:j + F, :nq]
        ei = eq_h[j:j + F, nq:]
        tb = jnp.sum(P, axis=-1, keepdims=True)              # [F, 1]
        xr = jnp.sum(P * er, axis=-1, keepdims=True)
        xi = jnp.sum(P * ei, axis=-1, keepdims=True)
        t_acc = t_acc + tb
        tb_all.append(tb)
        xr_all.append(xr)
        xi_all.append(xi)
    inv = 1.0 / jnp.maximum(t_acc, 1e-9)                     # 1/wsum

    # The banded matvec  out[f] = sum_d coeff[f, d] * v[f + d]  becomes
    # SIX small MXU matmuls against banded [F, FH] coefficient matrices
    # B[f, f + d] = coeff[f, d] built with iota masks -- no per-band
    # frame shifts, no VPU accumulation loop.  (X v and conj(X) v share
    # the same four real products, recombined below.)  The k +- 1 lane
    # shifts stay hoisted to the end: the coefficients are per-frame
    # scalars, so they commute with the shift.
    rows = jax.lax.broadcasted_iota(jnp.int32, (F, FH), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (F, FH), 1)
    delta = cols - rows                                      # band index
    zfh = jnp.zeros((F, FH), jnp.float32)
    bt = zfh
    bxr = zfh
    bxi = zfh
    for j in range(2 * D + 1):
        sel = delta == j
        bt = bt + jnp.where(sel, tb_all[j] * inv, 0.0)
        bxr = bxr + jnp.where(sel, xr_all[j] * inv, 0.0)
        bxi = bxi + jnp.where(sel, xi_all[j] * inv, 0.0)

    def mm(bmat, v):
        return jax.lax.dot_general(
            bmat, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    tr = mm(bt, vre_h)
    ti = mm(bt, vim_h)
    uxr = mm(bxr, vre_h)
    uxi = mm(bxr, vim_h)
    vxr = mm(bxi, vre_h)
    vxi = mm(bxi, vim_h)
    z = jnp.zeros((F, 1), jnp.float32)

    def up(a):
        return jnp.concatenate([a[:, 1:], z], 1)

    def dn(a):
        return jnp.concatenate([z, a[:, :-1]], 1)

    sm_re = tr + up(uxr - vxi) + dn(uxr + vxi)
    sm_im = ti + up(uxi + vxr) + dn(uxi - vxr)
    c2_re = 2.0 * cre_c - sm_re
    c2_im = 2.0 * cim_c - sm_im
    # un-align in-kernel (multiply by e^{+2 pi j k cyc}); the amplitude/
    # phase conversion happens on the host (Mosaic has no atan2 lowering)
    pha = cy_c[:] * kh
    pha = pha - jnp.round(pha)
    ang_a = TWO_PI * pha
    ur = jnp.cos(ang_a)
    ui = jnp.sin(ang_a)
    oa_ref[:] = c2_re * ur - c2_im * ui
    op_ref[:] = c2_re * ui + c2_im * ur


@functools.partial(jax.jit, static_argnames=("D", "nhop", "stride",
                                             "block"))
def deconv_full_pallas(ampl: jnp.ndarray, phse: jnp.ndarray,
                       cyc_c: jnp.ndarray, hw: jnp.ndarray,
                       eq_re: jnp.ndarray, eq_im: jnp.ndarray,
                       D: int, nhop: int, stride: int,
                       block: int = FRAME_BLOCK):
    """Fused amplitude-track deconvolution: (ampl, phse) [N, K] (masked),
    cyc_c [N] (mod-1 cycle at frame centers), hw [N] (window halfwidth),
    eq_re/eq_im [N, nq] (e^{2 pi j cyc} at the band-quadrature points of
    each frame's hop) -> the corrected complex harmonics (re, im) [N, K]
    in the UNALIGNED (absolute-phase) domain; the caller converts to
    (ampl, phse) and re-masks (Mosaic has no atan2 lowering)."""
    N, K = ampl.shape
    nq = eq_re.shape[1]
    pad = (-N) % block
    Np = N + pad

    def padded3(a):
        a2 = a.reshape(N, -1).astype(jnp.float32)
        return jnp.pad(a2, ((block, pad + block), (0, 0)))

    # each padded3 array is passed THREE times below with index maps
    # i / i+1 / i+2: the triplicated operands are offset views into ONE
    # haloed array (prev / center / next frame block), not three buffers
    a3 = padded3(ampl)
    p3 = padded3(phse)
    cy3 = padded3(cyc_c)
    eq3 = padded3(jnp.concatenate(
        [eq_re.astype(jnp.float32), eq_im.astype(jnp.float32)], axis=1))
    hwp = jnp.pad(hw.astype(jnp.float32), (0, pad),
                  constant_values=2.0)[:, None]
    nb = Np // block

    def spec3(width):
        return [pl.BlockSpec((block, width), lambda i: (i, 0)),
                pl.BlockSpec((block, width), lambda i: (i + 1, 0)),
                pl.BlockSpec((block, width), lambda i: (i + 2, 0))]

    out_a, out_p = pl.pallas_call(
        functools.partial(_deconv_full_kernel, D=D, nhop=nhop,
                          stride=stride, nq=nq),
        grid=(nb,),
        in_specs=(spec3(K) + spec3(K) + spec3(1)
                  + [pl.BlockSpec((block, 1), lambda i: (i, 0))]
                  + spec3(2 * nq)),
        out_specs=(
            pl.BlockSpec((block, K), lambda i: (i, 0)),
            pl.BlockSpec((block, K), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Np, K), jnp.float32),
            jax.ShapeDtypeStruct((Np, K), jnp.float32),
        ),
        interpret=_interpret(),
    )(a3, a3, a3, p3, p3, p3, cy3, cy3, cy3, hwp, eq3, eq3, eq3)
    return out_a[:N], out_p[:N]


def _proj_mxu_kernel(los_ref, his_ref, x_ref, cyc_ref, hw_ref, out_ref,
                     w_sc, gt_sc, *, F, SCn, P, nhop, Kp, coefs, nsub,
                     precision):
    """MXU-matmul projection grid step (i = frame block, j = span chunk).

    Factorization: the chirped basis splits as
        e^{-2 pi j k (cyc(n) - cyc_c)} = e^{+2 pi j k cyc_c}
                                         * e^{-2 pi j k cyc(n)},
    so the modulated signal g_k(n) = x(n) e^{-2 pi j k cyc(n)} is
    FRAME-INDEPENDENT and the per-frame windowed projection becomes a
    banded real matmul  out[f, :] = sum_n W[f, n] * G[n, :]  that rides
    the MXU instead of the VPU (the per-frame phase factor is restored on
    the host as an O(N*K) rotation).  Identical math to the rotation
    kernel, just reassociated; fp32 (HIGHEST) keeps weak harmonics exact.

    Per step: generate G^T for this span chunk in VMEM (complex-power
    recurrence over k, 8 harmonics at a time), evaluate the
    pitch-synchronous window rows for the sub-tiles of 8 frames whose
    window intersects the chunk (others zero), then one
    [F, SCn] x [SCn, CC] NT matmul accumulated over chunks.  G columns:
    [wsum (ones), xsum (x), re_1..re_Kp, im_1..im_Kp]."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # ---- window rows: per 8-frame sub-tile, skip if outside the chunk
    chunk_lo = i * (F * nhop) + j * SCn - P   # absolute sample interval
    chunk_hi = chunk_lo + SCn                 # of this span chunk
    col = jax.lax.broadcasted_iota(jnp.int32, (8, SCn), 1).astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, SCn), 0).astype(jnp.float32)
    for s in range(nsub):
        sub = i * nsub + s

        @pl.when((los_ref[sub] < chunk_hi) & (his_ref[sub] > chunk_lo))
        def _(s=s):
            hw8 = hw_ref[pl.ds(8 * s, 8), :]              # [8, 1]
            base = (j * SCn - P - (8 * s) * nhop).astype(jnp.float32)
            noff = base + col - row * nhop                # [8, SCn]
            u = (noff / hw8 + 1.0) * 0.5
            w = jnp.full_like(u, coefs[0])
            for m in range(1, len(coefs)):
                w = w + coefs[m] * jnp.cos((TWO_PI * m) * u)
            w_sc[pl.ds(8 * s, 8), :] = \
                jnp.where((u >= 0.0) & (u <= 1.0), w, 0.0)

        @pl.when((los_ref[sub] >= chunk_hi) | (his_ref[sub] <= chunk_lo))
        def _(s=s):
            w_sc[pl.ds(8 * s, 8), :] = jnp.zeros((8, SCn), jnp.float32)

    # ---- G^T generation: rows [re_1..re_Kp | im_1..im_Kp | 1, x, 0pad]
    # (sublane-aligned layout: every 8-row store starts at a multiple
    # of 8 -- Kp is 8-aligned and the wsum/xsum rows share one padded
    # tail block, which also keeps all CCp rows initialized)
    x = x_ref[:]                                          # [1, SCn]
    ang = -TWO_PI * cyc_ref[:]
    z1r = jnp.cos(ang)
    z1i = jnp.sin(ang)
    gt_sc[pl.ds(2 * Kp, 8), :] = jnp.concatenate(
        [jnp.ones((1, SCn), jnp.float32), x,
         jnp.zeros((6, SCn), jnp.float32)], axis=0)
    # z^1..z^8 ladder, then step by z^8 per octave of 8 harmonics
    rows_r, rows_i = [z1r], [z1i]
    for _ in range(7):
        rows_r.append(rows_r[-1] * z1r - rows_i[-1] * z1i)
        rows_i.append(rows_r[-2] * z1i + rows_i[-1] * z1r)
    zr = jnp.concatenate(rows_r, axis=0)                  # [8, SCn]
    zi = jnp.concatenate(rows_i, axis=0)
    z8r = jnp.broadcast_to(rows_r[-1], (8, SCn))
    z8i = jnp.broadcast_to(rows_i[-1], (8, SCn))
    for kc in range(Kp // 8):
        gt_sc[pl.ds(8 * kc, 8), :] = x * zr
        gt_sc[pl.ds(Kp + 8 * kc, 8), :] = x * zi
        if kc + 1 < Kp // 8:
            nzr = zr * z8r - zi * z8i
            zi = zr * z8i + zi * z8r
            zr = nzr

    # ---- the banded matmul: [F, SCn] x [CC, SCn]^T -> [F, CC]
    out_ref[:] += jax.lax.dot_general(
        w_sc[:], gt_sc[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)


@functools.partial(jax.jit, static_argnames=("max_k", "nhop", "hh",
                                             "window", "precision"))
def harmonic_project_mxu(x: jnp.ndarray, cyc: jnp.ndarray, hw: jnp.ndarray,
                         max_k: int, nhop: int, hh: int,
                         *, window: str = "hanning",
                         precision: str = "highest"):
    """MXU-matmul chirped harmonic projection at uniform centers i*nhop.

    x, cyc: [nx = N*nhop] signal and mod-1 cycle track (UNframed -- this
    path never materializes the [N, W] frame buffers); hw [N] per-frame
    window halfwidths (samples); hh = window halfwidth in whole hops
    (ceil(halfwin_max / nhop)).  Returns (re [N, K], im [N, K], wsum [N],
    xsum [N]) with  re + j*im = sum_n w_f(n) x(n) e^{-2j pi (k+1)
    (cyc(n) - cyc(f*nhop))},  i.e. the same quantity as
    harmonic_project_win_pallas, including the windowed-DC (k=0) row.
    """
    from .windows import COSINE_SERIES
    coefs = tuple(float(c) for c in COSINE_SERIES[window])
    N = hw.shape[0]
    Kp = _round_up(max_k, 8)
    CCp = 2 * Kp + 8        # [re rows | im rows | ones, x, 6 zero rows]

    # span-chunk size: a 128-multiple of samples (TPU lane-tiling rule for
    # the [1, total] signal blocks), with the frame block F sized so every
    # chunk boundary is reachable by the index map (F*nhop % SCn == 0) and
    # whole 8-frame sub-tiles fit
    F = None
    for SCn in (1024, 512, 256, 128):
        g = math.gcd(nhop, SCn)
        f0_ = SCn // g
        Fc = 8 * f0_ // math.gcd(8, f0_)
        Fc = _round_up(max(Fc, 96), Fc)
        if Fc <= 256:
            F = Fc
            break
    if F is None:
        # unreachable for any SCn in the candidate list (f0_ <= SCn and
        # Fc <= 256 always hold); an explicit error beats a silently
        # wrong index map if the sizing logic ever changes
        raise ValueError(f"no valid span-chunk size for nhop={nhop}")
    nsub = F // 8
    P = _round_up(hh * nhop, SCn)                 # front/back pad, samples
    nch = (F * nhop + 2 * P) // SCn
    Npad = _round_up(N, F)
    nb = Npad // F

    xp = jnp.pad(x.astype(jnp.float32),
                 (P, (Npad - N) * nhop + P))[None, :]
    cycp = jnp.pad(cyc.astype(jnp.float32),
                   (P, (Npad - N) * nhop + P), mode="edge")[None, :]
    hwp = jnp.pad(hw.astype(jnp.float32), (0, Npad - N),
                  constant_values=2.0)[:, None]            # [Npad, 1]

    # per-8-frame-sub-tile absolute SAMPLE bounds of the window support
    f_idx = jnp.arange(Npad, dtype=jnp.int32)
    hw_int = jnp.ceil(hwp[:, 0]).astype(jnp.int32)
    lo_f = f_idx * nhop - hw_int
    hi_f = f_idx * nhop + hw_int + 1
    # padded frames: empty interval -> sub-tile inactive unless real ones
    lo_f = jnp.where(f_idx < N, lo_f, 0)
    hi_f = jnp.where(f_idx < N, hi_f, 0)
    los = jnp.min(lo_f.reshape(-1, 8), axis=1)
    his = jnp.max(hi_f.reshape(-1, 8), axis=1)

    prec = {"highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}[precision]
    out = pl.pallas_call(
        functools.partial(_proj_mxu_kernel, F=F, SCn=SCn, P=P, nhop=nhop,
                          Kp=Kp, coefs=coefs, nsub=nsub, precision=prec),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb, nch),
            in_specs=[
                pl.BlockSpec((1, SCn),
                             lambda i, j, *_: (0, i * (F * nhop // SCn) + j)),
                pl.BlockSpec((1, SCn),
                             lambda i, j, *_: (0, i * (F * nhop // SCn) + j)),
                pl.BlockSpec((F, 1), lambda i, j, *_: (i, 0)),
            ],
            out_specs=pl.BlockSpec((F, CCp), lambda i, j, *_: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((F, SCn), jnp.float32),
                pltpu.VMEM((CCp, SCn), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Npad, CCp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Npad * nch * SCn * CCp,
            bytes_accessed=4 * (Npad * nhop + 2 * P) * 2
            + 4 * Npad * CCp,
            transcendentals=(Npad * nhop + 2 * P) * 2
            + Npad * nch * SCn // F * len(coefs)),
        interpret=_interpret(),
    )(los, his, xp, cycp, hwp)
    re = out[:N, :max_k]
    im = out[:N, Kp:Kp + max_k]
    wsum = out[:N, 2 * Kp]
    xsum = out[:N, 2 * Kp + 1]
    return re, im, wsum, xsum


def _denoise_body(a_p, a_c, a_n, p_p, p_c, p_n, cy_p, cy_c, cy_n,
                  m_p, m_c, m_n, vo_p, vo_c, vo_n, *, taps1, taps2,
                  h_ext, F, K, complex_input=False):
    """Body of the fused track-denoiser stats kernel: phase-aligned
    complex track c, frame-axis FIR slow part c_s, per-frame coherent
    across-k fit, incoherent residual r_inc and its high-band probe --
    all computed from the raw (ampl, phse, cyc_c, mask, voiced) blocks
    with a 3-view halo, for rows [-h_ext, F+h_ext) of the center block.
    Returns (cre, cim, csr, csi, rir, rii, prr, pri, guard) as [F+2*h_ext,
    K]-shaped values (guard [rows, 1]).

    complex_input=True: the (a, p) blocks carry the RAW COMPLEX track
    (re, im) instead of (ampl, phse) -- the deconv kernel's own output
    domain, so the analyze pipeline skips one [N, K] sqrt + arctan2
    host pass between the two kernels (the re-derived trig here is one
    sin/cos pair either way: align rotation vs align-plus-phse angle)."""
    kh = (jax.lax.broadcasted_iota(jnp.int32, (1, K), 1) + 1
          ).astype(jnp.float32)

    def rows(prev, cur, nxt, d0, d1):
        """Rows [d0, d1) in center-block coordinates ([0, F) = cur)."""
        parts = []
        if d0 < 0:
            parts.append(prev[F + d0:])
        parts.append(cur[max(d0, 0):min(d1, F)])
        if d1 > F:
            parts.append(nxt[:d1 - F])
        return jnp.concatenate(parts, 0) if len(parts) > 1 else parts[0]

    h1 = len(taps1) // 2
    h2 = len(taps2) // 2
    he = h_ext
    R = F + 2 * he                        # output row count of this body

    # aligned complex track for rows [-he-h1, F+he+h1)
    span0, span1 = -he - h1, F + he + h1
    a_all = rows(a_p, a_c, a_n, span0, span1)
    p_all = rows(p_p, p_c, p_n, span0, span1)
    cy_all = rows(cy_p, cy_c, cy_n, span0, span1)
    m_all = rows(m_p, m_c, m_n, span0, span1)
    vo_all = rows(vo_p, vo_c, vo_n, span0, span1)
    if complex_input:
        # align rotation e^{-2 pi j k cyc} applied to the raw complex
        # track (a_all, p_all) = (re, im); cyc is mod-1 so k*cyc stays
        # small enough for exact float32 frac
        ph = -cy_all * kh
        ph = ph - jnp.round(ph)
        ang = TWO_PI * ph
        ar = jnp.cos(ang)
        ai = jnp.sin(ang)
        cre_all = a_all * ar - p_all * ai
        cim_all = a_all * ai + p_all * ar
    else:
        ph = p_all / TWO_PI - cy_all * kh
        ph = ph - jnp.round(ph)
        ang = TWO_PI * ph
        cre_all = a_all * jnp.cos(ang)
        cim_all = a_all * jnp.sin(ang)

    RA = span1 - span0                    # rows in the _all buffers

    def fir(vr, taps, h, nrows, off):
        """FIR along rows: out[r] = sum_j taps[j]*vr[off + r + j - h],
        zero rows outside the _all buffer never occur (off >= h)."""
        acc = None
        for j, t in enumerate(taps):
            sl = vr[off + j - h: off + j - h + nrows]
            acc = t * sl if acc is None else acc + t * sl
        return acc

    # slow track + guard for rows [-he, F+he): offset h1 into _all
    csr = fir(cre_all, taps1, h1, R, h1)
    csi = fir(cim_all, taps1, h1, R, h1)
    guard = fir(vo_all, taps1, h1, R, h1) > 0.999
    cre = cre_all[h1:h1 + R]
    cim = cim_all[h1:h1 + R]
    m = m_all[h1:h1 + R]
    rr = cre - csr
    ri = cim - csi

    # coherent across-k fit r ~ (m0 + m1*k) * c_s (per row)
    p = (csr * csr + csi * csi) * m
    crr = (csr * rr + csi * ri) * m       # Re(conj(c_s) r)
    cri = (csr * ri - csi * rr) * m       # Im(conj(c_s) r)
    a00 = jnp.sum(p, axis=1, keepdims=True)
    a01 = jnp.sum(kh * p, axis=1, keepdims=True)
    a11 = jnp.sum(kh * kh * p, axis=1, keepdims=True)
    b0r = jnp.sum(crr, axis=1, keepdims=True)
    b0i = jnp.sum(cri, axis=1, keepdims=True)
    b1r = jnp.sum(kh * crr, axis=1, keepdims=True)
    b1i = jnp.sum(kh * cri, axis=1, keepdims=True)
    det = a00 * a11 - a01 * a01
    inv = 1.0 / (det + 1e-5 * a00 * a11 + 1e-12)
    m0r = (a11 * b0r - a01 * b1r) * inv
    m0i = (a11 * b0i - a01 * b1i) * inv
    m1r = (a00 * b1r - a01 * b0r) * inv
    m1i = (a00 * b1i - a01 * b0i) * inv
    wr = m0r + m1r * kh
    wi = m0i + m1i * kh
    rcr = wr * csr - wi * csi
    rci = wr * csi + wi * csr
    rir = rr - rcr
    rii = ri - rci
    return cre, cim, csr, csi, rcr, rci, rir, rii, guard, m


def _denoise_stats_kernel(a_p, a_c, a_n, p_p, p_c, p_n, cy_p, cy_c, cy_n,
                          m_p, m_c, m_n, vo_p, vo_c, vo_n,
                          pp_ref, gd_ref, cre_ref, cim_ref, csr_ref,
                          csi_ref, *, taps1, taps2, K, edge_mask=False,
                          complex_input=False):
    """Pass A: probe power |hp(r_inc)|^2 and guard for the host-side
    floor / engagement / fit-weight statistics, PLUS the aligned complex
    track (cre, cim) and its FIR slow part (csr, csi) so pass B can
    reload them instead of redoing the align transcendentals and the
    frame-axis FIR (the recompute cost ~half of pass B; the extra HBM
    round trip of 4 [N, K] f32 arrays is ~10x cheaper on v5e).
    |c_s|^2 and |r|^2 for the host statistics are derived outside the
    kernel from the emitted tracks (XLA fuses them into the stats).

    edge_mask=True: the caller passed UNPADDED inputs with clamped
    prev/next index maps (halo-free path) -- the first block's prev view
    and the last block's next view then alias the center block instead
    of the physical zero halo, so zero them here to reproduce the
    zero-padded-edge FIR semantics."""
    F = a_c.shape[0]
    h2 = len(taps2) // 2
    if edge_mask:
        i = pl.program_id(0)
        pz = (i > 0).astype(jnp.float32)
        nz = (i < pl.num_programs(0) - 1).astype(jnp.float32)
        a_p, p_p, cy_p, m_p, vo_p = (r[:] * pz for r in
                                     (a_p, p_p, cy_p, m_p, vo_p))
        a_n, p_n, cy_n, m_n, vo_n = (r[:] * nz for r in
                                     (a_n, p_n, cy_n, m_n, vo_n))
    (cre, cim, csr, csi, rcr, rci, rir, rii, guard,
     m) = _denoise_body(a_p, a_c, a_n, p_p, p_c, p_n, cy_p, cy_c, cy_n,
                        m_p, m_c, m_n, vo_p, vo_c, vo_n,
                        taps1=taps1, taps2=taps2, h_ext=h2, F=F, K=K,
                        complex_input=complex_input)
    # rows here span [-h2, F+h2); center block rows = [h2, h2+F)
    acc_r = None
    acc_i = None
    for j, t in enumerate(taps2):
        sr = rir[j:j + F]
        si = rii[j:j + F]
        acc_r = t * sr if acc_r is None else acc_r + t * sr
        acc_i = t * si if acc_i is None else acc_i + t * si
    prr = rir[h2:h2 + F] - acc_r
    pri = rii[h2:h2 + F] - acc_i
    pp_ref[:] = prr * prr + pri * pri
    gd_ref[:] = guard[h2:h2 + F].astype(jnp.float32)
    cre_ref[:] = cre[h2:h2 + F]
    cim_ref[:] = cim[h2:h2 + F]
    csr_ref[:] = csr[h2:h2 + F]
    csi_ref[:] = csi[h2:h2 + F]


def _denoise_apply_body(v_ref, wm_ref, cre_ref, cim_ref, csr_ref,
                        csi_ref, cy_ref, m_ref, gd_ref, *, strength, K):
    """Shared pass-B math: reload the aligned/slow tracks emitted by pass
    A, redo the across-k fit WEIGHTED by wm [1, K] (both sides of the
    normal equations, matching the jnp reference -- an earlier form
    weighted only the Gram matrix), gate the incoherent fast residual
    against the host-combined floor v [1, K], and un-align.  Purely
    per-row work: no halo blocks, no FIR, no align recompute.  Returns
    (or, oi, rir, rii, ur, ui): the un-aligned gated complex harmonics,
    the (aligned-domain) weighted-fit incoherent residual, and the
    un-align rotation factors -- the latter two feed the spectral-gate
    variant below."""
    cre = cre_ref[:]
    cim = cim_ref[:]
    csr = csr_ref[:]
    csi = csi_ref[:]
    m = m_ref[:]
    guard = gd_ref[:] > 0.5
    kh = (jax.lax.broadcasted_iota(jnp.int32, (1, K), 1) + 1
          ).astype(jnp.float32)
    rr = cre - csr
    ri = cim - csi
    w_k = wm_ref[:] * m                                # [rows, K]
    p = (csr * csr + csi * csi) * w_k
    crr = (csr * rr + csi * ri) * w_k     # Re(conj(c_s) r)
    cri = (csr * ri - csi * rr) * w_k     # Im(conj(c_s) r)
    a00 = jnp.sum(p, axis=1, keepdims=True)
    a01 = jnp.sum(kh * p, axis=1, keepdims=True)
    a11 = jnp.sum(kh * kh * p, axis=1, keepdims=True)
    b0r = jnp.sum(crr, axis=1, keepdims=True)
    b0i = jnp.sum(cri, axis=1, keepdims=True)
    b1r = jnp.sum(kh * crr, axis=1, keepdims=True)
    b1i = jnp.sum(kh * cri, axis=1, keepdims=True)
    det = a00 * a11 - a01 * a01
    inv = 1.0 / (det + 1e-5 * a00 * a11 + 1e-12)
    m0r = (a11 * b0r - a01 * b1r) * inv
    m0i = (a11 * b0i - a01 * b1i) * inv
    m1r = (a00 * b1r - a01 * b0r) * inv
    m1i = (a00 * b1i - a01 * b0i) * inv
    wr = m0r + m1r * kh
    wi = m0i + m1i * kh
    rcr = wr * csr - wi * csi
    rci = wr * csi + wi * csr
    rir = rr - rcr
    rii = ri - rci
    v = v_ref[:]                                       # [1, K]
    pw = rir * rir + rii * rii
    g = jnp.clip(1.0 - strength * v / (pw + 1e-20), 0.0, 1.0)
    outr = csr + rcr + g * rir
    outi = csi + rci + g * rii
    outr = jnp.where(guard, outr, cre)
    outi = jnp.where(guard, outi, cim)
    # un-align: multiply by e^{+2 pi j k cyc_c}
    pha = cy_ref[:] * kh
    pha = pha - jnp.round(pha)
    ua = TWO_PI * pha
    ur = jnp.cos(ua)
    ui = jnp.sin(ua)
    return (outr * ur - outi * ui, outr * ui + outi * ur,
            rir, rii, ur, ui)


def _denoise_apply_kernel(v_ref, wm_ref, cre_ref, cim_ref, csr_ref,
                          csi_ref, cy_ref, m_ref, gd_ref, or_ref, oi_ref,
                          *, strength, K):
    """Pass B (time-gate-only mode): emit the un-aligned gated complex
    harmonics (host converts to ampl/phse -- no atan2 in Mosaic)."""
    o_r, o_i, _, _, _, _ = _denoise_apply_body(
        v_ref, wm_ref, cre_ref, cim_ref, csr_ref, csi_ref, cy_ref,
        m_ref, gd_ref, strength=strength, K=K)
    or_ref[:] = o_r
    oi_ref[:] = o_i


def _denoise_apply_spec_kernel(v_ref, wm_ref, cre_ref, cim_ref, csr_ref,
                               csi_ref, cy_ref, m_ref, gd_ref, or_ref,
                               oi_ref, fr_ref, fi_ref, ur_ref, ui_ref,
                               *, strength, K):
    """Pass B (spectral mode): additionally emit the guarded
    aligned-domain full track c_s + r_inc (exactly what the spectral
    gate's probe-level / Parseval-complement path consumes) and the
    un-align rotation factors (so the host can rotate the
    spectral-subtraction delta into the output domain without
    recomputing the align transcendentals).  This is the 'kernel r_inc
    output' that de-duplicates the jnp fit: the earlier restructure
    (time gate in the kernel, fit REDONE in jnp for the delta) measured
    2.4 ms/step slower at batch 128 -- see layer0._track_denoise."""
    o_r, o_i, rir, rii, ur, ui = _denoise_apply_body(
        v_ref, wm_ref, cre_ref, cim_ref, csr_ref, csi_ref, cy_ref,
        m_ref, gd_ref, strength=strength, K=K)
    guard = gd_ref[:] > 0.5
    or_ref[:] = o_r
    oi_ref[:] = o_i
    fr_ref[:] = jnp.where(guard, csr_ref[:] + rir, 0.0)
    fi_ref[:] = jnp.where(guard, csi_ref[:] + rii, 0.0)
    ur_ref[:] = ur
    ui_ref[:] = ui


def _denoise_pack3(a, N, pad, block):
    a2 = a.reshape(N, -1).astype(jnp.float32)
    return jnp.pad(a2, ((block, pad + block), (0, 0)))


def _denoise_spec3(width, block):
    return [pl.BlockSpec((block, width), lambda i: (i, 0)),
            pl.BlockSpec((block, width), lambda i: (i + 1, 0)),
            pl.BlockSpec((block, width), lambda i: (i + 2, 0))]


@functools.partial(jax.jit, static_argnames=("taps1", "taps2", "block",
                                              "_force_pad",
                                              "complex_input"))
def denoise_stats_pallas(ampl, phse, cyc_c, mask, voiced, taps1, taps2,
                         block: int = FRAME_BLOCK,
                         _force_pad: bool = False,
                         complex_input: bool = False):
    """Fused pass A of the track denoiser: one read of the chunk fields
    -> probe-band incoherent power pp [N, K], slow-track power cs2
    [N, K], raw fast power r2 [N, K], guard [N], plus the aligned track
    (cre, cim) and slow track (csr, csi) for pass B to reload (see
    layer0._track_denoise; the jnp formulation materializes a full array
    per FIR tap and costed ~13 ms/step at batch 128).

    Like pass B, the block prefers a divisor of N (floored at 64 so
    the FIR halos stay well inside one block): the six [N+pad, K] ->
    [:N] output slices then cost nothing, and the physical zero halo
    (one full read+write copy of all five inputs) is replaced by
    clamped prev/next index maps + in-kernel edge masking.

    complex_input=True: (ampl, phse) carry the raw complex track
    (re, im) instead -- see _denoise_body."""
    N, K = ampl.shape
    if N % block:
        for cand in range(min(512, N) // 8 * 8, 63, -8):
            if N % cand == 0:
                block = cand
                break
    # the 3-view halo covers at most one block on each side; the FIR
    # spans must fit (review finding: prev[F + d0:] silently mis-slices
    # otherwise)
    assert len(taps1) // 2 + len(taps2) // 2 + len(taps2) // 2 < block, \
        "denoiser FIR halo exceeds one frame block"
    pad = (-N) % block
    halo_free = (pad == 0) and not _force_pad
    if halo_free:
        pk = lambda a: a.reshape(N, -1).astype(jnp.float32)
        a3, p3, cy3, m3, vo3 = (pk(x) for x in
                                (ampl, phse, cyc_c, mask, voiced))
        nb = N // block
        spec3 = lambda w: [
            pl.BlockSpec((block, w), lambda i: (jnp.maximum(i - 1, 0), 0)),
            pl.BlockSpec((block, w), lambda i: (i, 0)),
            pl.BlockSpec((block, w),
                         lambda i: (jnp.minimum(i + 1, nb - 1), 0))]
    else:
        a3 = _denoise_pack3(ampl, N, pad, block)
        p3 = _denoise_pack3(phse, N, pad, block)
        cy3 = _denoise_pack3(cyc_c, N, pad, block)
        m3 = _denoise_pack3(mask, N, pad, block)
        vo3 = _denoise_pack3(voiced, N, pad, block)
        nb = (N + pad) // block
        spec3 = lambda w: _denoise_spec3(w, block)
    pp, gd, cre, cim, csr, csi = pl.pallas_call(
        functools.partial(_denoise_stats_kernel,
                          taps1=tuple(float(t) for t in taps1),
                          taps2=tuple(float(t) for t in taps2), K=K,
                          edge_mask=halo_free,
                          complex_input=complex_input),
        grid=(nb,),
        in_specs=(spec3(K) + spec3(K) + spec3(1) + spec3(K) + spec3(1)),
        out_specs=(pl.BlockSpec((block, K), lambda i: (i, 0)),
                   pl.BlockSpec((block, 1), lambda i: (i, 0)),
                   pl.BlockSpec((block, K), lambda i: (i, 0)),
                   pl.BlockSpec((block, K), lambda i: (i, 0)),
                   pl.BlockSpec((block, K), lambda i: (i, 0)),
                   pl.BlockSpec((block, K), lambda i: (i, 0))),
        out_shape=(jax.ShapeDtypeStruct((N + pad, K), jnp.float32),
                   jax.ShapeDtypeStruct((N + pad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((N + pad, K), jnp.float32),
                   jax.ShapeDtypeStruct((N + pad, K), jnp.float32),
                   jax.ShapeDtypeStruct((N + pad, K), jnp.float32),
                   jax.ShapeDtypeStruct((N + pad, K), jnp.float32)),
        interpret=_interpret(),
    )(a3, a3, a3, p3, p3, p3, cy3, cy3, cy3, m3, m3, m3, vo3, vo3, vo3)
    cre, cim, csr, csi = cre[:N], cim[:N], csr[:N], csi[:N]
    # |c_s|^2 and |r|^2 derived outside the kernel (XLA fuses them into
    # the host-side floor statistics; saves two [N, K] kernel outputs)
    cs2 = csr * csr + csi * csi
    r2 = (cre - csr) ** 2 + (cim - csi) ** 2
    return (pp[:N], cs2, r2, gd[:N, 0] > 0.5, cre, cim, csr, csi)


@functools.partial(jax.jit, static_argnames=("strength", "block",
                                              "emit_resid"))
def denoise_apply_pallas(cre, cim, csr, csi, cyc_c, mask, guard, v, wmul,
                         strength: float, block: int = FRAME_BLOCK,
                         emit_resid: bool = False):
    """Fused pass B: reload pass A's aligned/slow tracks, gate against
    the combined floor v [K] with the coherent fit weighted by wmul [K],
    and return the un-aligned complex harmonics (re, im) [N, K].  Purely
    per-row work -- no halo views, no FIR recompute.

    emit_resid=True (spectral mode) additionally returns the guarded
    aligned-domain full track where(guard, c_s + r_inc, 0) -- the
    spectral gate's direct input -- and the un-align rotation factors
    (ur, ui) so the host-side spectral gate runs WITHOUT re-deriving
    the fit or the align transcendentals in jnp: four extra [N, K] f32
    outputs (~0.7 ms of HBM at batch 128 on v5e) against the ~20
    full-rate jnp passes they replace.

    The kernel is pure per-row work, so the block size is free to be
    any sublane multiple: prefer one that divides N exactly -- then
    every input jnp.pad and output [:N] slice is an XLA identity
    instead of a full-array copy (8 ins + up to 6 outs x ~65 MB of
    pure copy traffic at batch 128 on the default 1600-frame bench
    shape, where FRAME_BLOCK=128 leaves pad=64)."""
    N, K = cre.shape
    if N % block:
        for cand in range(min(512, N) // 8 * 8, 7, -8):
            if N % cand == 0:
                block = cand
                break

    def pack(a, width):
        a2 = a.reshape(N, width).astype(jnp.float32)
        return jnp.pad(a2, ((0, (-N) % block), (0, 0)))

    pad = (-N) % block
    nb = (N + pad) // block
    blk = lambda w: pl.BlockSpec((block, w), lambda i: (i, 0))
    n_out = 6 if emit_resid else 2
    kern = _denoise_apply_spec_kernel if emit_resid \
        else _denoise_apply_kernel
    outs = pl.pallas_call(
        functools.partial(kern, strength=float(strength), K=K),
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, K), lambda i: (0, 0)),
                  pl.BlockSpec((1, K), lambda i: (0, 0)),
                  blk(K), blk(K), blk(K), blk(K), blk(1), blk(K), blk(1)],
        out_specs=tuple(blk(K) for _ in range(n_out)),
        out_shape=tuple(jax.ShapeDtypeStruct((N + pad, K), jnp.float32)
                        for _ in range(n_out)),
        interpret=_interpret(),
    )(v.reshape(1, K).astype(jnp.float32),
      wmul.reshape(1, K).astype(jnp.float32),
      pack(cre, K), pack(cim, K), pack(csr, K), pack(csi, K),
      pack(cyc_c, 1), pack(mask, K),
      pack(guard.astype(jnp.float32), 1))
    return tuple(o[:N] for o in outs)


def _fir_frames_kernel(prev_ref, cur_ref, next_ref, out_ref, *, taps):
    """One frame block of a frame-axis FIR: out[i] = sum_j taps[j] *
    v[i + j - h] with zero-padded edges, rows fetched from the
    prev/center/next haloed blocks (the deconv kernel's 3-view trick)."""
    F = cur_ref.shape[0]
    h = len(taps) // 2
    acc = None
    for j, wj in enumerate(taps):
        d = j - h
        if d < 0:
            rows = jnp.concatenate([prev_ref[F + d:], cur_ref[:F + d]], 0)
        elif d > 0:
            rows = jnp.concatenate([cur_ref[d:], next_ref[:d]], 0)
        else:
            rows = cur_ref[:]
        acc = wj * rows if acc is None else acc + wj * rows
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("taps", "block"))
def fir_frames_pallas(v: jnp.ndarray, taps: tuple,
                      block: int = FRAME_BLOCK) -> jnp.ndarray:
    """FIR along the frame (leading) axis of v [N, C], zero-padded edges:
    out[i] = sum_j taps[j] * v[i + j - len(taps)//2].  One fused pass --
    the equivalent jnp pad/slice shift-add chain materializes a full
    [N, C] copy per tap, which made the track denoiser's smoothing the
    dominant cost of the whole feature (~12 ms/step at batch 128 on
    v5e; this kernel is one read + one write of v)."""
    assert len(taps) <= 2 * block
    N, C = v.shape
    pad = (-N) % block
    # one haloed buffer; passed three times with index maps i / i+1 / i+2
    v3 = jnp.pad(v.astype(jnp.float32),
                 ((block, pad + block), (0, 0)))
    nb = (N + pad) // block
    out = pl.pallas_call(
        functools.partial(_fir_frames_kernel,
                          taps=tuple(float(t) for t in taps)),
        grid=(nb,),
        in_specs=[pl.BlockSpec((block, C), lambda i: (i, 0)),
                  pl.BlockSpec((block, C), lambda i: (i + 1, 0)),
                  pl.BlockSpec((block, C), lambda i: (i + 2, 0))],
        out_specs=pl.BlockSpec((block, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N + pad, C), jnp.float32),
        interpret=_interpret(),
    )(v3, v3, v3)
    return out[:N]


def _proj_kernel(lob_ref, hib_ref, dc_ref, xw_ref, re_ref, im_ref):
    """Grid step (i, jw): accumulate the projection of window chunk jw of
    frame block i onto all K harmonics; outputs are revisited over jw."""
    i = pl.program_id(0)
    jw = pl.program_id(1)
    wblock = dc_ref.shape[1]

    @pl.when(jw == 0)
    def _():
        re_ref[:] = jnp.zeros_like(re_ref)
        im_ref[:] = jnp.zeros_like(im_ref)

    # pitch-synchronous windows are centered: window chunk jw is all-zero
    # for every frame in this block unless it intersects the block's
    # active interval [lob, hib) -- skip its VPU work entirely.
    # NOTE: the harmonic loop stays a STATIC fori_loop -- a dynamic trip
    # count turns the pl.ds output writes into dynamic sublane offsets,
    # which Mosaic lowers ~30x slower (measured on v5e).
    @pl.when(((jw + 1) * wblock > lob_ref[i]) & (jw * wblock < hib_ref[i]))
    def _():
        ang = TWO_PI * dc_ref[:]           # [F, Wb]
        zr = jnp.cos(ang)
        zi = jnp.sin(ang)
        xw = xw_ref[:]
        K = re_ref.shape[0]

        def chunk(j, carry):
            wr, wi = carry
            res, ims = [], []
            for _ in range(KCHUNK):
                res.append(jnp.sum(wr * xw, axis=-1))
                ims.append(-jnp.sum(wi * xw, axis=-1))
                nwr = wr * zr - wi * zi
                wi = wr * zi + wi * zr
                wr = nwr
            base = pl.multiple_of(j * KCHUNK, KCHUNK)
            re_ref[pl.ds(base, KCHUNK), :] += jnp.stack(res)
            im_ref[pl.ds(base, KCHUNK), :] += jnp.stack(ims)
            return wr, wi

        jax.lax.fori_loop(0, K // KCHUNK, chunk, (zr, zi))


@functools.partial(jax.jit, static_argnames=("max_k", "block", "wblock"))
def harmonic_project_pallas(dc: jnp.ndarray, xw: jnp.ndarray, max_k: int,
                            lo: jnp.ndarray | None = None,
                            hi: jnp.ndarray | None = None,
                            block: int = FRAME_BLOCK,
                            wblock: int = W_BLOCK):
    """Windowed projection onto the chirped harmonic basis.

    dc, xw: [N, W] -> (re [N, K], im [N, K]) with
    re+j*im = sum_w xw[w] * exp(-2j pi (k+1) dc[w]).

    lo/hi [N] (optional): per-frame active sample interval [lo, hi) of the
    window -- entries outside it MUST be zero in xw; the kernel skips
    window blocks that no frame in a frame block needs.
    """
    N, W = dc.shape
    Kp = _round_up(max_k, KCHUNK)
    npad = (-N) % block
    wpad = (-W) % wblock
    # zero-padded xw contributes nothing regardless of the dc padding
    dc = jnp.pad(dc, ((0, npad), (0, wpad)))
    xw = jnp.pad(xw, ((0, npad), (0, wpad)))
    Np, Wp = N + npad, W + wpad
    nb = Np // block
    if lo is None or hi is None:
        lob = jnp.zeros((nb,), jnp.int32)
        hib = jnp.full((nb,), W, jnp.int32)
    else:
        lob = _block_min(jnp.clip(lo, 0, W), N, block, fill=W)
        hib = _block_max(jnp.clip(hi, 0, W), N, block, fill=0)
    re, im = pl.pallas_call(
        _proj_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb, Wp // wblock),
            in_specs=[
                pl.BlockSpec((block, wblock), lambda i, jw, *_: (i, jw)),
                pl.BlockSpec((block, wblock), lambda i, jw, *_: (i, jw)),
            ],
            out_specs=(
                pl.BlockSpec((Kp, block), lambda i, jw, *_: (0, i)),
                pl.BlockSpec((Kp, block), lambda i, jw, *_: (0, i)),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Kp, Np), jnp.float32),
            jax.ShapeDtypeStruct((Kp, Np), jnp.float32),
        ),
        interpret=_interpret(),
    )(lob, hib, dc.astype(jnp.float32), xw.astype(jnp.float32))
    return re[:max_k].T[:N], im[:max_k].T[:N]
