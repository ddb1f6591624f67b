"""Layer-1 codec: source-filter re-parameterization of layer-0 frames.

TPU-native rebuild of the reference's layer-1 conversion (reference:
layer1.c -> llsm_chunk_tolayer1 / llsm_chunk_tolayer0 /
llsm_frame_tolayer1 / llsm_frame_tolayer0; call stack in SURVEY.md 3.3).

Per voiced frame: fit the LF glottal model Rd by matching the measured
low-harmonic amplitude tilt against a precomputed Rd->spectrum table
(vectorized grid search + parabolic refinement, replacing the reference's
per-frame scalar search); divide the source and lip radiation out of the
harmonic amplitudes to get the vocal-tract magnitude envelope, resampled
to conf.nspec bins; store the residual of the measured phase against the
vocal tract's minimum phase + LF phase as the voice-source phase.

Because the vocal-tract envelope is F0-independent, editing F0 between
tolayer1 and tolayer0 pitch-shifts with formants preserved -- the
mechanism behind BASELINE config 4.  The whole conversion is vmapped over
frames; the only FFTs are the cepstral minimum-phase reconstructions.

Conventions vs the reference: vtmagn is stored as LOG magnitude on the
rfft grid of nfft = 2*(nspec-1) (the reference stores linear magnitude);
the Rd scalar and vsphse layout match the reference's frame entries.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fp import FP

from ..container import Chunk
from ..ops import interp, lf, spectral

SPEED_OF_SOUND = 343.0
RD_GRID_SIZE = 64
RD_SRC_ROWS = 513   # Rd axis for _source_at_harmonics: the LF phase
                    # moves steeply (but smoothly) with Rd near the
                    # source spectrum's nulls; vs direct lf_spectrum
                    # evaluation the 64-row fit grid interpolates with
                    # up to 0.29 rad error, 513 rows with 0.011 rad
                    # (tests/test_layer1.py source-table oracle)
RD_MIN, RD_MAX = 0.1, 3.0
RD_FIT_HARMONICS = 10
LOG_FLOOR = -23.0  # ~ -200 dB


def _rd_grid():
    return jnp.exp(jnp.linspace(jnp.log(RD_MIN), jnp.log(RD_MAX),
                                RD_GRID_SIZE)).astype(FP)


@functools.lru_cache(maxsize=8)
def _source_tables(max_k: int, rows: int = RD_GRID_SIZE):
    """Precompute, for a static log-spaced Rd grid of `rows` points, the
    LF source log-magnitude and phase at normalized harmonic frequencies
    1..max_k, normalized so the fundamental has unit magnitude.  Returns
    numpy constants ([rows], [rows, K] logmag, [rows, K] phase).

    The phase table is UNWRAPPED along the Rd axis: _source_at_harmonics
    interpolates between grid rows, and interpolating wrapped angles
    across a +-pi boundary sweeps through garbage intermediate values --
    measured as up to 1.1 rad of phase error at isolated (frame, k)
    pairs for a 0.001 Rd perturbation, i.e. any off-grid Rd (every
    parabolic-refined fit, every decoded/edited Rd) got corrupted
    harmonic phases wherever the LF phase crossed a wrap.  (Layer-1
    ROUND TRIPS never showed it: vsphse absorbs the same wrong table
    value and tolayer0 adds it back.)  The unwrap runs on a 16x-fine
    intermediate grid so adjacent steps stay well under pi even at high
    k, then samples every 16th row; consumers re-wrap at the end.

    ensure_compile_time_eval + numpy materialization keep the cached
    tables trace-free even when first requested inside a jit trace (they
    embed as constants in every downstream program)."""
    import numpy as np
    FINE = max(1, 1024 // (rows - 1))   # unwrap on >= ~1024 intervals
    with jax.ensure_compile_time_eval():
        gf = jnp.exp(jnp.linspace(jnp.log(RD_MIN), jnp.log(RD_MAX),
                                  FINE * (rows - 1) + 1)).astype(FP)
        params = lf.lf_from_rd(gf)                     # batched over Gf
        f_norm = jnp.arange(1, max_k + 1, dtype=FP)
        spec = lf.lf_spectrum(f_norm[None, :], jax.tree.map(
            lambda a: a[:, None], params))             # [Gf, K]
        mag0 = jnp.abs(spec[:, :1])
        spec = spec / jnp.maximum(mag0, 1e-12)
        logmag = jnp.log(jnp.maximum(jnp.abs(spec), 1e-12))
        phase = jnp.angle(spec)
    phase = np.unwrap(np.asarray(phase), axis=0)[::FINE]
    grid = np.exp(np.linspace(np.log(RD_MIN), np.log(RD_MAX),
                              rows)).astype(np.float32)
    return (grid, np.asarray(logmag)[::FINE], phase)


def lip_radiation_logmag(f, lip_radius: float):
    """Log-magnitude of the lip radiation load, |L| ~ omega * r / c
    (reference: layer1.c lip radiation term with llsm_aoptions.lip_radius);
    phase is +pi/2 (differentiator)."""
    return jnp.log(jnp.maximum(
        2.0 * jnp.pi * f * lip_radius / SPEED_OF_SOUND, 1e-12))


def _pseudo_mp(logmag: jnp.ndarray) -> jnp.ndarray:
    """Minimum-phase response on the harmonic-index pseudo-grid: treat
    logmag[k] at harmonics 1..K as a spectrum on a uniform grid (bin 0
    extended from k=1) and return the minimum phase at 1..K."""
    M = jnp.concatenate([logmag[..., :1], logmag], axis=-1)
    return spectral.minphase_phase(M)[..., 1:]


RD_PHASE_HARMONICS = 12
RD_PHASE_TGRID = 64


@functools.lru_cache(maxsize=8)
def _phase_dev_tables(max_k: int):
    """Model phase-deviation table: for each grid Rd, the LF source's
    deviation from the minimum phase of its own magnitude (plus lip
    radiation), on the same pseudo-grid used for the measurement."""
    import numpy as np
    with jax.ensure_compile_time_eval():
        _, src_logmag, src_phase = (jnp.asarray(t) for t in
                                    _source_tables(max_k))
        kh = jnp.arange(1, max_k + 1, dtype=FP)
        model_logmag = src_logmag + jnp.log(kh)[None, :]   # + lip tilt
        dmodel = src_phase + 0.5 * jnp.pi - _pseudo_mp(model_logmag)
    return np.asarray(dmodel)


def _rd_viterbi(score: jnp.ndarray, voiced: jnp.ndarray,
                lam: float) -> jnp.ndarray:
    """Continuity-regularized Rd grid path: maximize
    sum_n score[n, g_n] - lam * sum_n (log rd[g_n] - log rd[g_{n-1}])^2
    over grid paths by Viterbi (lax.scan forward + backtrace).

    Why: on OUT-OF-MODEL sources (no LF glottal shape exists -- e.g. the
    synth_harmonic fixtures, or any non-glottal audio) the per-frame
    phase-deviation score landscape is nearly FLAT (measured range
    ~0.04-0.08 over the whole grid vs ~0.1 peak contrast on LF sources)
    and the per-frame argmax rails arbitrarily between the grid EDGES
    frame to frame (0.10 <-> 2.79 on adjacent frames).  Round trips never
    see it (vsphse absorbs any Rd error exactly), but PbP pulse shapes
    follow rd directly: each rail flip crossfades two phase-incoherent
    pulse spectra, and those few frames carried ~60% of the PbP<->
    sinusoidal harmonic-track parity error.  A quadratic log-Rd
    transition penalty kills the rails while leaving genuine fits
    untouched (constant-Rd recovery over the 0.4..2.7 grid unchanged at
    worst 6.6%; an adversarial INSTANT 0.6->2.0 step still settles in
    ~5 frames with <=10% transient bias -- tests/test_layer1.py).

    Unvoiced frames contribute zero observation, so the path coasts
    smoothly across gaps on the prior alone (their rd is overwritten
    downstream anyway).  Cost: N x G^2 = trivial next to the projection.
    """
    N, G = score.shape
    dstep = (jnp.log(RD_MAX) - jnp.log(RD_MIN)) / (G - 1)
    di = (jnp.arange(G)[:, None] - jnp.arange(G)[None, :]).astype(FP)
    pen = lam * (di * dstep) ** 2                           # [G(prev), G]
    obs = jnp.where(voiced[:, None], score, 0.0)

    def fwd(cost, ob):
        m = cost[:, None] - pen
        return jnp.max(m, axis=0) + ob, jnp.argmax(m, axis=0)

    cost, bp = jax.lax.scan(fwd, obs[0], obs[1:])           # bp [N-1, G]

    def back(g, bpn):
        g_prev = bpn[g]
        return g_prev, g_prev

    g_last = jnp.argmax(cost)
    _, g_rev = jax.lax.scan(back, g_last, bp, reverse=True)
    return jnp.concatenate([g_rev, g_last[None]])           # [N]


def fit_rd_phase(log_ampl: jnp.ndarray, phse: jnp.ndarray,
                 mask: jnp.ndarray, f0: jnp.ndarray | None = None,
                 fcap: float = 1000.0,
                 smooth: float = 10.0,
                 dev_corr: jnp.ndarray | None = None) -> jnp.ndarray:
    """Estimate Rd per frame from the harmonic PHASE deviation from
    minimum phase (reference: layer1.c Rd fit -- upstream objective
    marked [M] in SURVEY.md; this phase form replaces round 1's
    amplitude-tilt fit, VERDICT r1 #3).

    Identification principle: the vocal tract is (near) minimum phase,
    and the minimum-phase transform is LINEAR in log magnitude, so

        measured_phase - minphase(measured log ampl)
          = src_phase - minphase(src logmag) + linear_in_k

    -- the vocal tract cancels exactly, however strong the formants
    (which is what biased the amplitude-tilt fit ~2-3x low).  The
    leftover linear phase (pulse position in the cycle) is maximized
    out over a phase-ramp grid; the Rd grid entry with the best
    amplitude-weighted phase coherence wins, with parabolic refinement.

    log_ampl [N, K]: RAW harmonic log amplitudes (lip radiation
    included; its known +log k tilt is in the model table).
    phse [N, K]: measured harmonic phases at the frame center.
    smooth: weight of the quadratic log-Rd continuity prior solved by
    Viterbi over the grid (see _rd_viterbi; 0 disables -- pure
    per-frame fits).
    dev_corr: optional [N, K] phase-deviation correction subtracted from
    the measurement -- the deviation contributed by a known/hypothesized
    under-resolved resonance or antiformant (see _resonance_dev and
    fit_rd_resonance).
    Returns rd [N].  Measured on LF fixtures with strong formants and
    aspiration noise 0.02 (tests/test_layer1.py::TestRdRecovery): within
    8% of ground truth across Rd in [0.4, 2.7].
    """
    grid = _rd_grid()
    K = log_ampl.shape[-1]
    KF = min(RD_PHASE_HARMONICS, K)
    dmodel = jnp.asarray(_phase_dev_tables(K))              # [G, K]
    dmeas = phse - _pseudo_mp(log_ampl)                     # [N, K]
    if dev_corr is not None:
        dmeas = dmeas - dev_corr
    # low-frequency cap rationale: a spectral zero between harmonics
    # adds a ~pi phase step the SAMPLED envelope's minphase cannot know
    # about, offsetting every harmonic above it -- >30% contamination
    # that defeats the robust reweighting (measured: true Rd 1.0 fit as
    # 0.35 with a 900 Hz zero at f0 = 200).  The Rd signature is
    # strongest in the lowest harmonics anyway (the classic H1-H2/H1-H4
    # measures); always keep at least 3 so high-F0 voices stay
    # determined.  fcap = 1000 measured round 4: at f0 ~ 140 the old
    # 700 Hz cap left only 4 harmonics and biased Rd 1.8 -> 1.32 (27%)
    # under strong formants; 1000 Hz recovers the whole 0.4..2.7 grid
    # within 8% while the nasal sampled-zero cases stay within 3%
    # (tests/test_layer1.py TestRdRecovery, tests/test_nasal.py).
    w0 = _fit_weights(log_ampl, mask, f0, fcap)
    diff = dmeas[:, None, :KF] - dmodel[None, :, :KF]       # [N, G, KF]
    theta = jnp.linspace(0.0, 2.0 * jnp.pi, RD_PHASE_TGRID,
                         endpoint=False)
    kf = jnp.arange(1, KF + 1, dtype=FP)
    basis = jnp.exp(-1j * kf[None, :] * theta[:, None])     # [T, KF]

    def solve(w):
        wn = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
        c = wn[:, None, :] * jnp.exp(1j * diff)
        sc_t = jnp.abs(jnp.einsum("ngk,tk->ngt", c, basis,
                                  precision=jax.lax.Precision.HIGHEST))
        # circular parabolic refinement of the phase-ramp score: the
        # theta grid quantizes the free pulse-position ramp to pi/T,
        # i.e. up to k*pi/T rad of un-modeled phase at harmonic k --
        # enough that the winning Rd entry OSCILLATED as the frame
        # center's cycle phase swept through the grid (measured on a
        # perfectly stationary LF fixture: fitted Rd sawtoothed
        # 0.62..0.77 at the hop/period beat rate, the dominant PbP
        # parity error because pulse shapes follow rd directly while
        # tolayer0 cancels the wobble through vsphse)
        t_arg = jnp.argmax(sc_t, axis=-1)                    # [N, G]
        T = sc_t.shape[-1]
        sm = jnp.take_along_axis(sc_t, ((t_arg - 1) % T)[..., None],
                                 axis=-1)[..., 0]
        s0 = jnp.take_along_axis(sc_t, t_arg[..., None], axis=-1)[..., 0]
        sp = jnp.take_along_axis(sc_t, ((t_arg + 1) % T)[..., None],
                                 axis=-1)[..., 0]
        den = sm - 2.0 * s0 + sp                 # < 0 at a genuine peak
        den = jnp.where(jnp.abs(den) < 1e-12, -1e-12, den)
        p = jnp.clip(0.5 * (sm - sp) / den, -0.5, 0.5)
        score = s0 - 0.25 * (sm - sp) * p                    # [N, G]
        return score, t_arg, p

    voiced = (f0 > 0) if f0 is not None \
        else jnp.ones(log_ampl.shape[0], bool)

    def choose(score, t_arg, p):
        """Grid entry per frame: temporally-regularized Viterbi path
        (see _rd_viterbi) or the plain per-frame argmax, plus the
        refined pulse-position ramp theta at that entry."""
        if smooth > 0.0:
            g = _rd_viterbi(score, voiced, smooth)
        else:
            g = jnp.argmax(score, axis=-1)
        T = RD_PHASE_TGRID
        tg = jnp.take_along_axis(t_arg, g[:, None], axis=-1)[:, 0]
        pg = jnp.take_along_axis(p, g[:, None], axis=-1)[:, 0]
        theta_best = (tg.astype(FP) + pg) * (2.0 * jnp.pi / T)
        return g, theta_best

    score, t_arg, p = solve(w0)
    g, theta_best = choose(score, t_arg, p)
    # one IRLS pass: an inter-harmonic spectral ZERO (nasal antiformant)
    # falls between the sampled harmonics, so minphase(sampled envelope)
    # misses its phase step and the 1-2 adjacent harmonics carry large
    # phase residuals at near-full amplitude weight -- enough to drag Rd
    # to the grid edge (measured: true Rd 1.0 fit as 0.39 with a 900 Hz
    # zero at f0 = 200).  Downweight phase-residual outliers at the first
    # fit's optimum (Cauchy weight, sigma 0.5 rad) and refit.
    res = jnp.take_along_axis(
        diff, g[:, None, None], axis=1)[:, 0, :] \
        - kf[None, :] * theta_best[:, None]
    # subtract the free COMMON phase the score's abs() absorbs (review
    # finding: e.g. polarity-inverted audio gives phi ~ pi and every
    # residual would wrap to +-pi, collapsing the Cauchy weights)
    wn0 = w0 / jnp.maximum(jnp.sum(w0, axis=-1, keepdims=True), 1e-9)
    phi = jnp.angle(jnp.sum(wn0 * jnp.exp(1j * res), axis=-1,
                            keepdims=True))
    res = _wrap(res - phi)
    w1 = w0 / (1.0 + (res / 0.5) ** 2)
    score, t_arg, p = solve(w1)
    g, _ = choose(score, t_arg, p)
    gf, _ = spectral.qifft(score, g)
    log_rd = jnp.interp(gf, jnp.arange(RD_GRID_SIZE, dtype=FP),
                        jnp.log(grid))
    return jnp.exp(log_rd)


def _resonance_dev(f0, K: int, fc, bw, fs: float, sign):
    """Phase-deviation contribution, at the harmonics, of an
    UNDER-RESOLVED second-order section: the section's true phase minus
    the minimum phase of its harmonic-SAMPLED log magnitude (the part
    _pseudo_mp can recover on its own).  sign=-1: resonance (pole pair,
    e.g. a sharp F1 between harmonics); sign=+1: antiformant (zero
    pair, the nasal side-branch null).  When the section is well
    resolved by the sampling this tends to zero (minimum-phase
    consistency); when it falls between harmonics it is exactly the
    contamination that biases the Rd phase fit (see fit_rd_resonance).
    Returns [N, K]."""
    kh = jnp.arange(1, K + 1, dtype=FP)
    fk = kh[None, :] * jnp.maximum(f0, 1.0)[:, None]
    r = jnp.exp(-jnp.pi * bw / fs)
    th = 2.0 * jnp.pi * fc / fs
    z1 = jnp.exp(-2j * jnp.pi * fk / fs)
    H = 1.0 - (2.0 * r * jnp.cos(th)) * z1 + (r * r) * z1 * z1
    zph = jnp.angle(H)
    zlm = jnp.log(jnp.maximum(jnp.abs(H), 1e-9))
    return sign * (zph - _pseudo_mp(zlm))


def _fit_weights(log_ampl, mask, f0, fcap: float):
    """The phase fit's amplitude weights with the low-frequency cap
    (shared by fit_rd_phase and the resonance hypothesis scorer)."""
    K = log_ampl.shape[-1]
    KF = min(RD_PHASE_HARMONICS, K)
    w0 = (mask * jnp.exp(log_ampl))[:, :KF]
    if f0 is not None and fcap > 0.0:
        khf = jnp.arange(1, KF + 1, dtype=FP)
        keep = (khf[None, :] * jnp.maximum(f0, 1.0)[:, None] < fcap) \
            | (khf[None, :] <= 3.0)
        w0 = w0 * keep
    return w0


def fit_rd_sections(log_ampl: jnp.ndarray, phse: jnp.ndarray,
                    mask: jnp.ndarray, f0: jnp.ndarray, fs: float,
                    sections, smooth: float = 10.0) -> jnp.ndarray:
    """Rd fit under an explicit parametric-section observation model
    (VERDICT r4 #6 -- resolved by a round-5 root-cause REATTRIBUTION).

    Rounds 3-4 attributed the nasal 'mid-gap' Rd bias (0.55 recovered
    for a true 1.0 at f0 ~ 200) to the antiformant falling between
    harmonics.  Measured round 5 (tests/test_nasal.py): the zero is
    (mostly) INNOCENT -- the same fixtures with NO zero fit 0.46-0.55,
    and the bias follows the sharp F1 = 250 Hz resonance, which at
    f0 >= 180 falls between harmonics 1 and 2: the sampled envelope
    misses the peak, its pseudo-grid minimum phase is wrong, and the
    error spreads across all k through the Hilbert transform -- the
    identical under-resolution mechanism, caused by a POLE.  (At
    f0 = 120, harmonic 2 samples the peak and Rd recovers to ~0.97,
    which is why the bias looked zero-specific for two rounds.)

    Given the tract's sharp second-order sections (from a formant /
    antiformant tracker, a phonetic label, or ground truth), this fit
    subtracts their _resonance_dev contamination and recovers Rd:
    measured 0.59 -> 0.95 (pole only) and 0.97/1.03 (pole + zero) on
    the mid-gap fixtures, no-op on well-sampled ones.

    BLIND section selection was measured UNRELIABLE and is deliberately
    not offered: three selection objectives (per-frame-max coherence,
    constant-rd coherence, physically-constrained pole-only / joint
    pole x zero grids) each picked spurious sections on at least one
    fixture, with winning margins of 0.1-1.8% -- smaller than the
    fixture-to-fixture noise -- and the spurious corrections moved Rd
    AWAY from truth (worst 0.59 -> 0.11).  The phase-coherence
    objective rewards any deviation shape that happens to fit the
    combined residual contamination; it cannot identify WHICH section
    produced it.  If a future round wants blind recovery, the
    identification must come from elsewhere (e.g. a pole-zero envelope
    fit on the MAGNITUDE samples across vibrato-swept frames).

    sections: iterable of (fc_hz, bw_hz, sign) with sign=-1 for a pole
    (resonance), +1 for a zero (antiformant).
    """
    K = log_ampl.shape[-1]
    dev = jnp.zeros_like(log_ampl)
    for fc, bw, sign in sections:
        dev = dev + _resonance_dev(f0, K, float(fc), float(bw), fs,
                                   float(sign))
    return fit_rd_phase(log_ampl, phse, mask, f0, smooth=smooth,
                        dev_corr=dev)


def fit_rd(log_ampl: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Legacy amplitude-tilt Rd fit (round 1; kept for comparison and
    for phase-free inputs).

    log_ampl, mask: [N, K] -- harmonic log amplitudes with the lip
    radiation's known +6 dB/oct tilt already removed (the caller divides
    it out), so the residual tilt is glottal source x vocal tract.
    Returns rd [N].  Grid search over the static Rd table + parabolic
    refinement.

    Known limitation: formant structure contaminates the tilt (vocal-
    tract tilt is attributed to the source), biasing estimates low by up
    to ~2-3x on strongly-resonant material -- chunk_to_layer1 uses
    fit_rd_phase instead (VERDICT r1 #3).
    """
    grid, src_logmag, _ = _source_tables(log_ampl.shape[-1])
    KR = RD_FIT_HARMONICS
    d = (log_ampl - log_ampl[..., :1])[..., :KR]            # measured tilt
    s = (src_logmag - src_logmag[:, :1])[:, :KR]            # [G, KR]
    wgt = (mask[..., :KR] / jnp.arange(1, KR + 1, dtype=FP))
    err = jnp.sum(wgt[:, None, :] * (d[:, None, :] - s[None, :, :]) ** 2,
                  axis=-1)                                  # [N, G]
    k = jnp.argmin(err, axis=-1)
    kf, _ = spectral.qifft(-err, k)
    log_rd = jnp.interp(kf, jnp.arange(RD_GRID_SIZE, dtype=FP),
                        jnp.log(grid))
    return jnp.exp(log_rd)


def _source_at_harmonics(rd: jnp.ndarray, max_k: int):
    """Interpolate the precomputed Rd tables at per-frame rd values
    (clamped into the grid: rd <= 0 from an upstream ML model must not
    NaN the log).  Returns (logmag [N, K], phase [N, K])."""
    grid, src_logmag, src_phase = _source_tables(max_k, rows=RD_SRC_ROWS)
    rd = jnp.clip(rd, RD_MIN, RD_MAX)
    pos = (jnp.log(rd) - jnp.log(grid[0])) / (
        jnp.log(grid[-1]) - jnp.log(grid[0])) * (RD_SRC_ROWS - 1)
    pos = jnp.clip(pos, 0.0, RD_SRC_ROWS - 1.0)
    lm = jax.vmap(lambda p: interp.interp1_uniform(src_logmag.T, p),
                  in_axes=0)(pos)
    ph = jax.vmap(lambda p: interp.interp1_uniform(src_phase.T, p),
                  in_axes=0)(pos)
    return lm, ph


def _wrap(ph):
    return jnp.arctan2(jnp.sin(ph), jnp.cos(ph))


@functools.partial(jax.jit, static_argnums=(1, 2))
def chunk_to_layer1(chunk: Chunk, nfft: int | None = None,
                    sections: tuple | None = None) -> Chunk:
    """Attach layer-1 parameters (rd, vtmagn, vsphse) to a layer-0 chunk
    (reference: layer1.c -> llsm_chunk_tolayer1(chunk, nfft)).

    nfft (reference-parity argument): vocal-tract envelope resolution for
    this call -- vtmagn gets nfft//2+1 bins; defaults to conf.nspec bins
    (nfft = 2*(conf.nspec-1)).  chunk_to_layer0 reads the resolution back
    from vtmagn's own shape, so per-call values round-trip.

    sections: opt-in ((fc_hz, bw_hz, sign), ...) KNOWN sharp tract
    sections for the Rd fit (sign=-1 pole / +1 zero; see
    fit_rd_sections) -- recovers Rd when a sharp F1 or antiformant
    falls BETWEEN harmonics (sustained nasals/murmurs at f0 >~ 180)."""
    conf = chunk.conf
    nspec = (int(nfft) // 2 + 1) if nfft else conf.nspec
    N, K = chunk.ampl.shape
    voiced = chunk.f0 > 0
    f0s = jnp.where(voiced, chunk.f0, 100.0)
    kharm = jnp.arange(1, K + 1, dtype=FP)
    fk = kharm[None, :] * f0s[:, None]                      # [N, K]

    log_ampl = jnp.where(chunk.hm_mask > 0,
                         jnp.log(jnp.maximum(chunk.ampl, 1e-10)), LOG_FLOOR)
    lip_logmag = lip_radiation_logmag(fk, conf.lip_radius)
    # masked slots hold the last valid value so the pseudo-grid minimum
    # phase isn't polluted by the LOG_FLOOR cliff
    idx_last0 = jnp.maximum(jnp.sum(chunk.hm_mask, axis=-1)
                            .astype(jnp.int32) - 1, 0)
    la_held = jnp.where(chunk.hm_mask > 0, log_ampl,
                        jnp.take_along_axis(log_ampl, idx_last0[:, None],
                                            axis=-1))
    if sections:
        rd = fit_rd_sections(la_held, chunk.phse, chunk.hm_mask,
                             chunk.f0, conf.fs, sections)
    else:
        rd = fit_rd_phase(la_held, chunk.phse, chunk.hm_mask, chunk.f0)
    rd = jnp.where(voiced, rd, 1.0)

    src_logmag, src_phase = _source_at_harmonics(rd, K)

    # vocal-tract log magnitude at the harmonic points
    vt_k = log_ampl - src_logmag - lip_logmag               # [N, K]

    # hold the last valid harmonic's value for masked slots, then resample
    # onto the uniform nspec grid
    idx_last = jnp.maximum(jnp.sum(chunk.hm_mask, axis=-1).astype(jnp.int32)
                           - 1, 0)
    last_val = jnp.take_along_axis(vt_k, idx_last[:, None], axis=-1)
    vt_k = jnp.where(chunk.hm_mask > 0, vt_k, last_val)

    fbins = jnp.linspace(0.0, conf.fs / 2.0, nspec)
    pos_k = fk / (conf.fs / 2.0) * (nspec - 1)
    vtmagn = jax.vmap(lambda xp, fp: jnp.interp(fbins, xp, fp))(fk, vt_k)
    # Fixed-point correction: force the gridded envelope, when evaluated
    # back at the harmonic frequencies (exactly as chunk_to_layer0 does),
    # to reproduce the measured values -- this is what makes the
    # layer0->layer1->layer0 round trip transparent at unchanged F0
    # (BASELINE config 2 "SNR parity") despite the finite nspec grid.
    for _ in range(3):
        vt_at_k = jax.vmap(interp.interp1_uniform)(vtmagn, pos_k)
        err_k = jnp.where(chunk.hm_mask > 0, vt_k - vt_at_k, 0.0)
        vtmagn = vtmagn + jax.vmap(
            lambda xp, fp: jnp.interp(fbins, xp, fp))(fk, err_k)
    vtmagn = jnp.where(voiced[:, None], vtmagn, LOG_FLOOR)

    # voice-source phase: measured - VT minimum phase - LF phase - radiation
    vt_phase_grid = spectral.minphase_phase(vtmagn)         # [N, nspec]
    pos = fk / (conf.fs / 2.0) * (nspec - 1)
    vt_phase_k = jax.vmap(interp.interp1_uniform)(vt_phase_grid, pos)
    vsphse = _wrap(chunk.phse - vt_phase_k - src_phase - 0.5 * jnp.pi)
    vsphse = vsphse * chunk.hm_mask

    return chunk.replace(rd=rd, vtmagn=vtmagn, vsphse=vsphse)


@functools.partial(jax.jit, static_argnums=())
def chunk_to_layer0(chunk: Chunk) -> Chunk:
    """Regenerate layer-0 harmonics from the layer-1 parameters, honoring
    any edits to f0/rd/vtmagn (reference: layer1.c -> llsm_chunk_tolayer0).
    """
    assert chunk.has_layer1, "chunk has no layer-1 parameters"
    conf = chunk.conf
    N, K = chunk.ampl.shape
    voiced = chunk.f0 > 0
    f0s = jnp.where(voiced, chunk.f0, 100.0)
    kharm = jnp.arange(1, K + 1, dtype=FP)
    fk = kharm[None, :] * f0s[:, None]
    mask = (voiced[:, None] & (fk < conf.fnyq)).astype(FP)

    src_logmag, src_phase = _source_at_harmonics(chunk.rd, K)
    lip_logmag = lip_radiation_logmag(fk, conf.lip_radius)

    nspec = chunk.vtmagn.shape[-1]
    pos = fk / (conf.fs / 2.0) * (nspec - 1)
    vt_k = jax.vmap(interp.interp1_uniform)(chunk.vtmagn, pos)
    vt_phase_grid = spectral.minphase_phase(chunk.vtmagn)
    vt_phase_k = jax.vmap(interp.interp1_uniform)(vt_phase_grid, pos)

    ampl = jnp.exp(vt_k + src_logmag + lip_logmag) * mask
    phse = _wrap(vt_phase_k + src_phase + 0.5 * jnp.pi
                 + chunk.vsphse) * mask
    return chunk.replace(ampl=ampl, phse=phse, hm_mask=mask)
