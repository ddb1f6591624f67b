"""Configuration dataclasses for the TPU-native LLSM rebuild.

These mirror the reference's option structs and self-describing chunk
configuration (reference: llsm.h -> llsm_aoptions / llsm_soptions /
LLSM_CONF_* conf-container entries; see SURVEY.md section 5 "Config /
flag system").  All configs are frozen (hashable) so they can be passed
as static arguments to jitted functions.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class ChunkConf:
    """Self-describing configuration carried with every chunk.

    Mirrors the reference's integer-keyed conf container entries
    (llsm.h -> LLSM_CONF_NFRM/THOP/MAXNHAR/MAXNHAR_E/NPSD/NCHANNEL/
    CHANFREQ/NOSWARP/LIPRADIUS/FNYQ/NSPEC) as a frozen dataclass.
    Unlike the C reference the frame count is NOT part of the conf --
    it is the leading axis of the chunk arrays -- so one conf value can
    describe a whole batch of utterances.
    """

    fs: float = 16000.0          # sample rate [Hz]
    thop: float = 0.005          # hop (frame period) [s]; thop*fs must be integral
    maxnhar: int = 80            # max number of harmonics (slot k = harmonic (k+1)*f0)
    maxnhar_e: int = 4           # max harmonics of the band-wise temporal noise envelope
    npsd: int = 128              # number of warped-frequency PSD bins
    nchannel: int = 4            # number of noise-envelope channels
    chanfreq: Tuple[float, ...] = (2000.0, 4000.0, 6000.0)  # channel boundaries [Hz]
    noswarp: float = 15000.0     # frequency-warping constant for the noise PSD axis
    lip_radius: float = 0.015    # lip radiation model radius [m] (layer 1)
    nspec: int = 257             # layer-1 vocal-tract magnitude bins (= nfft//2+1)
    fnyq: float = 8000.0         # upper frequency bound of the harmonic model [Hz]
    f0_floor: float = 40.0       # lowest F0 the analysis windows are sized for [Hz]
    f0_ceil: float = 600.0       # highest F0 considered (PbP pulse budget, F0 tracking)
    rel_winsize: float = 4.0     # analysis window length in F0 periods

    # ---- derived static quantities -------------------------------------
    @property
    def nhop(self) -> int:
        n = int(round(self.thop * self.fs))
        return max(n, 1)

    @property
    def halfwin_max(self) -> int:
        """Max half-window in samples (pitch-synchronous window at f0_floor)."""
        return int(math.ceil(self.rel_winsize * self.fs / (2.0 * self.f0_floor)))

    @property
    def winlen_max(self) -> int:
        """Static gather width for pitch-synchronous frames (odd)."""
        return 2 * self.halfwin_max + 1

    @property
    def nfft_spec(self) -> int:
        """FFT size implied by nspec (layer-1 vocal tract grid)."""
        return 2 * (self.nspec - 1)

    @property
    def nfft_noise(self) -> int:
        """FFT size for per-frame noise WOLA segments (window = 2 hops)."""
        return _round_up(2 * self.nhop, 2)

    @property
    def chan_edges(self) -> Tuple[float, ...]:
        """Full channel boundary list, 0 .. fs/2 inclusive."""
        return (0.0,) + tuple(self.chanfreq) + (self.fs / 2.0,)

    def validate(self) -> None:
        assert abs(self.thop * self.fs - round(self.thop * self.fs)) < 1e-6, (
            "thop * fs must be an integer number of samples")
        assert len(self.chanfreq) == self.nchannel - 1, (
            "chanfreq must list nchannel-1 interior boundaries")
        assert self.fnyq <= self.fs / 2.0


@dataclasses.dataclass(frozen=True)
class AnalysisOptions:
    """Analysis configuration (reference: llsm.h -> llsm_aoptions,
    llsm_create_aoptions defaults)."""

    conf: ChunkConf = ChunkConf()
    fs_input: float = 0.0        # input-signal rate if != conf.fs (0 = conf.fs).
                                 # Set automatically by create_aoptions for
                                 # rates with a non-integral hop (e.g. 44100 @
                                 # thop=5ms): analysis resamples the input to
                                 # conf.fs (ciglet.h -> sincresample/rresample)
    hm_method: str = "czt"       # "czt" | "pp"  (reference: LLSM_AOPTION_HMCZT/HMPP)
    hm_passes: int = 1           # Gauss-Seidel re-analysis passes of the
                                 # residual (leakage cancellation; 1 = single
                                 # pass like the reference).  The default is
                                 # 1 + hm_correction="deconv": the analytic
                                 # correction applies the same operator as
                                 # the pass-2 update at ~1/6th the cost.
                                 # Set hm_passes=2 to force the explicit
                                 # render+reproject pass.
    hm_correction: str = "deconv"
                                 # "deconv" | "none".  "deconv" (with
                                 # hm_passes == 1, hm_method "czt"):
                                 # deconvolve the smoothing of each
                                 # harmonic's amplitude track analytically.
                                 # In the phase-aligned complex-track
                                 # domain the render+measure operator is a
                                 # real banded frame matrix T (window x
                                 # OLA-crossfade overlap: the ~4-period
                                 # window averages the track over ~+-2
                                 # hops) plus a complex banded cross-k
                                 # kernel X (a varying track's AM
                                 # sidebands land on harmonic k+-1).  One
                                 # Neumann step 2c - Sc applies the same
                                 # 2S - S^2 operator as a Gauss-Seidel
                                 # render+reproject pass at ~1/6th the
                                 # cost, matching it within 0.3 dB on all
                                 # stressed fixtures
                                 # (layer0._deconv_correction).
    f0_refine: bool = True       # refine the supplied F0 from the harmonic fit
    f0_refine_smooth: int = 9    # frames (odd): apply only the MOVING-AVERAGE
                                 # of the refine correction.  The phase-slope
                                 # estimate is inherently smoothed over its
                                 # ~4-period window, so its frame-to-frame
                                 # detail is estimation noise, while the
                                 # supplied track's detail (e.g. jitter) is
                                 # usually real -- raw refine cost 15 dB on
                                 # jittered male fixtures (round 2).  0 = raw.
    use_pallas: bool = False     # lower the harmonic projection to Pallas
    hm_kernel: str = "rotation"  # Pallas projection kernel for the main
                                 # harmonic pass.  "rotation" (default):
                                 # the VPU complex-rotation kernel.
                                 # "matmul": factor the chirped basis
                                 # through the frame-independent
                                 # modulated signal g_k(n) = x e^{-2 pi
                                 # j k cyc} and run the banded [frames,
                                 # span] x [span, 2K+2] contraction on
                                 # the MXU with NO [N, W] frame buffers.
                                 # Measured v5e (round 3): equality-exact
                                 # but NOT faster -- 8.1 ms vs 7.4 ms per
                                 # 12.8k frames at fp32 (6.4 ms at bf16,
                                 # which is too imprecise): the projection
                                 # is bound by the VPU-side modulated-
                                 # signal generation and window eval, not
                                 # the contraction, so the MXU buys
                                 # nothing (scripts/bench_mxu_kernel.py).
                                 # Kept for its ~8x lower peak-HBM (no
                                 # framed buffers) at very large
                                 # batch x duration products.
    frame_chunk: int = 0         # >0: chunk the projection over frames
                                 # (bounds peak HBM; needed for very large
                                 # batch x duration products)
    env_decimate: int = 4        # band-envelope analysis decimation D
                                 # (power of two; rounded down otherwise):
                                 # each noise channel's analytic envelope
                                 # is complex-demodulated to fs/D (exact
                                 # when the band fits one alias window --
                                 # see layer0._band_envelopes), shrinking
                                 # the envelope projections and FFTs by D.
                                 # TRADEOFF: envelope harmonics are masked
                                 # to k*f0 < 0.4*fs/D, so voices with
                                 # F0 above 0.1*fs/D (400 Hz at the 16 kHz
                                 # default) lose their top temporal-noise
                                 # harmonics; set env_decimate=2 or 1 for
                                 # high-pitched voices.  Falls back to a
                                 # smaller power of two when a channel
                                 # straddles an alias boundary or D does
                                 # not divide the hop.
    # envelope fitting window, in hops, for the noise temporal envelopes
    env_winsize_hops: int = 4
    track_denoise: bool = True
                                 # dynamics-adaptive harmonic-track
                                 # denoiser (default ON; superseded by
                                 # track_lowpass_hz when that is set):
                                 # Wiener-gates the fast INCOHERENT part
                                 # of each track against a per-harmonic
                                 # noise floor estimated from the track
                                 # itself, after removing the coherent
                                 # across-harmonic component (common AM =
                                 # shimmer, k-proportional phase =
                                 # jitter).  No-op on clean signals by
                                 # construction (the floor collapses);
                                 # ~+4 dB harmonic SNR on breathy input
                                 # without the lowpass's dynamics smear
                                 # (layer0._track_denoise).
    track_denoise_hz: float = 15.0
                                 # slow/fast split frequency for the
                                 # adaptive denoiser (only the band above
                                 # it is gated; the noise floor is probed
                                 # above 2x this frequency, where clean
                                 # fixtures carry no real dynamics)
    track_denoise_strength: float = 8.0
                                 # gate threshold in units of the
                                 # estimated noise-floor power.  The
                                 # floor probe (above 2x the split
                                 # frequency) underestimates the gated
                                 # band's noise by the window-shaping
                                 # factor; strength absorbs it.  Clean
                                 # safety does NOT depend on strength
                                 # (the relative engagement test
                                 # disengages first); measured bench SNR
                                 # rises monotonically to ~12 and is
                                 # near-saturated at 8.
    track_denoise_spectral: bool = True
                                 # gate the denoiser per FRAME-FREQUENCY
                                 # BIN (FFT along frames) instead of per
                                 # frame: noise between the sparse true
                                 # track-spectrum peaks is removed even
                                 # inside the slow band the per-frame
                                 # gate must leave untouched.  Engages
                                 # ONLY on tracks whose guarded noise
                                 # floor v is nonzero (clean tracks are
                                 # untouched -- the protection the
                                 # rejected round-2 per-bin Wiener
                                 # lacked); measured +2.7 dB over the
                                 # per-frame gate on the bench fixtures,
                                 # oracle bound ~40.9 dB
                                 # (scripts/headroom.py).
    track_spectral_strength: float = 3.0
                                 # spectral-subtraction factor for the
                                 # per-bin gate, in units of the
                                 # f-domain probe-band noise level
                                 # (self-calibrated per track).  Measured
                                 # optimum ~3 on the bench fixtures; the
                                 # curve is flat between 2 and 4.
    track_spectral_decimate: int = 4
                                 # frame-axis decimation of the spectral
                                 # gate's FFTs (the slow track is
                                 # cutoff-band-limited, so D = 4 keeps
                                 # the gating spectrum intact at 1/4 the
                                 # FFT/bin work; the probe-level FFT
                                 # stays full-rate).  1 = exact
                                 # full-rate reference path.
    track_lowpass_hz: float = 0.0
                                 # > 0: lowpass each harmonic's
                                 # phase-aligned complex amplitude track at
                                 # this frame-frequency cutoff (voiced
                                 # interiors only).  Opt-in denoiser for
                                 # breathy/noisy recordings: noise landing
                                 # on harmonic frequencies is broadband
                                 # along the track while true amplitude
                                 # dynamics are slow -- 30 Hz buys ~+4 dB
                                 # harmonic SNR at noise level 0.05 but
                                 # SMEARS fast true dynamics (-5..8 dB on
                                 # clean shimmer fixtures), hence off by
                                 # default.  (Per-bin Wiener shrinkage was
                                 # tried and rejected: track-spectrum floor
                                 # estimates leak and damage clean tracks.)

    @property
    def fs(self) -> float:
        return self.conf.fs


@dataclasses.dataclass(frozen=True)
class SynthesisOptions:
    """Synthesis configuration (reference: llsm.h -> llsm_soptions)."""

    fs: float = 16000.0          # output sample rate (must equal conf.fs for now)
    noise_seed: int = 0x5eed     # PRNG seed for the stochastic noise component
    use_pallas: bool = False     # lower the oscillator bank to a Pallas kernel
    noise_idft: str = "matmul"   # band iDFTs as MXU matmuls ("fft": reference
                                 # inverse-FFT path; equality-tested)
    pbp_oversample: int = 4      # PbP pulse-spectrum grid oversampling: the
                                 # nfft_spec grid (31 Hz at the defaults)
                                 # under-resolves formant curvature, moving
                                 # re-analyzed harmonic amplitudes 3-9% near
                                 # formants; the minphase cepstrum gives the
                                 # exact fine-grid extension for ~4x pulse
                                 # irfft cost (PbP only; see models/pbp.py)


def create_aoptions(fs: float = 16000.0, **kw) -> AnalysisOptions:
    """Reference-parity constructor (llsm_create_aoptions).

    Any input rate is accepted: when thop*fs is not an integral number of
    samples (e.g. 44100 Hz at the 5 ms default hop), the internal analysis
    rate becomes the nearest rate with an integral hop and the analysis
    entry points resample the input transparently (fs_input records the
    original rate).  fnyq defaults scale with the internal rate.
    """
    conf_fields = {f.name for f in dataclasses.fields(ChunkConf)}
    conf_kw = {k: v for k, v in kw.items() if k in conf_fields}
    opt_kw = {k: v for k, v in kw.items() if k not in conf_fields}
    from .fp import FP64
    if FP64 and opt_kw.get("use_pallas"):
        raise ValueError("use_pallas is unavailable under LLSM_FP64=1 "
                         "(Mosaic kernels are float32-only; the f64 build "
                         "is a CPU golden-reference mode)")
    thop = conf_kw.get("thop", ChunkConf.thop)
    fs_input = 0.0
    if abs(thop * fs - round(thop * fs)) > 1e-6:
        fs_internal = max(round(thop * fs), 1) / thop
        fs_input, fs = fs, fs_internal
    if "fnyq" not in conf_kw and fs != 16000.0:
        conf_kw["fnyq"] = fs / 2.0
    conf = ChunkConf(fs=fs, **conf_kw)
    conf.validate()
    return AnalysisOptions(conf=conf, fs_input=fs_input, **opt_kw)


def create_soptions(fs: float = 16000.0, **kw) -> SynthesisOptions:
    """Reference-parity constructor (llsm_create_soptions)."""
    from .fp import FP64
    if FP64 and kw.get("use_pallas"):
        raise ValueError("use_pallas is unavailable under LLSM_FP64=1 "
                         "(Mosaic kernels are float32-only; the f64 build "
                         "is a CPU golden-reference mode)")
    return SynthesisOptions(fs=fs, **kw)
