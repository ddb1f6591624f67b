"""Roofline accounting for the hot kernels (VERDICT r2 weak #8).

Computes ANALYTICAL flop and HBM-byte counts per pipeline stage from the
conf and the bench fixture's F0 statistics, combines them with MEASURED
stage times (pass ms values from scripts/profile_true.py, or use the
recorded defaults), and prints achieved GFLOP/s / GB/s against the v5e
ceilings -- so perf targets argue from hardware, not from history.

v5e ceilings used (public numbers):
  MXU peak        197  TFLOP/s bf16 (fp32 via 3-6 pass decomposition)
  HBM bandwidth   819  GB/s
  VPU fp32 peak   ~3.9 TFLOP/s (8x128 lanes x 4 ALUs x ~0.94 GHz x FMA)
    -- the VPU figure is derived, not published; transcendentals and
    cross-lane ops lower it further.  Achieved-vs-VPU is therefore a
    rough utilization signal, while achieved-vs-HBM is exact.

Usage: python scripts/roofline.py [batch=32] [duration=8.0] \
    [proj_ms=..] [deconv_ms=..] [osc_ms=..] [env_ms=..] [noise_ms=..]
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VPU_PEAK = 3.9e12
MXU_PEAK_BF16 = 197e12
HBM_PEAK = 819e9


def main(batch=32, duration=8.0, proj_ms=12.0, deconv_ms=3.0, osc_ms=5.0,
         env_ms=6.0, noise_ms=5.0, denoise_ms=3.0, denoise_spec_ms=0.0):
    from libllsm2_tpu.config import ChunkConf
    from libllsm2_tpu.utils import testsig

    conf = ChunkConf(f0_floor=70.0)          # bench conf
    nhop, fs, K = conf.nhop, conf.fs, conf.maxnhar
    B = int(batch)
    N = int(round(duration * fs)) // nhop    # frames per utterance
    _, f0 = testsig.make_test_utterance(duration=duration, seed=0)
    f0 = np.asarray(f0)
    f0v = f0[f0 > 0]
    hw = np.clip(conf.rel_winsize * fs / (2.0 * f0v), 2.0,
                 conf.halfwin_max)
    # per-128-frame-block maxima decide the skip granularity (pallas_osc)
    hw_blk = hw[: (len(hw) // 128) * 128].reshape(-1, 128).max(1)
    W_eff = float(np.mean(2 * np.ceil(hw_blk / 256) * 256))  # wblock=256
    K_live = float(np.mean(np.minimum(
        np.ceil(conf.fnyq / f0v / 8) * 8, K)))               # KCHUNK=8
    nx = N * nhop

    rows = []

    def row(name, ms, flops, bytes_, unit="VPU"):
        peak = MXU_PEAK_BF16 / 6 if unit == "MXU-fp32" else VPU_PEAK
        t = ms * 1e-3
        rows.append({
            "stage": name, "ms": round(ms, 2),
            "gflops": round(flops / 1e9, 1),
            "gbytes": round(bytes_ / 1e9, 2),
            "achieved_tflops": round(flops / t / 1e12, 2),
            "achieved_gbs": round(bytes_ / t / 1e9, 1),
            "pct_compute_peak": round(100 * flops / t / peak, 1),
            "pct_hbm_peak": round(100 * bytes_ / t / HBM_PEAK, 1),
            "unit": unit,
        })

    # --- projection (rotation kernel): per (frame, active sample):
    # K_live/8 chunks x 8 x (6 rot + 4 MAC) + ~12 window-eval ops
    fl = B * N * W_eff * (K_live * 10 + 12)
    by = B * (N * W_eff * 2 * 4                # framed x + cyc read
              + N * (2 * K + 2) * 4)           # outputs
    row("harmonic projection (pass 1)", proj_ms, fl, by)

    # --- deconv (fully fused): band build (2D+1 bands x nq quadrature x
    # ~8 ops) + banded complex matvec (2D+1) x 3 kernels x 8 flops
    D = -(-conf.halfwin_max // nhop) + 1
    nq = 2 * nhop // 8
    fl = B * N * ((2 * D + 1) * nq * 8 + (2 * D + 1) * K * 3 * 8
                  + K * 30)                     # + track build/convert
    by = B * N * (4 * K * 4 * 2 + 2 * nq * 4)   # a/p in+out + quadrature
    row("amplitude-track deconv", deconv_ms, fl, by)

    # --- track denoiser: 2 FIR passes (M+Mp taps) + fit/floor/gate
    M = int(round((1.0 / conf.thop) / 15.0)) | 1
    Mp = int(round((1.0 / conf.thop) / 30.0)) | 1
    fl = B * N * K * ((M + Mp) * 4 + 60)
    by = B * N * K * 4 * 2 * 6                  # packed FIR in/out x2 + gate
    row("track denoiser", denoise_ms, fl, by)

    # --- spectral gate on top of the time gate (round-5 decimated
    # structure; denoise_spec_ms = measured denoise_spec - denoise from
    # profile_true.py): decimated [NPd, K] fft + ifft pair + per-bin
    # passes at NPd + the low-bin Parseval-complement DFT matmul (MXU;
    # counted here but its unit differs) + pass B's weighted fit /
    # delta rotation + the block-granular local-noisiness blend
    if denoise_spec_ms > 0.0:
        NP = 1 << int(N - 1).bit_length()
        Dd = 4
        Nd = -(-N // Dd)
        NPd = 1 << int(Nd - 1).bit_length()
        L = int(2 * 30.0 * conf.thop * NP)          # |f| <= 2*cutoff bins
        fl = B * K * (2 * 5 * NPd * np.log2(NPd)    # decimated fft+ifft
                      + 20 * NPd                    # per-bin passes
                      + N * 40                      # fit + rotate + blend
                      + L * N * 8)                  # low-bin DFT (MXU)
        by = B * K * (NPd * 8 * 6 + N * 4 * 12)
        row("spectral gate (on top of time)", denoise_spec_ms, fl, by)

    # --- oscillator bank: per (frame, sample in 2*nhop, live k): 10 ops
    fl = B * N * 2 * nhop * K_live * 10
    by = B * (N * 2 * nhop * 4 * 2 + N * K * 4 * 4)
    row("oscillator bank", osc_ms, fl, by)

    # --- envelope render (fused into noise_mod_ola): C channels x Ke
    # rotations per sample + band OLA/mod
    C, Ke = conf.nchannel, conf.maxnhar_e
    fl = B * nx * C * (Ke * 10 + 8)
    by = B * (nx * 4 * 2 + C * N * 2 * nhop * 4)   # cyc + band segs
    row("noise env render+mod+OLA", env_ms, fl, by)

    # --- noise spectra + iffts: C/2 complex iffts of 2*nhop per frame
    T = 2 * nhop
    fl = B * N * (C / 2) * (5 * T * np.log2(T)) + B * N * T * C * 4
    by = B * N * T * C * 4 * 2
    row("noise spectra+iFFTs", noise_ms, fl, by)

    print(json.dumps({"batch": B, "duration_s": duration,
                      "frames_per_utt": N, "W_eff": round(W_eff, 0),
                      "K_live": round(K_live, 1)}))
    hdr = (f"{'stage':34s} {'ms':>6s} {'GFLOP':>7s} {'GB':>6s} "
           f"{'TF/s':>6s} {'GB/s':>6s} {'%cmp':>5s} {'%hbm':>5s}")
    print(hdr)
    for r in rows:
        print(f"{r['stage']:34s} {r['ms']:6.2f} {r['gflops']:7.1f} "
              f"{r['gbytes']:6.2f} {r['achieved_tflops']:6.2f} "
              f"{r['achieved_gbs']:6.1f} {r['pct_compute_peak']:5.1f} "
              f"{r['pct_hbm_peak']:5.1f}")


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = float(v) if "." in v else int(v)
    main(**kw)
