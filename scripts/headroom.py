"""Oracle-headroom experiment for the 40 dB north star (VERDICT r3 #1b).

Question: on the bench's noisy fixtures (breath noise 0.05), how much of
the gap between the measured harmonic SNR (~36 dB) and the clean-fixture
ceiling (~57 dB) is REACHABLE by any track-domain estimator, and how much
is an information floor?

Method: analyze the clean harmonic component and the noisy mixture of
the SAME fixture with the SAME supplied F0 track.  The clean analysis is
the parameter ceiling.  The difference of the two analyses' complex
harmonic tracks is the per-track estimation noise actually injected by
the fixture's breath noise.  Three bounds are rendered and measured
against the clean harmonic waveform:

  A. ceiling        render(analyze(clean))        — pipeline/model limit
  B. current        render(analyze(noisy))        — what bench measures
  C. oracle Wiener  per-track, per-frame-frequency Wiener filter built
                    from the TRUE clean track spectrum and the TRUE
                    noise track spectrum (unrealizable: uses ground
                    truth) applied to the noisy tracks — the ceiling for
                    ANY track-domain linear separation, i.e. the
                    reachable headroom for denoiser-style work.

If C lands materially above B, a better denoiser can close the gap; if C
sits below 40 dB, the north star is PROVEN unreachable on these fixtures
by track-domain separation and the bench number must be read against C,
not against 40.

Run on CPU: python scripts/headroom.py   (keys: batch, duration, noise)
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from libllsm2_tpu import ChunkConf, create_aoptions, create_soptions  # noqa: E402
from libllsm2_tpu.models import layer0  # noqa: E402
from libllsm2_tpu.utils import testsig  # noqa: E402


def _complex_tracks(chunk):
    """[N, K] complex harmonic tracks a e^{j phi} with the analysis mask."""
    a = np.asarray(chunk.ampl, np.float64)
    p = np.asarray(chunk.phse, np.float64)
    return a * np.exp(1j * p) * np.asarray(chunk.hm_mask, np.float64)


def _wiener_tracks(noisy, clean):
    """Oracle per-track Wiener filtering across the frame axis.

    noisy/clean: [N, K] complex tracks.  Builds |S|^2/(|S|^2+|D|^2) per
    (track, frame-frequency) from the TRUE signal spectrum S = F(clean)
    and TRUE noise spectrum D = F(noisy - clean), applies it to F(noisy).
    This is the best linear time-invariant per-track separator given
    perfect knowledge — no realizable denoiser can beat it.
    """
    S = np.fft.fft(clean, axis=0)
    D = np.fft.fft(noisy - clean, axis=0)
    X = np.fft.fft(noisy, axis=0)
    G = np.abs(S) ** 2 / np.maximum(np.abs(S) ** 2 + np.abs(D) ** 2, 1e-30)
    return np.fft.ifft(G * X, axis=0)


def _snr(ref, est, margin):
    n = min(len(ref), len(est))
    ref, est = ref[:n], est[:n]
    lo, hi = margin, n - margin
    e = ref[lo:hi] - est[lo:hi]
    return 10.0 * np.log10(np.sum(ref[lo:hi] ** 2)
                           / max(np.sum(e ** 2), 1e-30))


def main(batch=8, duration=8.0, noise=0.05, denoise=1):
    conf = ChunkConf(f0_floor=70.0)
    opt = dataclasses.replace(create_aoptions(), conf=conf, use_pallas=True)
    if not denoise:
        opt = dataclasses.replace(opt, track_denoise_strength=0.0)
    sopt = dataclasses.replace(create_soptions(), use_pallas=True)
    margin = int(2.0 * conf.fs / conf.f0_floor)

    rows = []
    for seed in range(int(batch)):
        x, f0, x_harm = testsig.make_test_utterance(
            duration=duration, seed=seed, noise_level=noise,
            return_parts=True)
        x32 = jnp.asarray(x, jnp.float32)
        xh32 = jnp.asarray(x_harm, jnp.float32)
        f032 = jnp.asarray(f0, jnp.float32)

        ch_clean = layer0.analyze(opt, xh32, f032)
        ch_noisy = layer0.analyze(opt, x32, f032)

        yA = np.asarray(layer0.synthesize(sopt, ch_clean).y_sin, np.float64)
        yB = np.asarray(layer0.synthesize(sopt, ch_noisy).y_sin, np.float64)

        tc = _complex_tracks(ch_clean)
        tn = _complex_tracks(ch_noisy)
        tw = _wiener_tracks(tn, tc)
        ch_w = ch_noisy.replace(
            ampl=jnp.asarray(np.abs(tw), jnp.float32)
            * ch_noisy.hm_mask,
            phse=jnp.asarray(np.angle(tw), jnp.float32)
            * ch_noisy.hm_mask)
        yC = np.asarray(layer0.synthesize(sopt, ch_w).y_sin, np.float64)

        ref = np.asarray(x_harm, np.float64)
        rows.append((_snr(ref, yA, margin), _snr(ref, yB, margin),
                     _snr(ref, yC, margin)))
        print(f"seed {seed}: ceiling {rows[-1][0]:6.2f}  "
              f"current {rows[-1][1]:6.2f}  oracle-wiener {rows[-1][2]:6.2f}",
              flush=True)

    arr = np.asarray(rows)
    mean = arr.mean(axis=0)
    print(f"\nMEAN over {len(rows)} fixtures (noise={noise}, "
          f"denoise={'on' if denoise else 'off'}):")
    print(f"  A ceiling (clean analysis)     {mean[0]:6.2f} dB")
    print(f"  B current (noisy analysis)     {mean[1]:6.2f} dB")
    print(f"  C oracle Wiener track bound    {mean[2]:6.2f} dB")
    print(f"  reachable headroom (C - B)     {mean[2] - mean[1]:6.2f} dB")
    print(f"  information floor  (A - C)     {mean[0] - mean[2]:6.2f} dB")


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = float(v) if "." in v else int(v)
    main(**kw)
