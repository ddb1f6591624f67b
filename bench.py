"""Benchmark: batched analyze+resynthesis throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-sec/sec/chip", "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north-star target of
500x realtime per chip (the reference publishes no numbers; BASELINE.md).
Runs on whatever jax's default backend is (the real TPU under the driver;
CPU if JAX_PLATFORMS=cpu).

Measurement method: `repeats` full pipeline steps run inside ONE jitted
lax.scan dispatch (inputs perturbed per step so nothing can be elided)
and the dispatch wall time is divided by `repeats`.  This image's TPU
relay adds ~0.2-1.7 s of PER-DISPATCH marshaling overhead for large
argument/closure buffers -- an artifact a locally-attached chip does not
have; the scan amortizes it so the number tracks actual chip throughput
(docs/STATUS.md "Known environment facts").

TWO SNR figures are reported (VERDICT r3 missing #4 -- the driver-visible
number must map onto the BASELINE.json north star):

- clean_roundtrip_snr_db: analyze+resynthesize CLEAN fixtures, SNR vs the
  input.  This is the north-star-comparable "resynthesis SNR" number
  (target >= 40 dB).
- noisy_estimation_snr_db: harmonic reconstruction of NOISY fixtures
  (breath noise 0.05) vs their clean harmonic component.  Bounded by the
  estimation physics, NOT by resynthesis quality: the oracle-headroom
  experiment (scripts/headroom.py) measures the supremum of this number
  over ALL track-domain separators at ~40.9 dB with perfect ground-truth
  knowledge; see BASELINE.md.

Half the batch is noisy fixtures, half clean -- one compiled program,
same per-row work (static shapes), so the throughput number stays
comparable to earlier rounds.
"""
import dataclasses
import json
import sys
import time

import numpy as np

BASELINE_X_REALTIME = 500.0


def main(batch=128, duration=8.0, iters=3, pallas=1, fchunk=0, repeats=16,
         passes=0, mxu=0):
    # repeats: pipeline steps per lax.scan dispatch.  The relay's
    # per-dispatch marshaling (~30-50 ms at batch 128) is an artifact of
    # this image's remote-device tunnel, not chip throughput; R=16
    # amortizes it below 2 ms/step (R=4 still left ~8 ms/step in the
    # number -- measured 7242x -> 7566x on identical code).
    import jax
    import jax.numpy as jnp

    # persistent compile cache: repeated bench runs (and the driver's
    # end-of-round run) skip the slow first compile
    from libllsm2_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()   # no-op on CPU (cross-machine AOT risk)

    from libllsm2_tpu import ChunkConf, create_aoptions, create_soptions
    from libllsm2_tpu.parallel import corpus
    from libllsm2_tpu.utils import testsig

    conf = ChunkConf(f0_floor=70.0)   # window budget sized for speech F0s
    opt = dataclasses.replace(create_aoptions(), conf=conf,
                              use_pallas=bool(pallas),
                              frame_chunk=int(fchunk),
                              hm_kernel="matmul" if mxu else "rotation")
    if passes:   # 0 = library default (hm_passes=1 + analytic deconv)
        opt = dataclasses.replace(opt, hm_passes=int(passes),
                                  hm_correction="none")
    sopt = dataclasses.replace(create_soptions(), use_pallas=bool(pallas))

    xs, f0s, refs = [], [], []
    n_noisy = batch // 2           # rows [0, n_noisy) noisy, rest clean
    for i in range(batch):
        x, f0, x_harm = testsig.make_test_utterance(
            duration=duration, seed=i,
            noise_level=0.05 if i < n_noisy else 0.0, return_parts=True)
        xs.append(x)
        f0s.append(f0)
        refs.append(x_harm)
    x = jnp.asarray(np.stack(xs), jnp.float32)
    f0 = jnp.asarray(np.stack(f0s), jnp.float32)
    x_ref = jnp.asarray(np.stack(refs), jnp.float32)
    nxv = jnp.full((batch,), x.shape[1], jnp.int32)
    R = int(repeats)

    @jax.jit
    def run():
        def body(c, i):
            y, snr, mean_snr = corpus.batched_pipeline(
                opt, sopt, x + jnp.float32(1e-7) * (i + 1), f0, nxv, x_ref)
            return c + snr, None
        s, _ = jax.lax.scan(body, jnp.zeros((batch,), jnp.float32),
                            jnp.arange(R, dtype=jnp.int32))
        return s / R

    # compile + warm up
    snr_rows = np.asarray(run())
    noisy_snr = float(snr_rows[:n_noisy].mean())
    clean_snr = float(snr_rows[n_noisy:].mean())

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = float(np.asarray(run())[0])   # host transfer forces completion
        times.append(time.perf_counter() - t0)
    dt = min(times) / R
    audio_sec = batch * duration
    value = audio_sec / dt
    print(json.dumps({
        "metric": "batched analyze+resynth throughput",
        "value": round(value, 2),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(value / BASELINE_X_REALTIME, 3),
        "detail": {
            "batch": batch, "duration_s": duration,
            "best_step_s": round(dt, 4), "pallas": bool(pallas),
            "steps_per_dispatch": R,
            "clean_roundtrip_snr_db": round(clean_snr, 2),
            "noisy_estimation_snr_db": round(noisy_snr, 2),
            # static constant measured once by scripts/headroom.py (CPU
            # experiment, 2026-08-18 fixtures); NOT recomputed here --
            # re-run headroom.py if the fixtures or denoiser change
            "noisy_oracle_bound_db_static": 40.9,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = float(v) if "." in v else int(v)
    # retries with backoff: the remote-device relay in this image drops
    # dispatches and has gone UNAVAILABLE for stretches (2026-08-18
    # outage); a failed bench should not lose the round's number if the
    # tunnel recovers within a few minutes
    waits = (10, 60, 180, 300)
    for attempt in range(len(waits) + 1):
        try:
            main(**kw)
            break
        except Exception:
            if attempt == len(waits):
                raise
            time.sleep(waits[attempt])
