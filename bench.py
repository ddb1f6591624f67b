"""Benchmark: batched analyze+resynthesis throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-sec/sec/chip", "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north-star target of
500x realtime per chip (the reference publishes no numbers; BASELINE.md).
Runs on whatever jax's default backend is (the real TPU under the driver;
CPU if JAX_PLATFORMS=cpu).
"""
import dataclasses
import json
import sys
import time

import numpy as np

BASELINE_X_REALTIME = 500.0


def main(batch=128, duration=8.0, iters=3, pallas=1, fchunk=0):
    import jax
    import jax.numpy as jnp

    # persistent compile cache: repeated bench runs (and the driver's
    # end-of-round run) skip the slow first compile
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from libllsm2_tpu import ChunkConf, create_aoptions, create_soptions
    from libllsm2_tpu.parallel import corpus
    from libllsm2_tpu.utils import testsig

    conf = ChunkConf(f0_floor=70.0)   # window budget sized for speech F0s
    opt = dataclasses.replace(create_aoptions(), conf=conf,
                              use_pallas=bool(pallas),
                              frame_chunk=int(fchunk))
    sopt = dataclasses.replace(create_soptions(), use_pallas=bool(pallas))

    xs, f0s, refs = [], [], []
    for i in range(batch):
        x, f0, x_harm = testsig.make_test_utterance(
            duration=duration, seed=i, noise_level=0.05, return_parts=True)
        xs.append(x)
        f0s.append(f0)
        refs.append(x_harm)
    x = jnp.asarray(np.stack(xs), jnp.float32)
    f0 = jnp.asarray(np.stack(f0s), jnp.float32)
    # SNR oracle = the CLEAN harmonic component (the fixtures carry
    # noise_level=0.05 breath noise; comparing against the noisy mix
    # would confound the metric with the fixture's own noise floor)
    x_ref = jnp.asarray(np.stack(refs), jnp.float32)
    nxv = jnp.full((batch,), x.shape[1], jnp.int32)

    # the big arrays are CLOSED OVER (device-resident constants) and the
    # step returns only scalars: this image's relay marshals jit call
    # arguments/results per dispatch, which at batch 128 adds ~0.2 s/step
    # of pure tunnel overhead that a local chip would never see
    @jax.jit
    def step(eps):
        y, snr, mean_snr = corpus.batched_pipeline(opt, sopt, x + eps, f0,
                                                   nxv, x_ref)
        return mean_snr, y[0, 0]

    # compile + warm up
    mean_snr, _y0 = step(jnp.float32(0.0))
    _ = np.asarray(mean_snr)   # full sync via host transfer

    times = []
    for i in range(iters):
        # vary an input so no caching layer can elide the step
        t0 = time.perf_counter()
        mean_snr, _y0 = step(jnp.float32(1e-7 * (i + 1)))
        _ = np.asarray(mean_snr)   # host transfer forces completion
        times.append(time.perf_counter() - t0)
    dt = min(times)
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
            "mean_harmonic_snr_db": round(float(mean_snr), 2),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = float(v) if "." in v else int(v)
    # one retry: the remote-device relay in this image occasionally drops a
    # dispatch; a failed bench should not lose the round's number
    try:
        main(**kw)
    except Exception:
        time.sleep(10)
        main(**kw)
