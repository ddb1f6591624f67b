"""BASELINE config 5 demo: 1000 mixed-length utterances, padded/bucketed,
streaming analysis+synthesis.  Run on the TPU (default backend) or on the
CPU mesh (JAX_PLATFORMS=cpu + --xla_force_host_platform_device_count).

  python scripts/corpus_demo.py [n_utts=1000] [batch=64] [pallas=1]

Prints one JSON line with throughput and SNR statistics.
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_utts=1000, batch=64, pallas=1):
    import jax

    from libllsm2_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()   # no-op on CPU (cross-machine AOT risk)

    from libllsm2_tpu import ChunkConf, create_aoptions, create_soptions
    from libllsm2_tpu.parallel import corpus
    from libllsm2_tpu.utils import testsig

    conf = ChunkConf(f0_floor=70.0)
    opt = dataclasses.replace(create_aoptions(), conf=conf,
                              use_pallas=bool(pallas))
    sopt = dataclasses.replace(create_soptions(), use_pallas=bool(pallas))

    rng = np.random.default_rng(0)
    sigs, f0s = [], []
    total_audio = 0.0
    for i in range(n_utts):
        dur = float(rng.uniform(0.5, 2.0))
        x, f0 = testsig.make_test_utterance(duration=dur, seed=i,
                                            noise_level=0.05)
        sigs.append(x.astype(np.float32))
        f0s.append(f0)
        total_audio += len(x) / conf.fs

    buckets = (200, 400)
    # warm-up/compile pass on one batch per bucket shape
    warm = list(corpus.run_corpus(opt, sopt, sigs[:2 * batch],
                                  f0s[:2 * batch], bucket_frames=buckets,
                                  batch_size=batch))
    del warm

    ckpt = {}
    t0 = time.perf_counter()
    snrs = []
    nbatches = 0
    for r in corpus.run_corpus(opt, sopt, sigs, f0s, bucket_frames=buckets,
                               batch_size=batch, checkpoint=ckpt):
        snrs.append(r["snr"])
        nbatches += 1
    # force completion of the last device work
    _ = np.asarray(snrs[-1])
    dt = time.perf_counter() - t0
    snr_all = np.concatenate(snrs)
    print(json.dumps({
        "metric": "corpus analyze+resynth (config 5)",
        "value": round(total_audio / dt, 2),
        "unit": "audio-sec/sec/chip",
        "detail": {
            "n_utts": n_utts, "batches": nbatches,
            "total_audio_s": round(total_audio, 1),
            "wall_s": round(dt, 3),
            "snr_db_median": round(float(np.median(snr_all)), 2),
            "snr_db_p10": round(float(np.percentile(snr_all, 10)), 2),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = int(v)
    main(**kw)
