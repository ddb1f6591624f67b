"""Per-stage throughput breakdown on the current backend: analysis only,
synthesis only, and the fused pipeline -- identifies the next kernel to
optimize.  Prints one JSON line.

  python scripts/profile_stages.py [batch=64] [duration=2.0] [pallas=1]
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch=64, duration=2.0, pallas=1, iters=3):
    import jax
    import jax.numpy as jnp

    from libllsm2_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()   # no-op on CPU (cross-machine AOT risk)

    from libllsm2_tpu import ChunkConf, create_aoptions, create_soptions
    from libllsm2_tpu.models import layer0
    from libllsm2_tpu.utils import testsig

    conf = ChunkConf(f0_floor=70.0)
    opt = dataclasses.replace(create_aoptions(), conf=conf,
                              use_pallas=bool(pallas))
    sopt = dataclasses.replace(create_soptions(), use_pallas=bool(pallas))

    xs, f0s = [], []
    for i in range(batch):
        x, f0 = testsig.make_test_utterance(duration=duration, seed=i,
                                            noise_level=0.05)
        xs.append(x)
        f0s.append(f0)
    x = jnp.asarray(np.stack(xs), jnp.float32)
    f0 = jnp.asarray(np.stack(f0s), jnp.float32)

    analyze_b = jax.jit(jax.vmap(lambda a, b: layer0._analyze_jit(opt, a, b)))
    synth_b = jax.jit(jax.vmap(lambda c: layer0._synthesize_jit(sopt, c).y))

    def timeit(fn, *args):
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:4]
        ts = []
        for _i in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:4]
            ts.append(time.perf_counter() - t0)
        return min(ts), out

    t_an, chunks = timeit(analyze_b, x, f0)
    t_sy, _ = timeit(synth_b, chunks)
    audio = batch * duration
    print(json.dumps({
        "metric": "stage breakdown",
        "unit": "audio-sec/sec/chip",
        "analysis_x": round(audio / t_an, 1),
        "synthesis_x": round(audio / t_sy, 1),
        "analysis_s": round(t_an, 4),
        "synthesis_s": round(t_sy, 4),
        "batch": batch, "pallas": bool(pallas),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = float(v) if "." in v else int(v)
    main(**kw)
