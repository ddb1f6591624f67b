"""XLA cost analysis of the batched pipeline: total flops / bytes accessed.

Compiles the batch pipeline for the current backend and prints the
compiler's cost model numbers -- used to check whether the pipeline step
is compute-bound or HBM-bound before optimizing (round 2).

  JAX_PLATFORMS=cpu python scripts/cost_analysis.py [batch=8] [duration=8.0]
"""
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch=8, duration=8.0, cpu=1):
    import jax
    import jax.numpy as jnp

    if cpu:
        jax.config.update("jax_platforms", "cpu")

    from libllsm2_tpu import ChunkConf, create_aoptions, create_soptions
    from libllsm2_tpu.parallel import corpus
    from libllsm2_tpu.utils import testsig

    conf = ChunkConf(f0_floor=70.0)
    opt = dataclasses.replace(create_aoptions(), conf=conf, use_pallas=True)
    sopt = dataclasses.replace(create_soptions(), use_pallas=True)

    xs, f0s = [], []
    for i in range(batch):
        x, f0 = testsig.make_test_utterance(duration=duration, seed=i,
                                            noise_level=0.05)
        xs.append(x)
        f0s.append(f0)
    x = jnp.asarray(np.stack(xs), jnp.float32)
    f0 = jnp.asarray(np.stack(f0s), jnp.float32)
    nxv = jnp.full((batch,), x.shape[1], jnp.int32)

    fn = jax.jit(lambda a, b, c: corpus.batched_pipeline(opt, sopt, a, b, c))
    lowered = fn.lower(x, f0, nxv)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    keys = ["flops", "bytes accessed", "transcendentals",
            "bytes accessed output", "optimal_seconds"]
    out = {k: ca.get(k) for k in keys if k in ca}
    out["batch"] = batch
    out["duration"] = duration
    # per audio-second rates
    audio = batch * duration
    if "flops" in out and out["flops"]:
        out["gflops_per_audio_sec"] = round(out["flops"] / audio / 1e9, 3)
    if "bytes accessed" in out and out["bytes accessed"]:
        out["gb_per_audio_sec"] = round(out["bytes accessed"] / audio / 1e9,
                                        4)
    if "transcendentals" in out and out["transcendentals"]:
        out["gtrans_per_audio_sec"] = round(
            out["transcendentals"] / audio / 1e9, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = float(v) if "." in v else int(v)
    main(**kw)
