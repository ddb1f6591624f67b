"""Bisect synthesis cost: oscillator+OLA only vs noise path only.

  python scripts/profile_synth.py [batch=64] [duration=2.0]
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch=64, duration=2.0, iters=3):
    import jax
    import jax.numpy as jnp

    from libllsm2_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()   # no-op on CPU (cross-machine AOT risk)

    from libllsm2_tpu import ChunkConf, create_aoptions, create_soptions
    from libllsm2_tpu.models import layer0
    from libllsm2_tpu.ops import harmonics
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

    analyze_b = jax.jit(jax.vmap(lambda a, b: layer0._analyze_jit(opt, a, b)))
    chunks = analyze_b(x, f0)

    nhop = conf.nhop

    def harm_only(c):
        nx = c.f0.shape[0] * nhop
        centers = jnp.arange(c.f0.shape[0], dtype=jnp.int32) * nhop
        cyc = harmonics.sample_cycles(c.f0, nhop, conf.fs, nx)
        segs = harmonics.oscillator_bank(cyc, centers, c.ampl, c.phse,
                                         c.hm_mask, nhop=nhop,
                                         use_pallas=True)
        return harmonics.overlap_add_half(segs, nhop, nx)

    def noise_only(c):
        nx = c.f0.shape[0] * nhop
        cyc = harmonics.sample_cycles(c.f0, nhop, conf.fs, nx)
        return layer0._synth_noise(c, cyc, nx, jax.random.PRNGKey(1),
                                   conf.fs, nhop)

    def env_only(c):
        nx = c.f0.shape[0] * nhop
        centers = jnp.arange(c.f0.shape[0], dtype=jnp.int32) * nhop
        cyc = harmonics.sample_cycles(c.f0, nhop, conf.fs, nx)
        env, base = layer0._render_envelopes(c, cyc, centers, nx, nhop)
        return env

    def timeit(fn):
        f = jax.jit(jax.vmap(fn))
        out = f(chunks)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:4]
        ts = []
        for _i in range(iters):
            t0 = time.perf_counter()
            out = f(chunks)
            _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:4]
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def cyc_only(c):
        nx = c.f0.shape[0] * nhop
        return harmonics.sample_cycles(c.f0, nhop, conf.fs, nx)

    def osc_only(c):
        # oscillator bank with a trivial (precomputed-free) phase ramp:
        # isolates the pallas kernel + OLA from the cycle scan
        nx = c.f0.shape[0] * nhop
        centers = jnp.arange(c.f0.shape[0], dtype=jnp.int32) * nhop
        cyc = (jnp.arange(nx, dtype=jnp.float32) * (150.0 / conf.fs)) % 1.0
        segs = harmonics.oscillator_bank(cyc, centers, c.ampl, c.phse,
                                         c.hm_mask, nhop=nhop,
                                         use_pallas=True)
        return harmonics.overlap_add_half(segs, nhop, nx)

    res = {
        "cyc_only_s": round(timeit(cyc_only), 4),
        "osc_only_s": round(timeit(osc_only), 4),
        "harm_only_s": round(timeit(harm_only), 4),
        "env_only_s": round(timeit(env_only), 4),
        "noise_only_s": round(timeit(noise_only), 4),
        "batch": batch,
    }
    print(json.dumps(res))


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = float(v) if "." in v else int(v)
    main(**kw)
