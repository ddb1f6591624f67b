"""Microbench the Pallas kernels on the TPU (scan-repeat trick to beat
the relay dispatch floor).

  python scripts/bench_kernels.py [repeats=8]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(repeats=8, iters=3, N=1600, W=915, K=80, B=8):
    import jax
    import jax.numpy as jnp

    from libllsm2_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()   # no-op on CPU (cross-machine AOT risk)

    from libllsm2_tpu.ops import pallas_osc

    R = int(repeats)
    rng = np.random.default_rng(0)
    dc = jnp.asarray(rng.uniform(-2, 2, (B, N, W)), jnp.float32)
    xw = np.asarray(rng.standard_normal((B, N, W)), np.float32)
    # realistic speech-F0 active widths (f0 ~ 119..162 at fs 16k, rel 4)
    f0 = rng.uniform(119, 162, (B, N))
    hw = np.ceil(4 * 16000 / (2 * f0)).astype(np.int32)
    aw = 2 * hw + 1
    xw[np.arange(W)[None, None, :] >= aw[:, :, None]] = 0.0
    xw = jnp.asarray(xw)
    awj = jnp.asarray(aw)
    kl = jnp.asarray(np.minimum(np.ceil(8000 / f0) - 1, K).astype(np.int32))

    results = {}

    def timed(name, fn):
        def body(c, i):
            return c + fn(jnp.float32(1e-7) * (i + 1)), None
        f = jax.jit(lambda: jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(R, dtype=jnp.int32))[0])
        t0 = time.perf_counter()
        float(np.asarray(f()))
        comp = time.perf_counter() - t0
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(np.asarray(f()))
            ts.append(time.perf_counter() - t0)
        results[name] = round(min(ts), 4)
        print(json.dumps({name: results[name], "compile_s": round(comp, 1)}),
              flush=True)

    timed("floor", lambda eps: eps * 2.0)

    loj = jnp.zeros_like(awj)

    def proj(eps, use_aw, wb):
        def one(d, x):
            re, im = pallas_osc.harmonic_project_pallas(
                d + eps, x, K, lo=loj[0] if use_aw else None,
                hi=awj[0] if use_aw else None, wblock=wb)
            return jnp.sum(re[:, 0])
        return jnp.sum(jax.vmap(one)(dc, xw))

    timed("proj_full_512", lambda e: proj(e, False, 512))
    timed("proj_aw_512", lambda e: proj(e, True, 512))
    timed("proj_aw_256", lambda e: proj(e, True, 256))
    timed("proj_aw_128", lambda e: proj(e, True, 128))

    def osc(eps, use_kl):
        T = 160
        dct = dc[:, :, :T]
        ampl = jnp.ones((N, K), jnp.float32)
        phse = jnp.zeros((N, K), jnp.float32)
        mask = (jnp.arange(K)[None, :] < kl[0][:, None]).astype(jnp.float32)

        def one(d):
            segs = pallas_osc.osc_bank_pallas(
                d + eps, ampl, phse, mask, kl=kl[0] if use_kl else None)
            return jnp.sum(segs[:, 0])
        return jnp.sum(jax.vmap(one)(dct))

    timed("osc_full", lambda e: osc(e, False))
    timed("osc_kl", lambda e: osc(e, True))

    floor = results["floor"]
    out = {k: round((v - floor) / R, 5) for k, v in results.items()
           if k != "floor"}
    print("SUMMARY " + json.dumps(out), flush=True)


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = float(v) if "." in v else int(v)
    main(**{k: int(v) for k, v in kw.items()})
