"""Microbenchmarks for the phase-domain analysis primitives (hm_method
"pd" prototype, round 2): measures the risky ops on the real TPU before
committing to the design.

  (a) 1D monotone gather: resample x (oversampled) at nphi warped points
  (b) batched rfft over phase-grid STFT frames
  (c) sorted segment-sum (bincount) for the phase->time inverse map
  (d) hop-block slicing on the phase grid (uniform centers)

  python scripts/bench_pd_ops.py [batch=32] [repeats=8]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch=32, repeats=8, iters=3, cpu=0):
    import jax
    import jax.numpy as jnp

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    from libllsm2_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()   # no-op on CPU (cross-machine AOT risk)

    R = int(repeats)
    nx = 128000          # 8 s at 16 kHz
    nx2 = 2 * nx         # 2x FFT-oversampled
    nphi = 4 * nx        # phase-grid budget
    B = int(batch)

    rng = np.random.default_rng(0)
    x2 = jnp.asarray(rng.standard_normal((B, nx2)), jnp.float32)
    # monotone fractional positions into x2
    pos = jnp.asarray(
        np.sort(rng.uniform(0, nx2 - 2, (B, nphi))).astype(np.float32))
    xg = jnp.asarray(rng.standard_normal((B, 3500, 1024)), jnp.float32)
    phi_cells = jnp.asarray(
        np.sort(rng.integers(0, nphi, (B, nx))).astype(np.int32))

    results = {}

    def sync(v):
        return float(np.asarray(v).ravel()[0])

    def timed(name, fn):
        def body(c, i):
            return c + fn(jnp.float32(1e-7) * (i + 1)), None

        f = jax.jit(lambda: jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(R, dtype=jnp.int32))[0])
        t0 = time.perf_counter()
        sync(f())
        comp = time.perf_counter() - t0
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            sync(f())
            ts.append(time.perf_counter() - t0)
        results[name] = round(min(ts), 4)
        print(json.dumps({name: results[name],
                          "compile_s": round(comp, 1)}), flush=True)

    timed("floor", lambda eps: eps * 2.0)

    def gather1d(eps):
        p = pos + eps
        i0 = p.astype(jnp.int32)
        frac = p - i0
        a = jnp.take_along_axis(x2, i0, axis=1)
        b = jnp.take_along_axis(x2, i0 + 1, axis=1)
        y = a + (b - a) * frac
        return jnp.sum(y[:, 0])

    def gather1d_flat(eps):
        # flattened single-axis gather (sometimes lowers differently)
        p = (pos[0] + eps).astype(jnp.int32)
        y = jnp.take(x2[0], p)
        return jnp.sum(y[:1]) * B

    def rfft_frames(eps):
        s = jnp.fft.rfft(xg + eps, axis=-1)
        return jnp.sum(jnp.abs(s[:, 0, 0]))

    def segsum(eps):
        ones = jnp.ones((B, nx), jnp.float32) + eps
        out = jax.vmap(lambda idx, v: jnp.zeros(
            (nphi,), jnp.float32).at[idx].add(v))(phi_cells, ones)
        return jnp.sum(out[:, 0])

    def cumsum_big(eps):
        return jnp.sum(jnp.cumsum(x2 + eps, axis=-1)[:, -1]) * 0 + eps

    for name, fn in [("gather1d", gather1d),
                     ("gather1d_flat", gather1d_flat),
                     ("rfft_frames", rfft_frames),
                     ("segsum_sorted", segsum),
                     ("cumsum_nx2", cumsum_big)]:
        try:
            timed(name, fn)
        except Exception as e:
            print(json.dumps({name + "_error": repr(e)[:150]}), flush=True)

    floor = results.get("floor", 0.0)
    out = {k: round(max(v - floor, 0) / R, 5) for k, v in results.items()
           if k != "floor"}
    out["batch"] = B
    print("SUMMARY " + json.dumps(out), flush=True)


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = float(v) if "." in v else int(v)
    main(**kw)
