"""Microbenchmark: MXU-matmul projection kernel vs the rotation kernel.

Times each variant with R repeats inside one lax.scan dispatch (the
profile_true methodology -- the relay's per-dispatch marshaling would
otherwise swamp sub-100ms programs).  Shapes mirror bench.py's conf
(f0_floor=70) at a configurable frame count.

Usage: python scripts/bench_mxu_kernel.py [frames=12800] [repeats=8]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(frames=12800, repeats=8, iters=3, variants="mxu_hi,mxu_def,rot"):
    import jax
    import jax.numpy as jnp

    from libllsm2_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()   # no-op on CPU (cross-machine AOT risk)

    from libllsm2_tpu.config import ChunkConf
    from libllsm2_tpu.ops import harmonics
    from libllsm2_tpu.ops.pallas_osc import (harmonic_project_mxu,
                                             harmonic_project_win_pallas)
    from libllsm2_tpu.utils import testsig

    conf = ChunkConf(f0_floor=70.0)
    nhop, fs = conf.nhop, conf.fs
    N = int(frames)
    nx = N * nhop
    # tile a 2 s utterance out to N frames
    x0, f00 = testsig.make_test_utterance(duration=2.0, seed=0,
                                          noise_level=0.05)
    rep = -(-N // len(f00))
    x = jnp.asarray(np.tile(x0, rep)[:nx], jnp.float32)
    f0 = jnp.asarray(np.tile(f00, rep)[:N], jnp.float32)
    centers = jnp.arange(N, dtype=jnp.int32) * nhop
    cyc = harmonics.sample_cycles(f0, nhop, fs, nx)
    H = conf.halfwin_max
    hh = -(-H // nhop)
    voiced = f0 > 0
    f0s = jnp.where(voiced, f0, 100.0)
    hw = jnp.clip(conf.rel_winsize * fs / (2.0 * f0s), 2.0, float(H))
    K = conf.maxnhar
    R = int(repeats)

    def scan_time(fn):
        @jax.jit
        def run():
            def body(c, i):
                out = fn(x + jnp.float32(1e-7) * i)
                return c + out, None
            s, _ = jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(R, dtype=jnp.int32))
            return s
        _ = float(np.asarray(run()))          # compile + warm
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            _ = float(np.asarray(run()))
            ts.append(time.perf_counter() - t0)
        return min(ts) / R

    def mxu(prec):
        def fn(xx):
            re, im, ws, xs = harmonic_project_mxu(
                xx, cyc, hw, K, nhop, hh, precision=prec)
            return jnp.sum(re[:, 0]) + jnp.sum(im[:, -1]) + jnp.sum(ws)
        return fn

    def rot(xx):
        frames_ = harmonics.frame_hops(xx, N, nhop, hh)
        dcf = harmonics.frame_hops(cyc, N, nhop, hh, mode="edge") \
            - cyc[centers][:, None]
        hw_int = jnp.ceil(hw).astype(jnp.int32)
        C = hh * nhop
        re, im, ws, xs = harmonic_project_win_pallas(
            dcf, frames_, hw, K, lo=C - hw_int, hi=C + hw_int + 1,
            center=C, window="hanning")
        return jnp.sum(re[:, 0]) + jnp.sum(im[:, -1]) + jnp.sum(ws)

    table = {"mxu_hi": mxu("highest"), "mxu_def": mxu("default"),
             "rot": rot}
    for name in variants.split(","):
        dt = scan_time(table[name])
        print(f"{name:8s} {dt * 1e3:8.2f} ms / call "
              f"({N} frames, K={K}, hh={hh})")


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = v if k == "variants" else (float(v) if "." in v else int(v))
    main(**kw)
