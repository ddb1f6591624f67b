"""Benchmark: multi-stream real-time serving throughput (StreamPool).

Measures the production-serving scenario: N concurrent streaming voices,
each rendered feed_block hops per service tick, ALL riding one batched
device dispatch (runtime.rtserve).  Reports:

  - end-to-end aggregate throughput (streams x realtime) through this
    image's relay, including host assembly + per-tick dispatch,
  - the pure chip cost of the batched render step (R repeats inside one
    lax.scan dispatch -- the relay-floor-free number),
  - per-tick latency breakdown (host assembly vs device).

Usage: python scripts/bench_serve.py [streams=64] [block=16] [ticks=30]
       [platform=]   (e.g. platform=cpu for a host-only smoke run)
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(streams=64, block=16, ticks=30, platform=""):
    import jax
    import jax.numpy as jnp

    from libllsm2_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()   # no-op on CPU (cross-machine AOT risk)
    if platform:
        jax.config.update("jax_platforms", platform)

    from libllsm2_tpu import ChunkConf, create_aoptions, create_soptions
    from libllsm2_tpu.models import layer0
    from libllsm2_tpu.runtime import rtsynth
    from libllsm2_tpu.runtime.rtserve import StreamPool
    from libllsm2_tpu.utils import testsig

    conf = ChunkConf(f0_floor=70.0)
    opt = dataclasses.replace(create_aoptions(), conf=conf,
                              track_denoise=False)
    sopt = create_soptions()
    fs = conf.fs
    nhop = conf.nhop

    # a handful of distinct voices, cycled across the pool
    rng = np.random.default_rng(7)
    voices = []
    for v in range(4):
        nfrm = int(2.0 / conf.thop)
        f0 = testsig.make_f0_track(nfrm, conf.thop,
                                   f0_base=float(rng.uniform(110, 240)))
        x, _ = testsig.synth_lf_speech(f0, noise_level=0.03)
        voices.append(layer0.analyze(opt, np.asarray(x), f0))
    frames = [rtsynth.RTSynthesizer.chunk_frames_np(c) for c in voices]

    pool = StreamPool(sopt, conf, n_streams=streams, feed_block=block,
                      capacity_frames=4 * block + 8)
    pos = [0] * streams

    def feed_tick():
        for s in range(streams):
            src = frames[s % len(voices)]
            need = block + (1 if pool.streams[s]._pending is None else 0)
            while len(pool._q[s]) < need:
                take = min(len(src) - pos[s], need - len(pool._q[s]))
                pool.feed(s, src[pos[s]:pos[s] + take])
                pos[s] += take
                if pos[s] >= len(src):
                    pos[s] = 0   # loop the voice

    # warm up: compile the batched step (and pay the relay compile once)
    feed_tick()
    t0 = time.time()
    assert pool.service() == streams
    warm = time.time() - t0
    for s in range(streams):
        pool.fetch(s, pool.readable(s))

    # timed end-to-end serving loop
    t_feed = t_service = 0.0
    t0 = time.time()
    for _ in range(ticks):
        ta = time.time()
        feed_tick()
        tb = time.time()
        n = pool.service()
        assert n == streams
        # force the device sync + drain output (the product of the tick)
        for s in range(streams):
            y = pool.fetch(s, pool.readable(s))
        tc = time.time()
        t_feed += tb - ta
        t_service += tc - tb
    wall = time.time() - t0
    audio_sec = streams * ticks * block * nhop / fs
    x_rt = audio_sec / wall

    # pure chip cost of the batched render: R repeats in ONE scan dispatch
    S, MB = streams, block
    K = conf.maxnhar
    ins = dict(
        ampl=0.01 * rng.standard_normal((S * MB, K)),
        phse=rng.standard_normal((S * MB, K)),
        mask=np.ones((S * MB, K)),
        dc=np.cumsum(np.full((S * MB, 2 * nhop), 150.0 / fs), axis=1),
        psd=0.01 * np.ones((S * MB, conf.npsd)),
        edc=0.01 * np.ones((S * MB, conf.nchannel)),
        ea=0.001 * np.ones((S * MB, conf.nchannel, conf.maxnhar_e)),
        ep=np.zeros((S * MB, conf.nchannel, conf.maxnhar_e)),
        noise=rng.standard_normal((S * MB, 2 * nhop)),
        voiced=np.ones((S * MB,)))
    order = ("ampl", "phse", "mask", "dc", "psd", "edc", "ea", "ep",
             "noise", "voiced")
    args = tuple(jnp.asarray(ins[k], jnp.float32) for k in order)
    R = 32

    import functools

    @functools.partial(jax.jit, static_argnums=())
    def scan_step(args):
        def body(carry, t):
            a = (args[0] + t * 1e-6,) + args[1:]
            seg = rtsynth._render_frames(conf, *a)
            return carry + seg[0, 0], 0.0
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(R, dtype=jnp.float32))
        return acc

    float(scan_step(args))  # compile
    t0 = time.time()
    v = float(scan_step(args))
    chip_per_tick = (time.time() - t0) / R
    chip_x_rt = (streams * block * nhop / fs) / max(chip_per_tick, 1e-9)

    out = {
        "metric": "serving_streams_x_realtime",
        "value": round(x_rt, 1),
        "unit": "aggregate audio-sec/sec/chip",
        "streams": streams,
        "block_hops": block,
        "tick_latency_ms": round(1000 * wall / ticks, 2),
        "host_assembly_ms_per_tick": round(1000 * t_feed / ticks
                                           + 1000 * (t_service / ticks
                                                     - chip_per_tick), 2),
        "chip_render_x_realtime": round(chip_x_rt, 1),
        "chip_render_ms_per_tick": round(1000 * chip_per_tick, 3),
        "warmup_s": round(warm, 2),
        "dispatches": pool.dispatches,
        "sink": v,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, _, v = a.partition("=")
        kw[k] = v if k == "platform" else int(v)
    main(**kw)
