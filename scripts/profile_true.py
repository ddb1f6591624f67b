"""True per-component TPU timings, immune to the relay dispatch floor.

The axon relay imposes a ~225 ms floor per dispatch, so sub-second
programs cannot be timed individually (round-1 stage splits were
confounded by this).  Trick: repeat each component R times inside ONE
jitted lax.scan (inputs perturbed per step so XLA cannot CSE), time the
single dispatch, subtract the measured floor, divide by R.

  python scripts/profile_true.py [batch=32] [duration=8.0] [repeats=4]
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch=32, duration=8.0, repeats=4, iters=3, cpu=0):
    import jax
    import jax.numpy as jnp

    if cpu:
        # sitecustomize's axon.register overrides JAX_PLATFORMS; this wins
        jax.config.update("jax_platforms", "cpu")
    from libllsm2_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()   # no-op on CPU (cross-machine AOT risk)

    from libllsm2_tpu import ChunkConf, create_aoptions, create_soptions
    from libllsm2_tpu.models import layer0
    from libllsm2_tpu.ops import harmonics
    from libllsm2_tpu.parallel import corpus
    from libllsm2_tpu.utils import testsig

    conf = ChunkConf(f0_floor=70.0)
    opt = dataclasses.replace(create_aoptions(), conf=conf, use_pallas=True)
    sopt = dataclasses.replace(create_soptions(), use_pallas=True)
    nhop = conf.nhop
    R = int(repeats)

    xs, f0s = [], []
    for i in range(batch):
        x, f0 = testsig.make_test_utterance(duration=duration, seed=i,
                                            noise_level=0.05)
        xs.append(x)
        f0s.append(f0)
    x = jnp.asarray(np.stack(xs), jnp.float32)
    f0 = jnp.asarray(np.stack(f0s), jnp.float32)
    nxv = jnp.full((batch,), x.shape[1], jnp.int32)

    analyze_b = jax.jit(jax.vmap(lambda a, b: layer0._analyze_jit(opt, a, b)))
    chunks = analyze_b(x, f0)
    chunks = jax.tree.map(lambda a: a.block_until_ready(), chunks)

    results = {}

    def sync(v):
        return float(np.asarray(v).ravel()[0])

    def timed(name, fn):
        """fn: (eps scalar) -> scalar; scanned R times in one dispatch."""
        def body(c, i):
            return c + fn(jnp.float32(1e-7) * (i + 1)), None

        f = jax.jit(lambda: jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(R, dtype=jnp.int32))[0])
        t0 = time.perf_counter()
        sync(f())
        results[name + "_compile_s"] = round(time.perf_counter() - t0, 1)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            sync(f())
            ts.append(time.perf_counter() - t0)
        results[name + "_wall_s"] = round(min(ts), 4)
        print(json.dumps({name: results[name + "_wall_s"],
                          "compile_s": results[name + "_compile_s"]}),
              flush=True)

    # dispatch floor: trivial program
    timed("floor", lambda eps: eps * 2.0)

    nfrm = f0.shape[1]
    nx = nfrm * nhop
    centers = jnp.arange(nfrm, dtype=jnp.int32) * nhop

    def pipe(eps):
        y, snr, mean_snr = corpus.batched_pipeline.__wrapped__(
            opt, sopt, x + eps, f0, nxv)
        return mean_snr

    def ana(eps):
        c = jax.vmap(lambda a, b: layer0._analyze_jit.__wrapped__(opt, a, b))(
            x + eps, f0)
        return jnp.sum(c.ampl[:, 0, 0])

    def syn(eps):
        c = dataclasses.replace(chunks, ampl=chunks.ampl + eps)
        out = jax.vmap(lambda cc: layer0._synthesize_jit.__wrapped__(sopt, cc))(c)
        return jnp.sum(out.y[:, 0])

    def cyc_fn(eps):
        c = jax.vmap(lambda ff: harmonics.sample_cycles(ff, nhop, conf.fs, nx))(
            f0 + eps)
        return jnp.sum(c[:, -1])

    def osc(eps):
        def one(cc):
            cy = harmonics.sample_cycles(cc.f0, nhop, conf.fs, nx)
            segs = harmonics.oscillator_bank(cy, centers, cc.ampl, cc.phse,
                                             cc.hm_mask, nhop=nhop,
                                             use_pallas=True)
            return harmonics.overlap_add_half(segs, nhop, nx)
        c = dataclasses.replace(chunks, ampl=chunks.ampl + eps)
        return jnp.sum(jax.vmap(one)(c)[:, 0])

    def noise(eps):
        def one(cc):
            cy = harmonics.sample_cycles(cc.f0, nhop, conf.fs, nx)
            return layer0._synth_noise(cc, cy, nx, jax.random.PRNGKey(1),
                                       conf.fs, nhop)
        c = dataclasses.replace(chunks, psd=chunks.psd + eps)
        return jnp.sum(jax.vmap(one)(c)[:, 0])

    def env(eps):
        def one(cc):
            cy = harmonics.sample_cycles(cc.f0, nhop, conf.fs, nx)
            e, b = layer0._render_envelopes(cc, cy, centers, nx, nhop)
            return e
        c = dataclasses.replace(chunks, edc=chunks.edc + eps)
        return jnp.sum(jax.vmap(one)(c)[:, 0, 0])

    def proj(eps):
        # nhop passed: the gather-free hop-block framing the pipeline uses
        def one(xx, ff):
            cy = harmonics.sample_cycles(ff, nhop, conf.fs, nx)
            a, p, m = harmonics.harmonic_analysis(
                xx, ff, centers, cy, fs=conf.fs, max_k=conf.maxnhar,
                halfwin_max=conf.halfwin_max, rel_winsize=conf.rel_winsize,
                fnyq=conf.fnyq, use_pallas=True, nhop=nhop)
            return a[0, 0]
        return jnp.sum(jax.vmap(one)(x + eps, f0))

    def envpass(eps):
        # the full noise-envelope analysis pass as analyze runs it:
        # decimated band envelopes + per-channel projections with DC row
        conf_ = opt.conf
        D = layer0._env_decimation(conf_, opt.env_decimate, nx)
        fs_d = conf_.fs / D
        nhop_d = nhop // D
        H_d = -(-conf_.halfwin_max // D)

        def one(xx, ff):
            cy = harmonics.sample_cycles(ff, nhop, conf_.fs, nx)
            envs = layer0._band_envelopes(xx, conf_, D)
            nfrm_ = ff.shape[0]
            centers_d = jnp.arange(nfrm_, dtype=jnp.int32) * nhop_d

            def env_chan(env_c):
                ea, ep, _, edc = harmonics.harmonic_analysis(
                    env_c, ff, centers_d, cy[::D], fs=fs_d,
                    max_k=conf_.maxnhar_e, halfwin_max=H_d,
                    rel_winsize=conf_.rel_winsize,
                    fnyq=min(conf_.fnyq, 0.4 * fs_d),
                    use_pallas=True, nhop=nhop_d, with_dc=True)
                return edc, ea, ep
            edc, ea, ep = jax.vmap(env_chan)(envs)
            return edc[0, 0] + ea[0, 0, 0]
        return jnp.sum(jax.vmap(one)(x + eps, f0))

    def refine(eps):
        def one(xx, ff):
            return harmonics.refine_f0(
                xx, ff, centers, fs=conf.fs, halfwin_max=conf.halfwin_max,
                rel_winsize=conf.rel_winsize, use_pallas=True,
                nhop=nhop)[0]
        return jnp.sum(jax.vmap(one)(x + eps, f0))

    def ana_norefine(eps):
        o2 = dataclasses.replace(opt, f0_refine=False)
        c = jax.vmap(lambda a, b: layer0._analyze_jit.__wrapped__(o2, a, b))(
            x + eps, f0)
        return jnp.sum(c.ampl[:, 0, 0])

    def ana_1pass(eps):
        o2 = dataclasses.replace(opt, hm_passes=1)
        c = jax.vmap(lambda a, b: layer0._analyze_jit.__wrapped__(o2, a, b))(
            x + eps, f0)
        return jnp.sum(c.ampl[:, 0, 0])

    def envchan(eps):
        conf_ = opt.conf

        def one(xx, ff):
            cy = harmonics.sample_cycles(ff, nhop, conf_.fs, nx)
            ea, ep, _ = harmonics.harmonic_analysis(
                xx, ff, centers, cy, fs=conf_.fs, max_k=conf_.maxnhar_e,
                halfwin_max=conf_.halfwin_max,
                rel_winsize=conf_.rel_winsize, fnyq=conf_.fnyq,
                use_pallas=True, nhop=nhop)
            return ea[0, 0]
        return jnp.sum(jax.vmap(one)(x + eps, f0))

    def denoise(eps):
        def one(cc):
            cy = harmonics.sample_cycles(cc.f0, nhop, conf.fs, nx)
            a, ph = layer0._track_denoise(
                conf, cc.f0, cy, centers, cc.ampl + eps, cc.phse,
                cc.hm_mask, opt.track_denoise_hz,
                opt.track_denoise_strength, use_pallas=True)
            return a[0, 0]
        return jnp.sum(jax.vmap(one)(chunks))

    def denoise_spec(eps):
        # the DEFAULT pipeline path (spectral gate on top of the time
        # gate; VERDICT r4 weak #2 -- its cost was shipped unpriced)
        def one(cc):
            cy = harmonics.sample_cycles(cc.f0, nhop, conf.fs, nx)
            a, ph = layer0._track_denoise(
                conf, cc.f0, cy, centers, cc.ampl + eps, cc.phse,
                cc.hm_mask, opt.track_denoise_hz,
                opt.track_denoise_strength, use_pallas=True,
                spectral=opt.track_denoise_spectral,
                a_spec=opt.track_spectral_strength)
            return a[0, 0]
        return jnp.sum(jax.vmap(one)(chunks))

    def deconv(eps):
        def one(cc):
            cy = harmonics.sample_cycles(cc.f0, nhop, conf.fs, nx)
            a, ph = layer0._deconv_correction(
                opt, cc.f0, centers, cy, cc.ampl + eps, cc.phse,
                cc.hm_mask)
            return a[0, 0]
        return jnp.sum(jax.vmap(one)(chunks))

    def bandenv(eps):
        conf_ = opt.conf

        def one(xx):
            envs = layer0._band_envelopes(xx, conf_)
            psd = layer0._warped_psd(xx, centers, conf_)
            return envs[0, 0] + psd[0, 0]
        return jnp.sum(jax.vmap(one)(x + eps))

    for name, fn in [("pipeline", pipe), ("analysis", ana),
                     ("ana_norefine", ana_norefine),
                     ("ana_1pass", ana_1pass), ("envchan", envchan),
                     ("envpass", envpass), ("bandenv", bandenv),
                     ("synthesis", syn), ("proj1", proj),
                     ("refine", refine), ("cyc", cyc_fn), ("osc", osc),
                     ("noise", noise), ("env", env),
                     ("denoise", denoise), ("denoise_spec", denoise_spec),
                     ("deconv", deconv)]:
        try:
            timed(name, fn)
        except Exception as e:  # OOM etc -- keep going
            results[name + "_error"] = repr(e)[:200]
            print(json.dumps({name + "_error": repr(e)[:200]}), flush=True)

    floor = results.get("floor_wall_s", 0.0)
    audio = batch * duration
    summary = {"batch": batch, "duration": duration, "repeats": R,
               "floor_s": floor}
    for name in ["pipeline", "analysis", "ana_norefine", "ana_1pass",
                 "envchan", "envpass", "bandenv", "synthesis", "proj1",
                 "refine", "cyc", "osc", "noise", "env", "denoise",
                 "denoise_spec", "deconv"]:
        w = results.get(name + "_wall_s")
        if w is None:
            continue
        per = max(w - floor, 1e-9) / R
        summary[name + "_s"] = round(per, 4)
        summary[name + "_x_rt"] = round(audio / per, 1)
    print("SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = float(v) if "." in v else int(v)
    main(**kw)
