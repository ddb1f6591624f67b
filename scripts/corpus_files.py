"""BASELINE config 5 from FILES: analyze+resynthesize a directory of WAV
files (with .f0.npy sidecar tracks) through the native C++ batch loader,
with double-buffered host assembly overlapping device compute.

  python scripts/corpus_files.py [n_utts=1000] [batch=64] [pallas=1] \
      [dir=/tmp/llsm_corpus] [gen=1]

gen=1 synthesizes the corpus to dir first (excluded from the timed run).
Prints one JSON line with throughput and SNR statistics.
"""
import dataclasses
import json
import os
import functools
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def wav_nsamples(path: str) -> int:
    """Frame count from the RIFF header alone (no data read)."""
    from libllsm2_tpu.utils import dataio
    return dataio.wav_nsamples(path)


def generate_corpus(dirpath: str, n_utts: int, fs: float) -> None:
    from libllsm2_tpu.utils import audio, testsig
    os.makedirs(dirpath, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n_utts):
        wav = os.path.join(dirpath, f"utt{i:05d}.wav")
        if os.path.exists(wav):
            continue
        dur = float(rng.uniform(0.5, 2.0))
        x, f0 = testsig.make_test_utterance(duration=dur, seed=i,
                                            noise_level=0.05)
        audio.wavwrite(wav, x.astype(np.float32), fs)
        np.save(wav.replace(".wav", ".f0.npy"), f0.astype(np.float32))


def main(n_utts=1000, batch=64, pallas=1, dir="/tmp/llsm_corpus", gen=1,
         gmax=0):
    import jax
    import jax.numpy as jnp

    from libllsm2_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()   # no-op on CPU (cross-machine AOT risk)

    from libllsm2_tpu import ChunkConf, create_aoptions, create_soptions
    from libllsm2_tpu.parallel import corpus
    from libllsm2_tpu.utils import dataio

    conf = ChunkConf(f0_floor=70.0)
    opt = dataclasses.replace(create_aoptions(), conf=conf,
                              use_pallas=bool(pallas))
    sopt = dataclasses.replace(create_soptions(), use_pallas=bool(pallas))
    nhop = conf.nhop

    if gen:
        generate_corpus(dir, int(n_utts), conf.fs)
    paths = sorted(
        os.path.join(dir, p) for p in os.listdir(dir) if p.endswith(".wav")
    )[:int(n_utts)]
    assert paths, f"no WAV files in {dir}"
    assert dataio.native_available(), "native loader failed to build"

    # bucket by header-scanned length (no data reads)
    lengths = [wav_nsamples(p) for p in paths]
    nfrm_of = [n // nhop for n in lengths]
    buckets = corpus.make_buckets(nfrm_of, (200, 400))
    total_audio = sum(lengths) / conf.fs

    # batch plan: (bucket_frames, [paths...]) per batch, padded to `batch`
    plan = []
    for b, idxs in buckets.items():
        for s in range(0, len(idxs), int(batch)):
            plan.append((b, [paths[i] for i in idxs[s:s + int(batch)]]))

    def assemble(item):
        """Host side: native batch WAV load (int16 PCM: halves the
        host->device bytes) + f0 sidecar load + pad."""
        b, ps = item
        nsamp = b * nhop
        x, ln, _ = dataio.load_wav_batch(ps, nsamp, dtype="int16")
        B = int(batch)
        if x.shape[0] < B:                              # pad partial batch
            x = np.pad(x, ((0, B - x.shape[0]), (0, 0)))
            ln = np.pad(ln, (0, B - len(ln)))
        f0 = np.zeros((B, b), np.float32)
        for j, p in enumerate(ps):
            t = np.load(p.replace(".wav", ".f0.npy"))
            nf = min(len(t), b)
            f0[j, :nf] = t[:nf]
        return (jnp.asarray(x), jnp.asarray(f0),
                jnp.asarray(np.minimum(ln, nsamp).astype(np.int32)))

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def pipeline_snr(o, so, xi16, f0j, nxj):
        """snr-only wrapper: int16 PCM converts to float ON-CHIP, and the
        full [B, nx] output y (~8 MB of per-batch result marshaling over
        this image's relay) is dropped -- a corpus QA pass only needs
        the metrics."""
        xj = xi16.astype(jnp.float32) / 32767.0
        y, snr, _ = corpus.batched_pipeline(o, so, xj, f0j, nxj)
        return snr

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def pipeline_snr_scan(o, so, xi16, f0j, nxj):
        """Multi-batch dispatch: [G, B, ...] stacked same-bucket batches
        run as ONE lax.scan dispatch.  This image's relay charges a
        ~25 ms floor plus buffer marshaling PER DISPATCH; the round-2
        per-batch loop paid it ~16x per corpus (~0.4 s of the 0.92 s
        wall).  One scan per group pays it once (the same amortization
        bench.py uses)."""
        def body(_, inp):
            xi, f0i, nxi = inp
            xj = xi.astype(jnp.float32) / 32767.0
            _, snr, _ = corpus.batched_pipeline(o, so, xj, f0i, nxi)
            return None, snr
        _, snrs = jax.lax.scan(body, None, (xi16, f0j, nxj))
        return snrs                                        # [G, B]

    # group same-bucket batches for single-dispatch scans; pad each group
    # to GMAX batches (empty = zero rows) so each bucket compiles exactly
    # ONE scan shape (TPU compiles through this image's tunnel cost
    # 10-25 min per shape).  MEASURED (round 3): gmax=4 LOSES on this
    # image -- 662x vs 1362x per-batch -- because the relay's per-dispatch
    # marshaling scales with the argument bytes (grouping does not
    # amortize it), the padding wastes ~25% chip, and the coarser groups
    # overlap worse with host assembly.  The run is TRANSFER-BOUND
    # through the relay either way (see docs/STATUS.md round-3 notes:
    # loader 0.16 s CPU for 1000 utts, ~0.8 s host->device upload at the
    # relay's ~50 MB/s, ~0.2 s chip); gmax=0 (per-batch, depth-2 async)
    # remains the default and the fastest measured configuration.
    GMAX = int(gmax)
    if GMAX <= 0:
        # per-batch dispatch, depth-2 async (the measured-best config)
        for b in buckets:
            xj, f0j, nxj = assemble((b, [paths[0]]))
            _ = np.asarray(pipeline_snr(opt, sopt, xj, f0j, nxj))
        snrs, nbatches = [], 0
        host_busy = 0.0
        t0 = time.perf_counter()
        pending = None
        with ThreadPoolExecutor(max_workers=1) as pool:
            def timed_assemble1(item):
                nonlocal host_busy
                ta = time.perf_counter()
                out = assemble(item)
                host_busy += time.perf_counter() - ta
                return out
            fut = pool.submit(timed_assemble1, plan[0])
            for k in range(len(plan)):
                xj, f0j, nxj = fut.result()
                if k + 1 < len(plan):
                    fut = pool.submit(timed_assemble1, plan[k + 1])
                snr = pipeline_snr(opt, sopt, xj, f0j, nxj)
                if pending is not None:
                    s_, nv = pending
                    snrs.extend(np.asarray(s_)[:nv].tolist())
                pending = (snr, len(plan[k][1]))
                nbatches += 1
            s_, nv = pending
            snrs.extend(np.asarray(s_)[:nv].tolist())
        dt = time.perf_counter() - t0
        _report(total_audio, dt, paths, batch, nbatches, snrs, host_busy,
                nbatches)
        return
    groups = []            # (bucket_frames, [batch plan items])
    for b in buckets:
        items = [p for p in plan if p[0] == b]
        for s in range(0, len(items), GMAX):
            g = items[s:s + GMAX]
            g = g + [(b, [])] * (GMAX - len(g))
            groups.append((b, g))

    def assemble_empty(b):
        B = int(batch)
        return (jnp.zeros((B, b * nhop), jnp.int16),
                jnp.zeros((B, b), jnp.float32),
                jnp.zeros((B,), jnp.int32))

    def assemble_group(grp):
        b, items = grp
        parts = [assemble(it) if it[1] else assemble_empty(b)
                 for it in items]
        x = jnp.stack([p[0] for p in parts])
        f0 = jnp.stack([p[1] for p in parts])
        nx = jnp.stack([p[2] for p in parts])
        return x, f0, nx

    # warm-up/compile one scan shape per bucket (excluded from timing)
    for b in buckets:
        xj, f0j, nxj = assemble_group(
            (b, [(b, [paths[0]])] + [(b, [])] * (GMAX - 1)))
        _ = np.asarray(pipeline_snr_scan(opt, sopt, xj, f0j, nxj))

    # timed run: host thread assembles group k+1 (native loader +
    # host->device transfer) while the device runs group k
    snrs, nbatches = [], 0
    host_busy = 0.0
    t0 = time.perf_counter()
    pending = None   # (snr_device_array [G, B], valid row counts)
    with ThreadPoolExecutor(max_workers=1) as pool:
        def timed_assemble(grp):
            nonlocal host_busy
            ta = time.perf_counter()
            out = assemble_group(grp)
            host_busy += time.perf_counter() - ta
            return out
        fut = pool.submit(timed_assemble, groups[0])
        for k in range(len(groups)):
            xj, f0j, nxj = fut.result()
            if k + 1 < len(groups):
                fut = pool.submit(timed_assemble, groups[k + 1])
            snr = pipeline_snr_scan(opt, sopt, xj, f0j, nxj)
            if pending is not None:
                s, nvs = pending
                sa = np.asarray(s)
                for gi, nv in enumerate(nvs):
                    snrs.extend(sa[gi, :nv].tolist())
            pending = (snr, [len(it[1]) for it in groups[k][1]])
            nbatches += sum(1 for it in groups[k][1] if it[1])
        s, nvs = pending
        sa = np.asarray(s)
        for gi, nv in enumerate(nvs):
            snrs.extend(sa[gi, :nv].tolist())
    dt = time.perf_counter() - t0

    _report(total_audio, dt, paths, batch, nbatches, snrs, host_busy,
            len(groups))


def _report(total_audio, dt, paths, batch, nbatches, snrs, host_busy,
            dispatches):
    print(json.dumps({
        "metric": "file corpus analyze+resynth (native loader, "
                  "double-buffered)",
        "value": round(total_audio / dt, 1),
        "unit": "audio-sec/sec/chip",
        "detail": {
            "n_utts": len(paths), "batch": int(batch),
            "batches": nbatches, "wall_s": round(dt, 2),
            "audio_s": round(total_audio, 1),
            "mean_snr_db": round(float(np.mean(snrs)), 2),
            "host_assembly_s": round(host_busy, 2),
            "dispatches": dispatches,
            "native_loader": True,
        },
    }))


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = v if k == "dir" else (float(v) if "." in v else int(v))
    main(**kw)
