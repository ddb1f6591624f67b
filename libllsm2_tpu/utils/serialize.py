"""Chunk serialization: save/load the whole parameter set.

The reference has no checkpoint subsystem; its nearest analog is the
in-memory llsm_chunk that callers serialize themselves (SURVEY.md
section 5 "Checkpoint / resume").  Here chunks are flat npz archives with
the conf stored as JSON, so a corpus run can checkpoint per-bucket
progress and an ML pipeline can stage parameters to disk.  An orbax-based
variant is provided for sharded multi-host arrays.
"""
from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from ..config import ChunkConf
from ..container import Chunk

_ARRAY_FIELDS = ["f0", "ampl", "phse", "hm_mask", "psd", "edc",
                 "eenv_a", "eenv_p", "rd", "vtmagn", "vsphse"]


def chunk_save(path: str, chunk: Chunk) -> None:
    """Save a chunk (and its self-describing conf) to an npz file."""
    arrays = {}
    for name in _ARRAY_FIELDS:
        v = getattr(chunk, name)
        if v is not None:
            arrays[name] = np.asarray(v)
    for k, v in (chunk.extras or {}).items():
        arrays["extra_" + k] = np.asarray(v)
    conf_json = json.dumps(dataclasses.asdict(chunk.conf))
    np.savez(path, __conf__=np.frombuffer(conf_json.encode(), np.uint8),
             **arrays)


def chunk_load(path: str) -> Chunk:
    """Load a chunk saved by chunk_save."""
    z = np.load(path)
    conf_dict = json.loads(bytes(z["__conf__"]).decode())
    conf_dict["chanfreq"] = tuple(conf_dict["chanfreq"])
    conf = ChunkConf(**conf_dict)
    kw = {}
    for name in _ARRAY_FIELDS:
        kw[name] = jnp.asarray(z[name]) if name in z.files else None
    extras = {n[len("extra_"):]: jnp.asarray(z[n]) for n in z.files
              if n.startswith("extra_")}
    return Chunk(conf=conf, extras=extras or None, **kw)


def chunk_save_orbax(path: str, chunk: Chunk) -> None:
    """Orbax checkpoint of a chunk (for sharded/multi-host arrays)."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        arrays = {n: getattr(chunk, n) for n in _ARRAY_FIELDS
                  if getattr(chunk, n) is not None}
        arrays["__conf__"] = json.dumps(dataclasses.asdict(chunk.conf))
        ckptr.save(path, arrays)


def chunk_load_orbax(path: str) -> Chunk:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        data = ckptr.restore(path)
    conf_dict = json.loads(data.pop("__conf__"))
    conf_dict["chanfreq"] = tuple(conf_dict["chanfreq"])
    conf = ChunkConf(**conf_dict)
    kw = {n: (jnp.asarray(data[n]) if n in data else None)
          for n in _ARRAY_FIELDS}
    return Chunk(conf=conf, **kw)


def coded_save(path: str, cc, vectors, bits: int = 8,
               quant=None) -> None:
    """Save coder vectors as a compact quantized archive (the storage /
    transmission form of the coder's fixed-width vectors; the reference
    leaves serialization to the caller -- SURVEY.md section 5).

    cc: models.coder.CoderConfig; vectors: [N, cc.dims] float encodes.
    bits: 8 (4x smaller than float32) or 16 (near-lossless).  Pass a
    prefitted models.coder.Quantizer to share one codebook across many
    files (recommended for a corpus: per-file ranges would make files
    non-interchangeable).

    At bits=8 the F0 slot additionally rides a 16-bit SIDE ARRAY
    (+2 bytes/frame = +0.8%): slot ablation (round 5) measured the
    8-bit F0 step (~1 Hz over a corpus range) as THE waveform-SNR
    bottleneck -- decode re-propagates phases from F0, so a 0.5% pitch
    step decorrelates the render within ~20 frames (16 dB with only F0
    quantized vs 36 dB with only Rd) while every parametric metric
    stays clean.  The 16-bit F0 restores phase-coherent decodes."""
    from ..models import coder as coder_mod

    v = np.asarray(vectors, np.float32)
    q = quant or coder_mod.fit_quantizer(
        v, bits=bits, dpcm=coder_mod.default_dpcm_mask(cc),
        f0_slot=coder_mod.f0_slot(cc))
    codes = coder_mod.quantize(q, v)
    meta = {"conf": dataclasses.asdict(cc.conf), "nvt": cc.nvt,
            "npsd_c": cc.npsd_c, "with_phase": cc.with_phase,
            "bits": q.bits,
            "f0_slot": None if q.f0_slot is None else int(q.f0_slot)}
    extra = {}
    if q.dpcm is not None:
        extra = {"dpcm": np.asarray(q.dpcm), "dlo": np.asarray(q.dlo),
                 "dhi": np.asarray(q.dhi)}
    if q.bits <= 8 and q.f0_slot is not None:
        s = int(q.f0_slot)
        step16 = max(float(q.hi[s] - q.lo[s]), 1e-12) / 65535.0
        extra["f016"] = np.round(
            (np.clip(v[..., s], q.lo[s], q.hi[s]) - q.lo[s])
            / step16).astype(np.uint16)
    np.savez(path, __coded__=np.frombuffer(json.dumps(meta).encode(),
                                           np.uint8),
             codes=codes, lo=np.asarray(q.lo), hi=np.asarray(q.hi),
             **extra)


def coded_load(path: str):
    """Load a coded_save archive -> (CoderConfig, vectors float32).
    The vectors feed models.coder.decode / decode_frames directly."""
    from ..models import coder as coder_mod

    z = np.load(path)
    meta = json.loads(bytes(z["__coded__"]).decode())
    conf_dict = meta["conf"]
    conf_dict["chanfreq"] = tuple(conf_dict["chanfreq"])
    cc = coder_mod.CoderConfig(conf=ChunkConf(**conf_dict),
                               nvt=meta["nvt"], npsd_c=meta["npsd_c"],
                               with_phase=meta["with_phase"])
    q = coder_mod.Quantizer(
        lo=z["lo"], hi=z["hi"], bits=meta["bits"],
        dpcm=z["dpcm"] if "dpcm" in z.files else None,
        dlo=z["dlo"] if "dlo" in z.files else None,
        dhi=z["dhi"] if "dhi" in z.files else None,
        f0_slot=meta.get("f0_slot"))
    v = coder_mod.dequantize(q, z["codes"])
    if "f016" in z.files and q.f0_slot is not None:
        s = int(q.f0_slot)
        step16 = max(float(q.hi[s] - q.lo[s]), 1e-12) / 65535.0
        v[..., s] = (q.lo[s]
                     + z["f016"].astype(np.float32) * step16)
    return cc, v
