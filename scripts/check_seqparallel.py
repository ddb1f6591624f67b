"""Diagnose what the compiler actually does with frame-sharded analysis.

VERDICT r3 weak #3: round 3's `seqparallel.analyze_frame_sharded` was pure
sharding annotation; `pallas_call` is not GSPMD-partitionable, so XLA
all-gathered the inputs and ran the kernels replicated (measured here:
0.92x per-device flops vs the replicated compile).  Round 4 rewrote the
module with shard_map + explicit ppermute halos; this script compiles BOTH
forms on an 8-virtual-device CPU mesh and reports per-device flops and
every all-gather's output shape (full-size shapes = replication, 1/8-ish
shapes or track-rate shapes = real partitioning).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/check_seqparallel.py
"""
import functools
import os
import re
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses

from libllsm2_tpu import ChunkConf, create_aoptions
from libllsm2_tpu.models import layer0
from libllsm2_tpu.parallel import mesh as meshlib, seqparallel
from libllsm2_tpu.utils import testsig


def report(tag, compiled):
    txt = compiled.as_text()
    print(f"\n=== {tag} ===")
    ags = re.findall(r"= (\w+\[[^\]]*\])[^\n]*all-gather", txt)
    print(f"all-gather ops: {len(ags)}")
    for s in ags[:12]:
        print("  AG out:", s)
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        print("flops (per device):", ca.get("flops"))
        return ca.get("flops")
    except Exception as e:
        print("cost_analysis failed:", e)
        return None


def main():
    conf = ChunkConf(maxnhar=24, npsd=32, nspec=65, f0_floor=90.0,
                     fnyq=6000.0)
    use_pallas = "--pallas" in sys.argv
    opt = dataclasses.replace(create_aoptions(), conf=conf,
                              use_pallas=use_pallas)
    x, f0 = testsig.make_test_utterance(duration=0.8, seed=4)
    m = meshlib.make_mesh(8, frame_parallel=8)
    x = jnp.asarray(x, jnp.float32)
    f0 = jnp.asarray(f0, jnp.float32)
    n_frm = f0.shape[0]

    # round-4 shard_map path
    fn = jax.shard_map(
        functools.partial(seqparallel._analyze_local, opt, 8, n_frm),
        mesh=m, in_specs=(P(meshlib.FRAME_AXIS), P(meshlib.FRAME_AXIS)),
        out_specs=P(meshlib.FRAME_AXIS), check_vma=False)
    f_sm = report(f"shard_map analyze (use_pallas={use_pallas})",
                  jax.jit(fn).lower(x, f0).compile())

    # round-3 annotation-only path (kept for comparison)
    xs = jax.device_put(x, NamedSharding(m, P(meshlib.FRAME_AXIS)))
    f0s = jax.device_put(f0, NamedSharding(m, P(meshlib.FRAME_AXIS)))
    f_an = report("annotation-only analyze",
                  jax.jit(layer0._analyze_jit, static_argnums=0)
                  .lower(opt, xs, f0s).compile())

    # single-device reference
    f_1 = report("single-device analyze",
                 jax.jit(layer0._analyze_jit, static_argnums=0)
                 .lower(opt, x, f0).compile())
    if f_sm and f_1:
        print(f"\nper-device/single-device flop ratio: "
              f"shard_map {f_sm / f_1:.3f}  annotation {f_an / f_1:.3f} "
              f"(1/8 ideal; halo overhead dominates at "
              f"{n_frm // 8}-frame shards)")


if __name__ == "__main__":
    main()
