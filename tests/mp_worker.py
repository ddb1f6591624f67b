"""Worker process for test_multiprocess.py: joins a 2-process CPU
cluster through parallel.distributed.initialize_multihost and runs the
batched pipeline data-parallel across BOTH processes' devices.

Not a test module (no test_ prefix); launched as
  python mp_worker.py <pid> <nproc> <port>
with XLA_FLAGS=--xla_force_host_platform_device_count=<local devices>.
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize forces axon

import numpy as np  # noqa: E402


def main(pid: int, nproc: int, port: str) -> None:
    from libllsm2_tpu.parallel import distributed

    distributed.initialize_multihost(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()

    import dataclasses

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from libllsm2_tpu import ChunkConf, create_aoptions, create_soptions
    from libllsm2_tpu.parallel import corpus, distributed as dist
    from libllsm2_tpu.utils import testsig

    conf = ChunkConf(maxnhar=16, npsd=32, nspec=65, f0_floor=90.0,
                     fnyq=6000.0)
    opt = dataclasses.replace(create_aoptions(), conf=conf)
    sopt = create_soptions()

    mesh = dist.global_mesh()
    n_local = jax.local_device_count()
    B = nproc * n_local                       # one utterance per device
    # identical corpus in every process; each contributes its local rows
    xs, f0s = [], []
    for i in range(B):
        x, f0 = testsig.make_test_utterance(duration=0.3, seed=i)
        xs.append(x.astype(np.float32))
        f0s.append(f0.astype(np.float32))
    x = np.stack(xs)
    f0 = np.stack(f0s)
    nxv = np.full((B,), x.shape[1], np.int32)
    lo, hi = pid * n_local, (pid + 1) * n_local
    sh = NamedSharding(mesh, P("batch"))
    xg = jax.make_array_from_process_local_data(sh, x[lo:hi], x.shape)
    f0g = jax.make_array_from_process_local_data(sh, f0[lo:hi], f0.shape)
    nxg = jax.make_array_from_process_local_data(sh, nxv[lo:hi], nxv.shape)

    y, snr, mean_snr = corpus.batched_pipeline(opt, sopt, xg, f0g, nxg)
    # mean_snr is a cross-process psum-backed reduction; replicate to host
    rep = jax.jit(lambda v: v, out_shardings=NamedSharding(mesh, P()))(
        mean_snr)
    val = float(np.asarray(jax.device_get(rep)))
    assert np.isfinite(val)
    print(f"MP_OK pid={pid} devices={jax.device_count()} "
          f"mean_snr={val:.4f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
