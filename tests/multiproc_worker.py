"""Worker for the real multi-process distributed test.

Each process: jax.distributed.initialize on the CPU backend (gloo
collectives), build the hybrid DCN x ICI mesh via make_multihost_mesh,
run a dp-sharded separation of the same track through the public
ShardedSeparator API, and dump the result. The parent test compares
every process's output to a single-process reference.

Usage: python multiproc_worker.py PROC_ID NUM_PROCS PORT OUT_NPY
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import numpy as np


def main():
    proc_id, nprocs, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=nprocs,
                               process_id=proc_id)
    assert jax.process_count() == nprocs
    assert jax.device_count() == 4 * nprocs

    from demucs_tpu import params as P
    from demucs_tpu.config import HTDEMUCS_4S
    from demucs_tpu.models import htdemucs_segment
    from demucs_tpu.parallel import ShardedSeparator
    from demucs_tpu.parallel.mesh import make_multihost_mesh
    from demucs_tpu.pipeline import ApplyOptions

    mesh = make_multihost_mesh(tp=1, bag=1)   # (1, 8, 1): dp spans DCN
    assert mesh.shape["dp"] == 4 * nprocs

    cfg = HTDEMUCS_4S
    tree = P.unflatten_tree(P.init_flat(P.htdemucs_schema(cfg), seed=7))
    sep = ShardedSeparator(
        lambda p, m: htdemucs_segment(p, m, cfg), tree,
        num_sources=cfg.num_sources, mesh=mesh,
        options=ApplyOptions(segment_samples=16384, shift_offset=123,
                             max_shift_secs=0.02, batch_size=8))
    track = (np.random.default_rng(21).standard_normal((2, 30000)) * 0.1
             ).astype(np.float32)
    stems = sep(track)
    np.save(f"{out}.{proc_id}.npy", stems)
    print(f"proc {proc_id} done", flush=True)


if __name__ == "__main__":
    main()
