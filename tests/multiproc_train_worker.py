"""Worker for the multi-process distributed TRAINING test.

Each process: jax.distributed.initialize (CPU/gloo), hybrid DCN x ICI
mesh, one dp-sharded training step on the same global batch
(make_sharded_train_step), dump the loss and a sampled updated leaf.
The parent compares across processes and against single-process.

Usage: python multiproc_train_worker.py PROC_ID NUM_PROCS PORT OUT
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

    import dataclasses

    import optax

    from demucs_tpu import params as P
    from demucs_tpu.config import HTDEMUCS_4S
    from demucs_tpu.parallel.mesh import make_multihost_mesh
    from demucs_tpu.train import make_sharded_train_step

    cfg = dataclasses.replace(HTDEMUCS_4S, channels=8, bottom_channels=32,
                              t_layers=3)
    params = P.unflatten_tree(P.init_flat(P.htdemucs_schema(cfg), seed=0))
    mesh = make_multihost_mesh(tp=1, bag=1)
    dp = mesh.shape["dp"]

    rng = np.random.default_rng(0)
    seg = 8192
    mix = (rng.standard_normal((dp, 2, seg)) * 0.1).astype(np.float32)
    refs = (rng.standard_normal((dp, cfg.num_sources, 2, seg)) * 0.05
            ).astype(np.float32)

    place_fn, step_fn, place_batch = make_sharded_train_step(
        mesh, cfg, optax.adam(1e-3))
    p, s = place_fn(params)
    mix_sh, refs_sh = place_batch(mix, refs)
    p, s, loss = step_fn(p, s, mix_sh, refs_sh)

    # gather a sampled leaf to the host (allgather via process-local
    # addressable shards requires replication; use jax.device_get on a
    # fully-replicated copy)
    leaf = jax.tree.leaves(p)[0]
    rep = jax.device_get(
        jax.jit(lambda x: x,
                out_shardings=jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec()))(leaf))
    np.savez(f"{out}.{proc_id}.npz", loss=float(loss), leaf=np.asarray(rep))
    print("worker", proc_id, "ok", float(loss))


if __name__ == "__main__":
    main()
