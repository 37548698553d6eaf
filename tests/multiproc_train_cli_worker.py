"""Worker for the multi-process distributed-training-via-CLI test.

Each process calls the REAL trainer entry point
(demucs_tpu.tools.train_cli.main) with --coordinator/--process-id/
--num-processes: jax.distributed.initialize, hybrid mesh,
make_sharded_train_step(augment=True), EMA, and the lead-process
checkpoint all exercised through the same code path a user runs.

Usage: python multiproc_train_cli_worker.py PROC_ID NUM_PROCS PORT CKPT
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"


def main():
    proc_id, nprocs, port, ckpt = (sys.argv[1], sys.argv[2],
                                   sys.argv[3], sys.argv[4])
    import jax

    jax.config.update("jax_platforms", "cpu")

    from demucs_tpu.tools.train_cli import main as train_main

    rc = train_main([
        "--synthetic", "--steps", "2", "--batch", "8",
        "--segment-samples", "8192", "--log-every", "1",
        "--test-tiny", "--seed", "0", "--lr", "1e-3",
        "--ema", "0.9", "--ckpt", ckpt, "--save-every", "100",
        "--coordinator", f"localhost:{port}",
        "--num-processes", nprocs, "--process-id", proc_id,
    ])
    print("worker", proc_id, "rc", rc)
    sys.exit(rc)


if __name__ == "__main__":
    main()
