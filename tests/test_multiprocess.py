"""True multi-process distributed exercise (VERDICT r1 item 4).

The reference has no distributed backend at all (SURVEY.md §2.3); this
is the net-new capability: two OS processes join a jax.distributed
coordination service (gloo CPU collectives), build the hybrid
DCN x ICI mesh (parallel/mesh.py:make_multihost_mesh — the branch the
single-process tests can never reach), and run the SAME dp-sharded
separation through the public API. Every process's output must equal
the single-process result.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = Path(__file__).parent / "multiproc_worker.py"
REPO = Path(__file__).parent.parent


@pytest.mark.slow
def test_two_process_hybrid_mesh_separation(tmp_path):
    out = tmp_path / "stems"
    port = "19857"
    env = {**os.environ, "PYTHONPATH": str(REPO)}
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), "2", port, str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=str(REPO), env=env)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{logs[i][-3000:]}"

    outs = [np.load(f"{out}.{i}.npy") for i in range(2)]
    # both processes computed (and replicated) the same global result
    np.testing.assert_array_equal(outs[0], outs[1])

    # single-process reference through the same public API
    import jax

    jax.config.update("jax_platforms", "cpu")
    from demucs_tpu import params as P
    from demucs_tpu.config import HTDEMUCS_4S
    from demucs_tpu.models import htdemucs_segment
    from demucs_tpu.parallel import ShardedSeparator
    from demucs_tpu.parallel.mesh import make_mesh
    from demucs_tpu.pipeline import ApplyOptions

    cfg = HTDEMUCS_4S
    tree = P.unflatten_tree(P.init_flat(P.htdemucs_schema(cfg), seed=7))
    sep = ShardedSeparator(
        lambda p, m: htdemucs_segment(p, m, cfg), tree,
        num_sources=cfg.num_sources, mesh=make_mesh(),
        options=ApplyOptions(segment_samples=16384, shift_offset=123,
                             max_shift_secs=0.02, batch_size=8))
    track = (np.random.default_rng(21).standard_normal((2, 30000)) * 0.1
             ).astype(np.float32)
    ref = sep(track)
    np.testing.assert_allclose(outs[0], ref, atol=2e-5)
