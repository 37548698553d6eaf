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


@pytest.mark.slow
def test_two_process_training_via_cli(tmp_path):
    """Distributed training through the REAL user entry point
    (tools/train_cli.py --coordinator/--process-id/--num-processes):
    two processes train 2 augmented+EMA steps and the lead checkpoints;
    the result must match the same CLI run single-process (same seed,
    same global batches — only the dp reduction order may differ)."""
    port = "19861"
    ck2 = tmp_path / "ck2p"
    env = {**os.environ, "PYTHONPATH": str(REPO)}
    worker = Path(__file__).parent / "multiproc_train_cli_worker.py"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", port, str(ck2)],
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

    # single-process run of the SAME CLI invocation (in-process)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import optax

    from demucs_tpu.tools.train_cli import main as train_main
    from demucs_tpu.train import load_train_state

    ck1 = tmp_path / "ck1p"
    rc = train_main(["--synthetic", "--steps", "2", "--batch", "8",
                     "--segment-samples", "8192", "--log-every", "1",
                     "--test-tiny", "--seed", "0", "--lr", "1e-3",
                     "--ema", "0.9", "--ckpt", str(ck1),
                     "--save-every", "100"])
    assert rc == 0

    import dataclasses

    from demucs_tpu import params as P
    from demucs_tpu.config import HTDEMUCS_4S

    cfg = dataclasses.replace(HTDEMUCS_4S, channels=8, bottom_channels=32,
                              t_layers=3)
    like = P.unflatten_tree(P.init_flat(P.htdemucs_schema(cfg), seed=0))
    opt = optax.adam(1e-3)
    p2, _, step2, ema2 = load_train_state(ck2, like, opt)
    p1, _, step1, ema1 = load_train_state(ck1, like, opt)
    assert step1 == step2 == 2
    assert ema1 is not None and ema2 is not None
    # tolerance note: Adam's g/sqrt(v) update is scale-free, so the
    # dp-reduction-order noise in tiny gradients is amplified to a
    # visible fraction of one update step on near-zero-gradient leaves
    # (|update| -> lr regardless of |g|); gate at the 2-step x lr=1e-3
    # update bound, not at float precision — the r5 conv_tr hand-VJP
    # rounding shift pushed one dconv bias to 4.2e-4 under the old
    # 2e-4 gate, exactly this mechanism
    flat1, flat2 = P.flatten_tree(p1), P.flatten_tree(p2)
    for k in list(flat1)[::7]:
        np.testing.assert_allclose(flat2[k], flat1[k], rtol=1e-2,
                                   atol=1e-3, err_msg=k)
    e1, e2 = P.flatten_tree(ema1), P.flatten_tree(ema2)
    for k in list(e1)[::7]:
        np.testing.assert_allclose(e2[k], e1[k], rtol=1e-2, atol=1e-3,
                                   err_msg=k)


@pytest.mark.slow
def test_two_process_sharded_training_step(tmp_path):
    """Distributed TRAINING over the hybrid mesh: two processes run the
    same dp-sharded train step; losses and updated params must agree
    across processes and with the single-process step."""
    out = tmp_path / "train"
    port = "19859"
    env = {**os.environ, "PYTHONPATH": str(REPO)}
    worker = Path(__file__).parent / "multiproc_train_worker.py"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", port, str(out)],
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

    d0 = np.load(f"{out}.0.npz")
    d1 = np.load(f"{out}.1.npz")
    assert d0["loss"] == d1["loss"]
    np.testing.assert_array_equal(d0["leaf"], d1["leaf"])

    # single-process reference (8-device mesh = same global dp)
    import dataclasses

    import jax

    jax.config.update("jax_platforms", "cpu")
    import optax

    from demucs_tpu import params as P
    from demucs_tpu.config import HTDEMUCS_4S
    from demucs_tpu.parallel.mesh import make_mesh
    from demucs_tpu.train import make_sharded_train_step

    cfg = dataclasses.replace(HTDEMUCS_4S, channels=8, bottom_channels=32,
                              t_layers=3)
    params = P.unflatten_tree(P.init_flat(P.htdemucs_schema(cfg), seed=0))
    mesh = make_mesh(jax.devices()[:8], tp=1)
    rng = np.random.default_rng(0)
    seg = 8192
    mix = (rng.standard_normal((8, 2, seg)) * 0.1).astype(np.float32)
    refs = (rng.standard_normal((8, cfg.num_sources, 2, seg)) * 0.05
            ).astype(np.float32)
    place_fn, step_fn, place_batch = make_sharded_train_step(
        mesh, cfg, optax.adam(1e-3))
    p, s = place_fn(params)
    p, s, loss = step_fn(p, s, *place_batch(mix, refs))
    np.testing.assert_allclose(float(d0["loss"]), float(loss), rtol=1e-6)
    leaf_ref = np.asarray(jax.tree.leaves(p)[0])
    np.testing.assert_allclose(d0["leaf"], leaf_ref, rtol=1e-5, atol=1e-7)
