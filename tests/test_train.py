"""Training-step tests (net-new capability; the reference is
inference-only — SURVEY.md §1). Tiny configs on the CPU mesh."""

import dataclasses
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from demucs_tpu import params as P
from demucs_tpu.config import HTDEMUCS_4S


def _tiny():
    cfg = dataclasses.replace(HTDEMUCS_4S, channels=8, bottom_channels=32,
                              t_layers=3)
    params = P.unflatten_tree(P.init_flat(P.htdemucs_schema(cfg), seed=0))
    rng = np.random.default_rng(0)
    seg = 8192
    mix = jnp.asarray((rng.standard_normal((2, 2, seg)) * 0.1)
                      .astype(np.float32))
    refs = jnp.asarray((rng.standard_normal((2, cfg.num_sources, 2, seg))
                        * 0.05).astype(np.float32))
    return cfg, params, mix, refs


def test_train_step_decreases_loss():
    from demucs_tpu.train import make_train_step

    cfg, params, mix, refs = _tiny()
    import optax
    init_fn, step_fn = make_train_step(cfg, optax.adam(1e-3))
    opt_state = init_fn(params)
    losses = []
    for _ in range(5):
        params, opt_state, loss = step_fn(params, opt_state, mix, refs)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # same batch every step: Adam must make progress on it
    assert losses[-1] < losses[0]


def test_remat_matches_no_remat():
    """jax.checkpoint changes memory, not math: grads must agree."""
    from demucs_tpu.train import l1_loss

    cfg, params, mix, refs = _tiny()
    g1 = jax.grad(lambda p: l1_loss(p, mix, refs, cfg, remat=False))(params)
    g2 = jax.grad(lambda p: l1_loss(p, mix, refs, cfg, remat=True))(params)
    flat1, flat2 = jax.tree.leaves(g1), jax.tree.leaves(g2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


@pytest.mark.slow
def test_sharded_train_step_matches_single():
    """dp=2 x tp=2 sharded step == unsharded step (loss and params)."""
    from demucs_tpu.parallel.mesh import make_mesh
    from demucs_tpu.train import make_sharded_train_step, make_train_step

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    cfg, params, mix, refs = _tiny()
    import optax
    opt = optax.adam(1e-3)

    init_fn, step_fn = make_train_step(cfg, opt)
    p_ref = jax.tree.map(lambda x: jnp.asarray(x), params)
    s_ref = init_fn(p_ref)
    p_ref, s_ref, l_ref = step_fn(p_ref, s_ref, mix, refs)

    mesh = make_mesh(jax.devices()[:4], tp=2)
    place_fn, sh_step, place_batch = make_sharded_train_step(mesh, cfg, opt)
    p_sh, s_sh = place_fn(params)
    mix_sh, refs_sh = place_batch(np.asarray(mix), np.asarray(refs))
    p_sh, s_sh, l_sh = sh_step(p_sh, s_sh, mix_sh, refs_sh)

    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-5)
    flat_r = P.flatten_tree(jax.tree.map(np.asarray, p_ref))
    flat_s = P.flatten_tree(jax.tree.map(np.asarray, p_sh))
    for k in list(flat_r)[::13]:  # sample the tree
        np.testing.assert_allclose(flat_s[k], flat_r[k], rtol=2e-4,
                                   atol=2e-5, err_msg=k)


def test_sdpa_custom_vjp_matches_autodiff():
    """The hand-written SDPA backward (recompute softmax, flash-style)
    must match JAX autodiff of the plain einsum implementation."""
    from demucs_tpu.ops.attention import _sdpa, _sdpa_einsum

    rng = np.random.default_rng(3)
    B, T, S, H, D = 2, 24, 16, 4, 8
    Q = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    K = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    V = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))

    def loss_custom(q, k, v):
        return jnp.sum(jnp.square(_sdpa(q, k, v)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(_sdpa_einsum(q, k, v)))

    g_c = jax.grad(loss_custom, argnums=(0, 1, 2))(Q, K, V)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(Q, K, V)
    for a, b in zip(g_c, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_ema_tracks_params():
    """EMA weights converge toward the trained weights at rate
    (1 - decay) per step and stay a valid model pytree."""
    from demucs_tpu.train import make_train_step

    cfg, params, mix, refs = _tiny()
    import optax
    init_fn, step_fn = make_train_step(cfg, optax.adam(1e-3),
                                       ema_decay=0.5)
    # device-placed params: init_fn must make a REAL ema copy, or the
    # donated step crashes with donate-the-same-buffer-twice
    params = jax.tree.map(jnp.asarray, params)
    state = init_fn(params)
    p0 = jax.tree.leaves(params)[0].copy()
    p, s, _ = step_fn(params, state, mix, refs)
    p, s, _ = step_fn(p, s, mix, refs)
    _, ema = s
    leaf_p = np.asarray(jax.tree.leaves(p)[0])
    leaf_e = np.asarray(jax.tree.leaves(ema)[0])
    leaf_0 = np.asarray(p0)
    # ema lies strictly between the init and the current params
    # wherever they moved
    moved = np.abs(leaf_p - leaf_0) > 1e-7
    between = ((leaf_e - leaf_0) * (leaf_p - leaf_e))[moved]
    assert (between >= -1e-12).all()
    assert not np.allclose(leaf_e, leaf_p)


def test_checkpoint_resume_is_exact(tmp_path):
    """save_train_state / load_train_state round-trips the full state:
    training resumed from a checkpoint produces bit-identical params to
    uninterrupted training."""
    import optax
    from demucs_tpu.train import (load_train_state, make_train_step,
                                  save_train_state)

    cfg, params, mix, refs = _tiny()
    opt = optax.adam(1e-3)
    init_fn, step_fn = make_train_step(cfg, opt)

    # uninterrupted: 4 steps
    p_ref = jax.tree.map(jnp.asarray, params)
    s_ref = init_fn(p_ref)
    for _ in range(4):
        p_ref, s_ref, _ = step_fn(p_ref, s_ref, mix, refs)

    # interrupted: 2 steps, checkpoint, restore, 2 more
    p = jax.tree.map(jnp.asarray, params)
    s = init_fn(p)
    for _ in range(2):
        p, s, _ = step_fn(p, s, mix, refs)
    save_train_state(tmp_path / "ckpt", p, s, step=2)
    p2, s2, step, ema = load_train_state(tmp_path / "ckpt", params, opt)
    assert step == 2
    assert ema is None  # saved without an EMA tree
    for _ in range(2):
        p2, s2, _ = step_fn(p2, s2, mix, refs)

    flat_a = jax.tree.leaves(p_ref)
    flat_b = jax.tree.leaves(p2)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_resume_with_ema_is_exact(tmp_path):
    """EMA training state (params + opt + EMA tree) round-trips: resume
    reproduces uninterrupted training bit-exactly INCLUDING the EMA."""
    import optax
    from demucs_tpu.train import (load_train_state, make_train_step,
                                  save_train_state)

    cfg, params, mix, refs = _tiny()
    opt = optax.adam(1e-3)
    init_fn, step_fn = make_train_step(cfg, opt, ema_decay=0.9)

    p_ref = jax.tree.map(jnp.asarray, params)
    s_ref = init_fn(p_ref)
    for _ in range(4):
        p_ref, s_ref, _ = step_fn(p_ref, s_ref, mix, refs)
    _, ema_ref = s_ref

    p = jax.tree.map(jnp.asarray, params)
    s = init_fn(p)
    for _ in range(2):
        p, s, _ = step_fn(p, s, mix, refs)
    opt_s, ema = s
    save_train_state(tmp_path / "ckpt", p, opt_s, step=2, ema=ema)
    p2, opt2, step, ema2 = load_train_state(tmp_path / "ckpt", params, opt)
    assert step == 2 and ema2 is not None
    s2 = (opt2, jax.tree.map(jnp.asarray, ema2))
    p2 = jax.tree.map(jnp.asarray, p2)
    for _ in range(2):
        p2, s2, _ = step_fn(p2, s2, mix, refs)
    _, ema2 = s2
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(ema_ref), jax.tree.leaves(ema2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_crash_between_renames_recovers(tmp_path):
    """Simulate a crash between save_train_state's two swap renames
    (live path missing, .new holds the newest complete state): load
    must pick .new, and the NEXT save must not destroy it."""
    import optax
    from demucs_tpu.train import (load_train_state, make_train_step,
                                  save_train_state)

    cfg, params, mix, refs = _tiny()
    opt = optax.adam(1e-3)
    init_fn, step_fn = make_train_step(cfg, opt)
    p = jax.tree.map(jnp.asarray, params)
    s = init_fn(p)
    p, s, _ = step_fn(p, s, mix, refs)

    ck = tmp_path / "ckpt"
    save_train_state(ck, p, s, step=1)
    p, s, _ = step_fn(p, s, mix, refs)
    save_train_state(ck, p, s, step=2)
    # crash window reconstruction: step-2 state in .new, step-1 in .old,
    # live path gone (the exact state after `path.rename(old)`)
    ck.rename(tmp_path / "ckpt.old")  # pretend this is the old one
    # build .new = a fresh save of step 2, then delete the live path
    save_train_state(tmp_path / "ckpt2", p, s, step=2)
    (tmp_path / "ckpt2").rename(tmp_path / "ckpt.new")

    # load prefers the NEWER .new over .old
    _, _, step, _ = load_train_state(ck, params, opt)
    assert step == 2
    # the next save must rescue .new (not rmtree it) and end with a
    # complete live checkpoint
    p, s, _ = step_fn(p, s, mix, refs)
    save_train_state(ck, p, s, step=3)
    _, _, step, _ = load_train_state(ck, params, opt)
    assert step == 3
    assert ck.exists()
    assert not (tmp_path / "ckpt.new").exists()
    assert not (tmp_path / "ckpt.old").exists()


@pytest.mark.slow
def test_train_cli_synthetic_smoke(tmp_path, capsys):
    """End-to-end trainer CLI: synthetic data, 3 steps, checkpoint out,
    then resume for 1 more step."""
    from demucs_tpu.tools.train_cli import main as train_main

    ck = str(tmp_path / "ck")
    rc = train_main(["--synthetic", "--steps", "3", "--batch", "1",
                     "--segment-samples", "8192", "--log-every", "1",
                     "--ckpt", ck, "--save-every", "100"])
    assert rc == 0
    out = capsys.readouterr()
    assert "done: final loss" in out.out
    rc = train_main(["--synthetic", "--steps", "4", "--batch", "1",
                     "--segment-samples", "8192", "--ckpt", ck,
                     "--resume", "--log-every", "1"])
    assert rc == 0
    assert "resumed at step 3" in capsys.readouterr().err


@pytest.mark.slow
def test_train_cli_eval_loop(tmp_path, capsys):
    """--eval-every: held-out L1 (+SDR) curve on the EMA weights, a
    CKPT.eval.jsonl series, and a best-so-far checkpoint (VERDICT r4
    #5: a long run must produce rankable checkpoints)."""
    import json

    from demucs_tpu.tools.train_cli import main as train_main

    ck = str(tmp_path / "ck")
    rc = train_main(["--synthetic", "--steps", "4", "--batch", "1",
                     "--segment-samples", "8192", "--log-every", "1",
                     "--ckpt", ck, "--save-every", "100",
                     "--ema", "0.9", "--eval-every", "2", "--eval-sdr"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "eval @ step 2" in err and "eval @ step 4" in err
    recs = [json.loads(line) for line in
            Path(ck + ".eval.jsonl").read_text().splitlines()]
    assert [r["step"] for r in recs] == [2, 4]
    assert all(r["weights"] == "ema" for r in recs)
    assert all(np.isfinite(r["l1"]) for r in recs)
    assert all("drums" in r["sdr"] for r in recs)
    assert recs[0].get("best")  # first eval always improves on +inf

    # the best checkpoint is a complete, loadable train state (EMA in)
    import optax

    from demucs_tpu import params as P2
    from demucs_tpu.config import HTDEMUCS_4S as CFG
    from demucs_tpu.train import load_train_state

    like = P2.unflatten_tree(P2.init_flat(P2.htdemucs_schema(CFG), seed=0))
    p, o, s, ema = load_train_state(ck + ".best", like, optax.adam(3e-4))
    assert s in (2, 4) and ema is not None


@pytest.mark.slow
def test_train_cli_eval_data_dir(tmp_path, capsys):
    """--eval-data: held-out MUSDB-layout track dirs drive the eval
    loop (the load path --synthetic eval skips)."""
    from demucs_tpu import audio
    from demucs_tpu.config import HTDEMUCS_4S
    from demucs_tpu.tools.train_cli import main as train_main

    rng = np.random.default_rng(8)
    ev = tmp_path / "valid" / "track01"
    ev.mkdir(parents=True)
    for stem in HTDEMUCS_4S.sources:
        audio.write_wav(ev / f"{stem}.wav",
                        (rng.standard_normal((2, 20000)) * 0.1)
                        .astype(np.float32))
    ck = str(tmp_path / "ck")
    rc = train_main(["--synthetic", "--steps", "2", "--batch", "1",
                     "--segment-samples", "8192", "--log-every", "1",
                     "--ckpt", ck, "--save-every", "100",
                     "--eval-every", "2",
                     "--eval-data", str(tmp_path / "valid")])
    assert rc == 0
    err = capsys.readouterr().err
    assert "eval set: 1 held-out track(s)" in err
    assert "eval @ step 2" in err
    assert Path(ck + ".eval.jsonl").exists()


@pytest.mark.slow
def test_train_cli_finetune_lineage(tmp_path, capsys):
    """The htdemucs_ft provenance workflow end-to-end: start from a
    converted ggml checkpoint (--init-from), train with EMA, checkpoint
    (EMA included), resume, and export the EMA weights as a ggml file
    that loads straight back into the inference stack (reference
    anchor: scripts/convert-pth-to-ggml.py:22-28 — the published ft
    checkpoints are fine-tunes of htdemucs)."""
    from demucs_tpu import params as P
    from demucs_tpu.config import HTDEMUCS_4S
    from demucs_tpu.params.ggml import load_model_params, write_ggml
    from demucs_tpu.tools.train_cli import main as train_main

    flat = P.init_flat(P.htdemucs_schema(HTDEMUCS_4S), seed=7)
    base = tmp_path / "htdemucs_base.bin"
    write_ggml(base, "htdemucs_4s", flat)

    ck, out = str(tmp_path / "ck"), str(tmp_path / "ft.bin")
    common = ["--synthetic", "--batch", "1", "--segment-samples", "8192",
              "--log-every", "1", "--init-from", str(base),
              "--ema", "0.9", "--ckpt", ck]
    rc = train_main(common + ["--steps", "2", "--save-every", "100"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "initialized from" in err and "htdemucs_4s" in err

    rc = train_main(common + ["--steps", "3", "--resume",
                              "--export-ggml", out])
    assert rc == 0
    err = capsys.readouterr().err
    assert "resumed at step 2" in err
    assert "exported EMA weights" in err

    # the exported artifact is a loadable htdemucs_4s model whose
    # weights moved from the base (it was trained), but not far (EMA)
    cfg, tuned = load_model_params(out)
    assert cfg is HTDEMUCS_4S or cfg.num_sources == 4
    flat_tuned = P.flatten_tree(tuned)
    base_arr = np.asarray(flat["encoder.0.conv.weight"], np.float32)
    tuned_arr = np.asarray(flat_tuned["encoder.0.conv.weight"], np.float32)
    assert base_arr.shape == tuned_arr.shape
    # fp16 container quantization alone cannot explain a real update;
    # just require the trees to be close but not identical
    assert not np.array_equal(base_arr, tuned_arr)
    np.testing.assert_allclose(base_arr, tuned_arr, atol=0.05)


@pytest.mark.slow
def test_v3_train_step_decreases_loss():
    """The v3 family (BiLSTM + LocalAttention) trains through the same
    step — the scan and attention ops are plain differentiable JAX."""
    import optax
    from demucs_tpu.config import HDEMUCS_V3
    from demucs_tpu.train import make_train_step

    # the v3 schema pins the real layer widths (the C++ struct table),
    # so the test uses the full config with a short segment
    cfg = HDEMUCS_V3
    params = P.unflatten_tree(P.init_flat(P.hdemucs_v3_schema(cfg), seed=0))
    rng = np.random.default_rng(1)
    seg = 8192
    mix = jnp.asarray((rng.standard_normal((1, 2, seg)) * 0.1)
                      .astype(np.float32))
    refs = jnp.asarray((rng.standard_normal((1, cfg.num_sources, 2, seg))
                        * 0.05).astype(np.float32))
    init_fn, step_fn = make_train_step(cfg, optax.adam(1e-3))
    s = init_fn(params)
    losses = []
    p = params
    for _ in range(3):
        p, s, loss = step_fn(p, s, mix, refs)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_bf16_compute_grads_through_tpu_dsp_backends():
    """bf16-compute training must differentiate through the TPU DSP
    backends (matmul-DFT forward + conv-OLA inverse, dsp._use_matmul).
    JAX 0.9's conv transpose rule rejects the f32 cotangent against the
    bf16 kernel (preferred_element_type upcast), so the inverse-DFT
    convs carry a custom VJP (dsp._conv_pe32) that runs the transposed
    conv in f32. Asserts the bf16-compute grads exist, are f32, and
    track the f32-compute grads."""
    from demucs_tpu import dsp
    from demucs_tpu.train import l1_loss

    cfg, params, mix, refs = _tiny()
    params = jax.tree.map(jnp.asarray, params)
    old = dsp.USE_MATMUL_DFT
    dsp.USE_MATMUL_DFT = True   # force the TPU path on the CPU mesh
    try:
        g32 = jax.grad(l1_loss)(params, mix, refs, cfg)
        g16 = jax.grad(lambda p: l1_loss(p, mix, refs, cfg, remat=True,
                                         compute_dtype=jnp.bfloat16))(params)
    finally:
        dsp.USE_MATMUL_DFT = old
    rels = []
    for a, b in zip(jax.tree.leaves(g32), jax.tree.leaves(g16)):
        assert b.dtype == a.dtype  # master-weight grads stay f32
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert np.isfinite(b).all()
        n = np.linalg.norm(a)
        if n > 1e-6:
            rels.append(np.linalg.norm(a - b) / n)
    assert np.median(rels) < 0.15, np.median(rels)


def test_multi_step_matches_sequential_steps():
    """make_multi_train_step(K) must reproduce K sequential single
    steps (same op sequence; the scan body compiles once, so fusion
    choices differ from the per-step graphs at float level — SGD keeps
    the comparison linear in that noise; Adam's m/sqrt(v) is chaotic
    for near-zero grads and would amplify it to lr scale)."""
    import optax

    from demucs_tpu.train import make_multi_train_step, make_train_step

    cfg, params, mix, refs = _tiny()
    params = jax.tree.map(jnp.asarray, params)
    K = 3
    rng = np.random.default_rng(9)
    mixes = jnp.asarray(rng.standard_normal((K,) + mix.shape) * 0.1,
                        jnp.float32)
    refss = jnp.asarray(rng.standard_normal((K,) + refs.shape) * 0.05,
                        jnp.float32)

    init1, step1 = make_train_step(cfg, optax.sgd(1e-2))
    s = init1(params)
    p = params
    seq_losses = []
    for i in range(K):
        p, s, l = step1(p, s, mixes[i], refss[i])
        seq_losses.append(float(l))

    initk, stepk = make_multi_train_step(cfg, optax.sgd(1e-2))
    params2 = jax.tree.map(lambda x: jnp.array(x, copy=True),
                           jax.tree.map(jnp.asarray, _tiny()[1]))
    sk = initk(params2)
    pk, sk, losses = stepk(params2, sk, mixes, refss)
    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=2e-6)
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(pk)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)


def test_augmented_multi_step_runs_and_learns():
    """The augmented K-step scan (data.make_augmented_multi_train_step)
    produces finite decreasing losses on a learnable toy problem."""
    import optax

    from demucs_tpu.data import make_augmented_multi_train_step

    cfg, params, _, refs = _tiny()
    params = jax.tree.map(jnp.asarray, params)
    K = 2
    rng = np.random.default_rng(10)
    stems = jnp.asarray(rng.standard_normal(
        (K,) + refs.shape) * 0.05, jnp.float32)  # (K, B, S, C, T)
    init_fn, stepk = make_augmented_multi_train_step(cfg, optax.adam(1e-3))
    s = init_fn(params)
    key = jax.random.PRNGKey(0)
    # SAME key both calls: fixed augmented data, so Adam must descend
    p, s, l1 = stepk(params, s, key, stems)
    p, s, l2 = stepk(p, s, key, stems)
    assert np.isfinite(np.asarray(l1)).all()
    assert np.isfinite(np.asarray(l2)).all()
    assert float(l2.mean()) < float(l1.mean())


def test_train_cli_steps_per_call(capsys):
    """--steps-per-call K scans K optimizer steps per device dispatch
    (the host-marshaling amortization; docs/PROFILE_r4.md §8)."""
    from demucs_tpu.tools.train_cli import main as train_main

    rc = train_main(["--synthetic", "--steps", "4", "--batch", "1",
                     "--segment-samples", "8192", "--test-tiny",
                     "--steps-per-call", "2", "--log-every", "2"])
    assert rc == 0
    out = capsys.readouterr()
    assert "step 4/4" in out.err
    assert "done: final loss" in out.out


@pytest.mark.slow
def test_train_cli_v3_family(capsys):
    """--family hdemucs_v3 drives the v3 loss dispatch (BiLSTM +
    LocalAttention training) through the CLI entry point."""
    from demucs_tpu.tools.train_cli import main as train_main

    rc = train_main(["--synthetic", "--steps", "2", "--batch", "1",
                     "--segment-samples", "8192",
                     "--family", "hdemucs_v3", "--log-every", "1"])
    assert rc == 0
    out = capsys.readouterr()
    assert "step 2/2" in out.err
    assert "done: final loss" in out.out
