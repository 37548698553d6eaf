"""Tooling tests: pth->ggml conversion round-trip and SDR math."""

import numpy as np
import pytest
import torch

from demucs_tpu import audio
from demucs_tpu.params.ggml import load_ggml
from demucs_tpu.tools.convert_pth_to_ggml import main as convert_main
from demucs_tpu.tools.evaluate_sdr import main as sdr_main, median_sdr


def test_convert_pth_roundtrip(tmp_path):
    sd = {"encoder.0.conv.weight": torch.randn(8, 4, 3, 1),
          "encoder.0.conv.bias": torch.randn(8)}
    ckpt = tmp_path / "c.pth"
    torch.save({"state": sd}, ckpt)
    out = tmp_path / "m.bin"
    rc = convert_main([str(ckpt), str(out), "--kind", "htdemucs_4s"])
    assert rc == 0
    kind, tensors = load_ggml(out)
    assert kind == "htdemucs_4s"
    # writer squeezes (reference convert-pth-to-ggml.py squeezes too)
    assert tensors["encoder.0.conv.weight"].shape == (8, 4, 3)
    np.testing.assert_allclose(
        tensors["encoder.0.conv.weight"],
        sd["encoder.0.conv.weight"].numpy().squeeze().astype(np.float16))


def test_median_sdr_known_values():
    rng = np.random.default_rng(0)
    ref = rng.standard_normal((2, 44100 * 3)).astype(np.float32)
    assert median_sdr(ref, ref) > 100  # identical -> ~inf dB
    noisy = ref + 0.1 * rng.standard_normal(ref.shape).astype(np.float32)
    s = median_sdr(ref, noisy)
    assert 19 < s < 21  # SNR of 10x amplitude ratio = 20 dB


def test_sdr_cli(tmp_path, capsys):
    rng = np.random.default_rng(1)
    ref_dir = tmp_path / "ref"
    est_dir = tmp_path / "est"
    ref_dir.mkdir(), est_dir.mkdir()
    for stem in ("drums", "bass", "other", "vocals"):
        x = rng.standard_normal((2, 44100 * 2)).astype(np.float32) * 0.3
        audio.write_wav(ref_dir / f"{stem}.wav", x)
        audio.write_wav(est_dir / f"target_0_{stem}.wav",
                        x + 0.03 * rng.standard_normal(x.shape)
                        .astype(np.float32))
    import json

    rc = sdr_main([str(ref_dir), str(est_dir), "--sdr-only"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert set(out) == {"drums", "bass", "other", "vocals"}
    for v in out.values():
        assert 18 < v < 22

    # full BSS-eval v4 set (SDR/ISR/SIR/SAR like museval; reference
    # scripts/evaluate-demixed-output.py:20-44). --filter-len 64 keeps
    # the test fast; the projection math is identical to the 512 default
    rc = sdr_main([str(ref_dir), str(est_dir), "--filter-len", "64"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    for stem, m in out.items():
        assert set(m) == {"SDR", "ISR", "SIR", "SAR"}
        assert 18 < m["SDR"] < 22
        # independent white-noise corruption: interference projection is
        # tiny (SIR very high), artifacts dominate (SAR ~ SDR)
        assert m["SIR"] > m["SDR"]
        assert 17 < m["SAR"] < 23
        assert m["ISR"] > m["SDR"]  # spatial error is a subset of total


def test_bss_eval_distortion_filters_realign_delays():
    """museval-v4 (bss_eval images) filter semantics: an estimate that
    is the reference delayed by d taps is fully explained by the L-tap
    filtered projection when L > d, so it is classified as SPATIAL
    distortion — e_artif = e_interf = 0 (SAR/SIR ~inf) while ISR is low
    (~-3 dB for white noise: ||e - s||^2 = 2||s||^2). The instantaneous
    (L=1) decomposition instead calls the delayed signal artifact
    (SAR low). SDR (filter-free, telescoped decomposition) must be
    identical under both."""
    from demucs_tpu.tools.evaluate_sdr import bss_eval_framewise

    rng = np.random.default_rng(2)
    T, d = 44100, 7
    a = rng.standard_normal((2, T))
    b = rng.standard_normal((2, T))
    refs = np.stack([a, b])                     # (J=2, C=2, T)
    delayed = np.concatenate([np.zeros((2, d)), a[:, :-d]], axis=1)
    ests = np.stack([delayed, b])

    filt = bss_eval_framewise(refs, ests, filters_len=32)
    inst = bss_eval_framewise(refs, ests, filters_len=1)
    # the 32-tap filter absorbs the 7-sample delay: artifact and
    # interference energy drop to the window-edge truncation floor
    # (the estimate's last d samples fall outside the window, an
    # irreducible d/T = 1.6e-4 energy residual = ~38 dB)
    assert filt["SAR"][0, 0] > 30
    assert filt["SIR"][0, 0] > 30
    assert -4 < filt["ISR"][0, 0] < -2      # white noise: e-s has 2x energy
    # instantaneous projection cannot realign: artifact-dominated
    assert inst["SAR"][0, 0] < 10
    # SDR is the plain energy ratio regardless of filter length
    np.testing.assert_allclose(filt["SDR"], inst["SDR"], rtol=1e-9)
    # untouched source stays perfect under both
    assert filt["SDR"][1, 0] > 100 and filt["ISR"][1, 0] > 60


def test_torch_inference_matches_jax_cli(tmp_path):
    """Full-pipeline parity: the torch oracle tool and the JAX CLI must
    produce near-identical stems from the same ggml file (the reference
    validates C++ against scripts/demucs_pytorch_inference.py the same
    way)."""
    from demucs_tpu import params as P
    from demucs_tpu.cli import main as cli_main
    from demucs_tpu.config import HTDEMUCS_4S
    from demucs_tpu.params.ggml import write_ggml
    from demucs_tpu.tools.torch_inference import main as torch_main

    flat = P.init_flat(P.htdemucs_schema(HTDEMUCS_4S), seed=0)
    model = tmp_path / "m.bin"
    write_ggml(model, "htdemucs_4s", flat)
    rng = np.random.default_rng(5)
    wav = tmp_path / "in.wav"
    audio.write_wav(wav, (rng.standard_normal((2, 20000)) * 0.2)
                    .astype(np.float32))

    args = [str(model), str(wav), None, "--offset", "0",
            "--segment-samples", "16384"]
    args_t = list(args)
    args_t[2] = str(tmp_path / "out_torch")
    assert torch_main(args_t) == 0
    args_j = list(args)
    args_j[2] = str(tmp_path / "out_jax")
    assert cli_main(args_j + ["--no-mesh", "--batch", "2"]) == 0

    for i, name in enumerate(HTDEMUCS_4S.sources):
        a, _ = audio.read_wav(tmp_path / "out_torch" / f"target_{i}_{name}.wav")
        b, _ = audio.read_wav(tmp_path / "out_jax" / f"target_{i}_{name}.wav")
        err = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-9)
        assert err < 1e-3, (name, err)


@pytest.mark.slow
def test_sdr_acceptance_gate(tmp_path, capsys):
    """The acceptance harness runs both implementations and reports
    cross-implementation SDR; with random weights they must still agree
    to >= 40 dB (numerical interchangeability)."""
    import pytest  # noqa: F811
    from demucs_tpu import params as P
    from demucs_tpu.config import HTDEMUCS_4S
    from demucs_tpu.params.ggml import write_ggml
    from demucs_tpu.tools.sdr_acceptance import main as accept_main

    flat = P.init_flat(P.htdemucs_schema(HTDEMUCS_4S), seed=0)
    model = tmp_path / "m.bin"
    write_ggml(model, "htdemucs_4s", flat)
    rng = np.random.default_rng(9)
    wav = tmp_path / "in.wav"
    audio.write_wav(wav, (rng.standard_normal((2, 66150)) * 0.2)
                    .astype(np.float32))
    rc = accept_main([str(model), str(wav), "--workdir", str(tmp_path / "w"),
                      "--segment-samples", "16384"])
    assert rc == 0
    import json
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rep = json.loads(out)
    assert rep["pass"]
    for stem in ("drums", "bass", "other", "vocals"):
        assert rep[stem]["cross_impl_sdr_db"] > 40, rep


@pytest.mark.slow
def test_sdr_acceptance_gate_ft_bag(tmp_path, capsys):
    """--ft-dir: the BagOfModels ensemble gate (the reference's best
    SDR row, .github/SDR_scores.md:48-61) — JAX bag vs torch oracle
    bag, per stem. Distinct per-stem weights catch any model/stem
    pairing mixup."""
    from demucs_tpu import params as P
    from demucs_tpu.config import HTDEMUCS_4S
    from demucs_tpu.params.ggml import write_ggml
    from demucs_tpu.tools.sdr_acceptance import main as accept_main

    mdir = tmp_path / "models"
    mdir.mkdir()
    for i, stem in enumerate(("drums", "bass", "other", "vocals")):
        flat = P.init_flat(P.htdemucs_schema(HTDEMUCS_4S), seed=10 + i)
        write_ggml(mdir / f"ggml-model-htdemucs_ft_{stem}-f16.bin",
                   "htdemucs_4s", flat)
    rng = np.random.default_rng(11)
    wav = tmp_path / "in.wav"
    # >= 1 s: median_sdr needs at least one full 1-second eval window
    audio.write_wav(wav, (rng.standard_normal((2, 66150)) * 0.2)
                    .astype(np.float32))
    rc = accept_main(["--ft-dir", str(mdir), str(wav),
                      "--workdir", str(tmp_path / "w"),
                      "--segment-samples", "16384"])
    assert rc == 0
    import json
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["pass"]
    for stem in ("drums", "bass", "other", "vocals"):
        assert rep[stem]["cross_impl_sdr_db"] > 40, rep


def test_memory_report_budgets():
    """Compiled HBM budget: int8 weights must shrink the argument bytes
    vs bf16, and every field must be present and positive-ish."""
    from demucs_tpu.tools.memory_report import compiled_memory

    bf16 = compiled_memory("4s", batch=1, segment=16384)
    i8 = compiled_memory("4s", batch=1, segment=16384, int8=True)
    assert bf16["argument_bytes"] > 0 and bf16["temp_bytes"] > 0
    # int8 storage is ~half of bf16 on the quantized bulk
    assert i8["argument_bytes"] < 0.7 * bf16["argument_bytes"]
    assert i8["output_bytes"] == bf16["output_bytes"]


def test_convert_pth_to_orbax(tmp_path):
    """--orbax writes a checkpoint dir that load_model_params accepts."""
    from demucs_tpu import params as P
    from demucs_tpu.config import HTDEMUCS_4S
    from demucs_tpu.params.ggml import load_model_params

    flat = P.init_flat(P.htdemucs_schema(HTDEMUCS_4S), seed=6)
    ckpt = tmp_path / "full.pth"
    torch.save({"state": {k: torch.from_numpy(np.asarray(v))
                          for k, v in flat.items()}}, ckpt)
    out = tmp_path / "orbax_ckpt"
    rc = convert_main([str(ckpt), str(out), "--kind", "htdemucs_4s",
                       "--orbax"])
    assert rc == 0
    cfg, tree = load_model_params(out)
    assert cfg is HTDEMUCS_4S
    back = P.flatten_tree(tree)
    np.testing.assert_allclose(
        back["encoder.0.conv.weight"],
        flat["encoder.0.conv.weight"].astype(np.float16).astype(np.float32))


@pytest.mark.slow
def test_train_memory_report():
    from demucs_tpu.tools.memory_report import train_compiled_memory

    rep = train_compiled_memory("4s", batch=1, segment=65536, remat=True)
    assert rep["mode"] == "train" and rep["peak_bytes"] > 0
    norm = train_compiled_memory("4s", batch=1, segment=65536, remat=False)
    # remat must not need MORE activation workspace
    assert rep["temp_bytes"] <= norm["temp_bytes"]


@pytest.mark.slow
def test_family_bench_smoke():
    """--family emits one JSON object with every family + the adopted
    bag form + the train step (the machine-readable round-over-round
    artifact, BENCH_FAMILY_r*.json)."""
    import json

    from demucs_tpu.tools import bench_sweep

    report = bench_sweep.family_bench(batch=1, iters=1, train_batch=1,
                                      seg=16384)
    s = json.dumps(report)  # must be JSON-serializable
    for key in ("htdemucs_4s", "htdemucs_6s", "hdemucs_v3",
                "ft_bag_sequential4", "ft_bag_unrolled", "train_step"):
        assert key in report, key
        assert report[key]["step_s"] > 0
    assert report["train_step"]["compute_dtype"] == "bf16"
    assert len(s) < 4096


@pytest.mark.slow
def test_bench_train_smoke(capsys):
    """bench_train emits one JSON line per config, including the
    scanned steps-per-call path (the adopted r4 dispatch form)."""
    import json

    from demucs_tpu.tools import bench_train

    rc = bench_train.main(["--batches", "1", "--remat", "off",
                           "--dtypes", "bf16", "--iters", "1",
                           "--steps-per-call", "2",
                           "--segment-samples", "16384"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["steps_per_call"] == 2 and rec["remat"] == "off"
    assert rec["compute_dtype"] == "bf16" and rec["step_s"] > 0
