"""CLI + audio IO tests: wav round-trips and the end-to-end driver on a
synthesized ggml weight file (the reference's CLI contract,
cli-apps/demucs.cpp:107-232, incl. target_{i}_{name}.wav naming)."""

import numpy as np
import pytest

from demucs_tpu import audio
from demucs_tpu import params as P
from demucs_tpu.cli import main
from demucs_tpu.config import HTDEMUCS_4S
from demucs_tpu.params.ggml import write_ggml


def test_wav_float32_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, 4411)) * 0.4).astype(np.float32)
    p = tmp_path / "t.wav"
    audio.write_wav(p, x)
    y, rate = audio.read_wav(p)
    assert rate == 44100
    np.testing.assert_array_equal(y, x)


def test_wav_pcm16_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((2, 1000)) * 0.4).astype(np.float32)
    p = tmp_path / "t16.wav"
    audio.write_wav(p, x, pcm16=True)
    y, rate = audio.read_wav(p)
    np.testing.assert_allclose(y, np.clip(x, -1, 1), atol=1.5 / 32768)


def test_wav_pcm24_decode(tmp_path):
    import struct
    vals = np.array([0.0, 0.5, -0.5, 0.999], dtype=np.float32)
    ints = (vals * 8388608.0).astype(np.int64).clip(-8388608, 8388607)
    payload = b"".join(struct.pack("<i", int(v))[:3] for v in ints)
    hdr = b"".join([
        b"RIFF", struct.pack("<I", 36 + len(payload)), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, 1, 1, 44100, 44100 * 3, 3, 24),
        b"data", struct.pack("<I", len(payload)),
    ])
    p = tmp_path / "t24.wav"
    p.write_bytes(hdr + payload)
    y, rate = audio.read_wav(p)
    np.testing.assert_allclose(y[0], vals, atol=2e-7)


def test_load_track_mono_duplicates(tmp_path):
    x = np.linspace(-0.5, 0.5, 2000, dtype=np.float32)[None]
    p = tmp_path / "mono.wav"
    audio.write_wav(p, x)
    t = audio.load_track(p)
    assert t.shape == (2, 2000)
    np.testing.assert_array_equal(t[0], t[1])


def test_load_track_rejects_wrong_rate(tmp_path):
    p = tmp_path / "48k.wav"
    audio.write_wav(p, np.zeros((2, 100), np.float32), rate=48000)
    with pytest.raises(ValueError, match="44100"):
        audio.load_track(p)


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    cfg = HTDEMUCS_4S
    flat = P.init_flat(P.htdemucs_schema(cfg), seed=0)
    model = tmp_path / "model.bin"
    write_ggml(model, "htdemucs_4s", flat)

    rng = np.random.default_rng(3)
    wav = tmp_path / "in.wav"
    audio.write_wav(wav, (rng.standard_normal((2, 30000)) * 0.2)
                    .astype(np.float32))
    outdir = tmp_path / "out"

    rc = main([str(model), str(wav), str(outdir),
               "--no-mesh", "--offset", "1337", "--batch", "4",
               "--segment-samples", "16384"])
    assert rc == 0
    for i, name in enumerate(cfg.sources):
        stem, rate = audio.read_wav(outdir / f"target_{i}_{name}.wav")
        assert rate == 44100
        assert stem.shape == (2, 30000)
        assert np.isfinite(stem).all()


def test_cli_fused_serving_flags(tmp_path):
    """The measured-best serving config (--fused --transfer-int16) is
    reachable from the flagship CLI and produces valid stems."""
    cfg = HTDEMUCS_4S
    flat = P.init_flat(P.htdemucs_schema(cfg), seed=0)
    model = tmp_path / "model.bin"
    write_ggml(model, "htdemucs_4s", flat)
    rng = np.random.default_rng(4)
    wav = tmp_path / "in.wav"
    audio.write_wav(wav, (rng.standard_normal((2, 30000)) * 0.2)
                    .astype(np.float32))
    outdir = tmp_path / "out"
    rc = main([str(model), str(wav), str(outdir),
               "--fused", "--transfer-int16", "--fused-buckets", "geo",
               "--pipeline-depth", "1", "--batch", "2",
               "--segment-samples", "16384"])
    assert rc == 0
    for i, name in enumerate(cfg.sources):
        stem, _ = audio.read_wav(outdir / f"target_{i}_{name}.wav")
        assert stem.shape == (2, 30000) and np.isfinite(stem).all()


def test_cli_stream_mode(tmp_path):
    """--stream: chunked stateful separation from the flagship CLI."""
    cfg = HTDEMUCS_4S
    flat = P.init_flat(P.htdemucs_schema(cfg), seed=0)
    model = tmp_path / "model.bin"
    write_ggml(model, "htdemucs_4s", flat)
    rng = np.random.default_rng(5)
    wav = tmp_path / "in.wav"
    audio.write_wav(wav, (rng.standard_normal((2, 30000)) * 0.2)
                    .astype(np.float32))
    outdir = tmp_path / "out"
    rc = main([str(model), str(wav), str(outdir), "--stream",
               "--stream-chunk-secs", "0.2", "--batch", "4",
               "--segment-samples", "16384"])
    assert rc == 0
    for i, name in enumerate(cfg.sources):
        stem, _ = audio.read_wav(outdir / f"target_{i}_{name}.wav")
        assert stem.shape == (2, 30000) and np.isfinite(stem).all()


def test_cli_stream_ft_bag(tmp_path):
    """--stream --ft-dir: the streaming surface drives the unrolled
    one-program ensemble (per-stem select), matching the offline bag
    run without the shift trick on the same audio."""
    cfg = HTDEMUCS_4S
    ftd = tmp_path / "ft"
    ftd.mkdir()
    for i, stem in enumerate(cfg.sources):
        flat = P.init_flat(P.htdemucs_schema(cfg), seed=i)
        write_ggml(ftd / f"htdemucs_ft_{stem}.bin", "htdemucs_4s", flat)
    rng = np.random.default_rng(6)
    wav = tmp_path / "in.wav"
    audio.write_wav(wav, (rng.standard_normal((2, 24000)) * 0.2)
                    .astype(np.float32))
    outdir = tmp_path / "out"
    rc = main(["--ft-dir", str(ftd), str(wav), str(outdir), "--stream",
               "--stream-chunk-secs", "0.2", "--batch", "2",
               "--segment-samples", "16384"])
    assert rc == 0
    for i, name in enumerate(cfg.sources):
        stem, _ = audio.read_wav(outdir / f"target_{i}_{name}.wav")
        assert stem.shape == (2, 24000) and np.isfinite(stem).all()


def test_cli_arg_validation(tmp_path, capsys):
    wav = tmp_path / "in.wav"
    audio.write_wav(wav, np.zeros((2, 100), np.float32))
    with pytest.raises(SystemExit):
        main([str(wav), str(tmp_path)])  # neither model nor --ft-dir


@pytest.mark.slow
def test_cli_int8_end_to_end(tmp_path):
    cfg = HTDEMUCS_4S
    flat = P.init_flat(P.htdemucs_schema(cfg), seed=0)
    model = tmp_path / "model.bin"
    write_ggml(model, "htdemucs_4s", flat)
    rng = np.random.default_rng(3)
    wav = tmp_path / "in.wav"
    audio.write_wav(wav, (rng.standard_normal((2, 20000)) * 0.2)
                    .astype(np.float32))
    out_fp = tmp_path / "out_fp"
    out_q = tmp_path / "out_q"
    for outdir, extra in ((out_fp, []), (out_q, ["--int8"])):
        rc = main([str(model), str(wav), str(outdir), "--no-mesh",
                   "--offset", "0", "--batch", "2",
                   "--segment-samples", "16384"] + extra)
        assert rc == 0
    for i, name in enumerate(cfg.sources):
        a, _ = audio.read_wav(out_fp / f"target_{i}_{name}.wav")
        b, _ = audio.read_wav(out_q / f"target_{i}_{name}.wav")
        err = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-9)
        assert err < 0.1, (name, err)


@pytest.mark.slow
def test_cli_ft_bag_end_to_end(tmp_path):
    cfg = HTDEMUCS_4S
    flat = P.init_flat(P.htdemucs_schema(cfg), seed=0)
    mdir = tmp_path / "models"
    mdir.mkdir()
    for stem in ("drums", "bass", "other", "vocals"):
        write_ggml(mdir / f"ggml-model-htdemucs_ft_{stem}-f16.bin",
                   "htdemucs_4s", flat)
    rng = np.random.default_rng(4)
    wav = tmp_path / "in.wav"
    audio.write_wav(wav, (rng.standard_normal((2, 20000)) * 0.2)
                    .astype(np.float32))
    outdir = tmp_path / "out"
    rc = main(["--ft-dir", str(mdir), str(wav), str(outdir), "--no-mesh",
               "--offset", "0", "--batch", "2", "--segment-samples", "16384"])
    assert rc == 0
    for i, name in enumerate(cfg.sources):
        stem_audio, _ = audio.read_wav(outdir / f"target_{i}_{name}.wav")
        assert stem_audio.shape == (2, 20000)
        assert np.isfinite(stem_audio).all()


@pytest.mark.slow
def test_cli_directory_batch_mode(tmp_path):
    cfg = HTDEMUCS_4S
    flat = P.init_flat(P.htdemucs_schema(cfg), seed=0)
    model = tmp_path / "model.bin"
    write_ggml(model, "htdemucs_4s", flat)
    rng = np.random.default_rng(6)
    indir = tmp_path / "tracks"
    indir.mkdir()
    lens = {"a": 12000, "b": 20000}
    for name, n in lens.items():
        audio.write_wav(indir / f"{name}.wav",
                        (rng.standard_normal((2, n)) * 0.2).astype(np.float32))
    outdir = tmp_path / "out"
    rc = main([str(model), str(indir), str(outdir), "--no-mesh",
               "--offset", "0", "--batch", "4", "--segment-samples", "16384"])
    assert rc == 0
    for name, n in lens.items():
        for i, src in enumerate(cfg.sources):
            stem, _ = audio.read_wav(outdir / name / f"target_{i}_{src}.wav")
            assert stem.shape == (2, n)


def test_wav_riff_size_field_exact(tmp_path):
    """RIFF content size must be file_size - 8 (strict readers bound
    chunk-walking by it)."""
    import struct
    p = tmp_path / "r.wav"
    audio.write_wav(p, np.zeros((2, 1001), np.float32))
    data = p.read_bytes()
    (riff_size,) = struct.unpack_from("<I", data, 4)
    assert riff_size == len(data) - 8


@pytest.mark.slow
def test_cli_v3_end_to_end(tmp_path):
    """v3 model selected by ggml magic, full CLI pipeline."""
    from demucs_tpu.config import HDEMUCS_V3
    flat = P.init_flat(P.hdemucs_v3_schema(HDEMUCS_V3), seed=0)
    model = tmp_path / "v3.bin"
    write_ggml(model, "hdemucs_mmi", flat)
    rng = np.random.default_rng(8)
    wav = tmp_path / "in.wav"
    audio.write_wav(wav, (rng.standard_normal((2, 20000)) * 0.2)
                    .astype(np.float32))
    outdir = tmp_path / "out"
    rc = main([str(model), str(wav), str(outdir), "--no-mesh",
               "--offset", "0", "--batch", "2", "--segment-samples", "16384"])
    assert rc == 0
    for i, name in enumerate(HDEMUCS_V3.sources):
        stem, _ = audio.read_wav(outdir / f"target_{i}_{name}.wav")
        assert stem.shape == (2, 20000)
        assert np.isfinite(stem).all()


@pytest.mark.slow
def test_cli_ft_bag_fused(tmp_path):
    """--ft-dir --fused --transfer-int16: the unrolled one-program bag
    composed into the fused whole-track device program (one upload +
    one selected-stem download for the whole ensemble)."""
    cfg = HTDEMUCS_4S
    ft_dir = tmp_path / "ft"
    ft_dir.mkdir()
    for i, stem in enumerate(("drums", "bass", "other", "vocals")):
        flat = P.init_flat(P.htdemucs_schema(cfg), seed=i)
        write_ggml(ft_dir / f"htdemucs_ft_{stem}.bin", "htdemucs_4s",
                   flat)
    rng = np.random.default_rng(6)
    wav = tmp_path / "in.wav"
    audio.write_wav(wav, (rng.standard_normal((2, 22000)) * 0.2)
                    .astype(np.float32))
    outdir = tmp_path / "out"
    rc = main([str(wav), str(outdir), "--ft-dir", str(ft_dir),
               "--fused", "--transfer-int16", "--batch", "2",
               "--segment-samples", "16384"])
    assert rc == 0
    for i, name in enumerate(cfg.sources):
        stem, _ = audio.read_wav(outdir / f"target_{i}_{name}.wav")
        assert stem.shape == (2, 22000) and np.isfinite(stem).all()
