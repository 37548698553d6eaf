"""Native C++ loader tests: parity with the pure-numpy parser, fp16
conversion exactness, and the serving session API."""

import numpy as np
import pytest

from demucs_tpu import params as P
from demucs_tpu.config import HTDEMUCS_4S
from demucs_tpu.params import ggml


@pytest.fixture(scope="module")
def native():
    from demucs_tpu.params import native_ggml
    return native_ggml


def _blob(tmp_path):
    flat = {"a.weight": np.random.default_rng(0).standard_normal((3, 4, 5))
            .astype(np.float16),
            "b.bias": np.arange(7, dtype=np.float16),
            "sub.module.scale": np.float16(2.5).reshape(())}
    path = tmp_path / "m.bin"
    ggml.write_ggml(path, "htdemucs_4s", flat)
    return path, flat


def test_native_matches_numpy_parser(tmp_path, native):
    path, flat = _blob(tmp_path)
    data = path.read_bytes()
    kind_n, t_n = native.load(data)
    kind_p, t_p = ggml._load_ggml_numpy(data)
    assert kind_n == kind_p == "htdemucs_4s"
    assert set(t_n) == set(t_p)
    for k in t_p:
        np.testing.assert_array_equal(t_n[k], t_p[k])


def test_native_rejects_bad_magic(native):
    with pytest.raises(ValueError, match="magic"):
        native.load(b"XXXX" + b"\x00" * 16)


def test_native_fp16_to_fp32_exact(native):
    rng = np.random.default_rng(1)
    x = rng.standard_normal(4096).astype(np.float16)
    # include edge cases: zero, -0, inf, -inf, nan, subnormals, max
    edge = np.array([0.0, -0.0, np.inf, -np.inf, np.nan, 6e-8, -6e-8,
                     65504.0, -65504.0, 5.96e-8], dtype=np.float16)
    x = np.concatenate([x, edge])
    out = native.fp16_to_fp32(x)
    np.testing.assert_array_equal(out, x.astype(np.float32))


def test_full_model_roundtrip_via_native(tmp_path, native):
    flat = P.init_flat(P.htdemucs_schema(HTDEMUCS_4S), seed=0)
    path = tmp_path / "model.bin"
    ggml.write_ggml(path, "htdemucs_4s", flat)
    kind, tensors = native.load(path.read_bytes())
    assert kind == "htdemucs_4s"
    assert len(tensors) == 533  # reference README.md:100


# --- native WAV codec (native/wav_io.cpp vs the pure-numpy decoder) ---------

def _write_pcm(tmp_path, name, dtype, bits, data_f32, rate=44100):
    """Hand-roll a WAV of the given PCM/float format from float data."""
    import struct

    ch, n = data_f32.shape
    inter = np.ascontiguousarray(data_f32.T)
    if bits == 8:
        payload = (np.clip(inter, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
        tag = 1
    elif bits == 16:
        payload = (np.clip(inter, -1, 1) * 32767).astype(np.int16).tobytes()
        tag = 1
    elif bits == 24:
        v = (np.clip(inter, -1, 1) * 8388607).astype(np.int32)
        b = np.empty((v.size, 3), np.uint8)
        flat = v.reshape(-1)
        b[:, 0] = flat & 0xFF
        b[:, 1] = (flat >> 8) & 0xFF
        b[:, 2] = (flat >> 16) & 0xFF
        payload = b.tobytes()
        tag = 1
    elif bits == 32 and dtype == "int":
        payload = (np.clip(inter, -1, 1) * 2147483647).astype(np.int32).tobytes()
        tag = 1
    elif bits == 32:
        payload = inter.astype(np.float32).tobytes()
        tag = 3
    else:
        payload = inter.astype(np.float64).tobytes()
        tag = 3
    block = ch * bits // 8
    hdr = b"".join([
        b"RIFF", struct.pack("<I", 36 + len(payload)), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, tag, ch, rate,
                             rate * block, block, bits),
        b"data", struct.pack("<I", len(payload)),
    ])
    path = tmp_path / name
    path.write_bytes(hdr + payload)
    return path


@pytest.mark.parametrize("dtype,bits", [("int", 8), ("int", 16), ("int", 24),
                                        ("int", 32), ("float", 32),
                                        ("float", 64)])
def test_wav_native_decode_matches_numpy(tmp_path, dtype, bits):
    from demucs_tpu import audio

    if audio._native() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(3)
    data = (rng.standard_normal((2, 1713)) * 0.5).astype(np.float32)
    path = _write_pcm(tmp_path, f"t{bits}{dtype}.wav", dtype, bits, data)
    got_n, rate_n = audio.read_wav(path)
    got_p, rate_p = audio.read_wav(path, native=False)
    assert rate_n == rate_p == 44100
    assert got_n.dtype == got_p.dtype == np.float32
    np.testing.assert_array_equal(got_n, got_p)


def test_wav_native_pcm16_roundtrip(tmp_path):
    from demucs_tpu import audio

    if audio._native() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(4)
    x = (rng.standard_normal((2, 4411)) * 0.4).astype(np.float32)
    x[0, :4] = [1.5, -1.5, 1.0, -1.0]  # clip cases
    path = tmp_path / "out.wav"
    audio.write_wav(path, x, pcm16=True)
    # independent python reference encoding of the same samples
    ref = np.round(np.clip(x.T, -1.0, 1.0) * 32767.0).astype(np.int16)
    import wave as _wave

    with _wave.open(str(path), "rb") as w:
        assert w.getframerate() == 44100 and w.getnchannels() == 2
        raw = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    np.testing.assert_array_equal(raw.reshape(-1, 2), ref)
    # and the decoded audio round-trips through the native reader
    back, _ = audio.read_wav(path)
    # encode scales by 32767, decode divides by 32768: half-ulp rounding
    # plus the 1/32768 scale skew bounds the error at ~2 quanta
    np.testing.assert_allclose(back, np.clip(x, -1, 1), atol=2 / 32767.0)


def test_wav_native_handles_malformed(tmp_path):
    from demucs_tpu import audio

    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"RIFF\x10\x00\x00\x00WAVEjunk")
    with pytest.raises(ValueError):
        audio.read_wav(bad)
