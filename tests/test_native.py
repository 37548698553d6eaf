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
