"""Serving session tests (the WASM-port analog, reference
src_wasm/demucs.cpp:70-171): in-memory model init + per-segment demix."""

import numpy as np

from demucs_tpu import params as P
from demucs_tpu.config import HTDEMUCS_4S
from demucs_tpu.params.ggml import write_ggml
from demucs_tpu.pipeline import ApplyOptions
from demucs_tpu.serving import DemixSession


def _model_bytes(tmp_path):
    flat = P.init_flat(P.htdemucs_schema(HTDEMUCS_4S), seed=0)
    path = tmp_path / "m.bin"
    write_ggml(path, "htdemucs_4s", flat)
    return path.read_bytes()


def test_session_from_bytes_demix_segment(tmp_path):
    sess = DemixSession(_model_bytes(tmp_path))
    assert sess.sources == ("drums", "bass", "other", "vocals")
    rng = np.random.default_rng(0)
    left = (rng.standard_normal(16384) * 0.2).astype(np.float32)
    right = (rng.standard_normal(16384) * 0.2).astype(np.float32)
    stems = sess.demix_segment(left, right)
    assert set(stems) == set(sess.sources)
    for L, R in stems.values():
        assert L.shape == R.shape == (16384,)
        assert np.isfinite(L).all() and np.isfinite(R).all()


def test_session_demix_track(tmp_path):
    sess = DemixSession(_model_bytes(tmp_path))
    rng = np.random.default_rng(1)
    track = (rng.standard_normal((2, 24000)) * 0.2).astype(np.float32)
    out = sess.demix_track(track, ApplyOptions(segment_samples=16384,
                                               batch_size=2,
                                               shift_offset=0))
    assert out.shape == (4, 2, 24000)
    assert np.isfinite(out).all()


def test_export_program_roundtrip(tmp_path):
    """AOT StableHLO export must reproduce the live graph's output."""
    sess = DemixSession(_model_bytes(tmp_path))
    blob = sess.export_program(batch_size=1, segment_samples=16384)
    assert isinstance(blob, bytes) and len(blob) > 1000
    fn = DemixSession.load_exported(blob)
    rng = np.random.default_rng(2)
    mix = (rng.standard_normal((1, 2, 16384)) * 0.2).astype(np.float32)
    out = np.asarray(fn(sess.params, mix))
    import jax
    ref = np.asarray(jax.jit(sess._segment_fn)(sess.params, mix))
    np.testing.assert_allclose(out, ref, atol=1e-5)
