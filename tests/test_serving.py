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


_STANDALONE_RUNNER = '''\
"""Standalone artifact runner: deserializes and executes exported
StableHLO with NO demucs_tpu import — proving the blob is a complete,
portable program (the analog of the reference WASM port running
out-of-tree, src_wasm/demucs.cpp:70-171)."""
import pickle
import sys

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")
from jax import export as jexport

blob = open("segment.bin", "rb").read()
params = pickle.load(open("params.pkl", "rb"))
data = np.load("io.npz")

fn = jexport.deserialize(blob).call
out = np.asarray(fn(params, data["mix"]))
np.testing.assert_allclose(out, data["ref"], atol=1e-5)

tblob = open("track.bin", "rb").read()
tfn = jexport.deserialize(tblob).call
tout = np.asarray(tfn(params, data["track"],
                      np.asarray(data["n_true"], np.int32)))
np.testing.assert_allclose(tout, data["track_ref"], atol=1e-5)

assert not any(m.startswith("demucs_tpu") for m in sys.modules), \\
    sorted(m for m in sys.modules if m.startswith("demucs_tpu"))
print("STANDALONE_OK")
'''


def test_export_standalone_subprocess(tmp_path):
    """Both exported artifacts (segment graph AND the fused whole-track
    serving program) must deserialize and run in a clean subprocess
    that never imports demucs_tpu, matching the in-process outputs."""
    import os
    import pickle
    import subprocess
    import sys

    import jax

    sess = DemixSession(_model_bytes(tmp_path))
    rng = np.random.default_rng(3)

    # segment-graph artifact + in-process reference
    blob = sess.export_program(batch_size=1, segment_samples=16384)
    mix = (rng.standard_normal((1, 2, 16384)) * 0.2).astype(np.float32)
    ref = np.asarray(jax.jit(sess._segment_fn)(sess.params, mix))

    # fused whole-track artifact: stems of the padded NORMALIZED track
    N = 20000
    tblob = sess.export_track_program(N, batch_size=2,
                                      segment_samples=16384)
    opts = ApplyOptions(segment_samples=16384, batch_size=2,
                        fused_track=True, max_shift_secs=0.0,
                        shift_offset=0)
    sep = sess._separator(opts)
    stride = int((1 - opts.overlap) * 16384)
    import math
    Lp = math.ceil(N / stride) * stride
    track = (rng.standard_normal((2, N)) * 0.2).astype(np.float32)
    mono = track.mean(0)
    norm = ((track - mono.mean()) / max(mono.std(ddof=1), 1e-8))
    padded = np.pad(norm, ((0, 0), (0, Lp - N))).astype(np.float32)
    tfn = sep._fused_track_fn(math.ceil(N / stride), Lp)
    track_ref = np.asarray(tfn(sess.params, padded, np.int32(N)))

    host_params = jax.tree.map(np.asarray, sess.params)
    (tmp_path / "segment.bin").write_bytes(blob)
    (tmp_path / "track.bin").write_bytes(tblob)
    with open(tmp_path / "params.pkl", "wb") as f:
        pickle.dump(host_params, f)
    np.savez(tmp_path / "io.npz", mix=mix, ref=ref, track=padded,
             n_true=N, track_ref=track_ref)
    (tmp_path / "run.py").write_text(_STANDALONE_RUNNER)

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               JAX_DEFAULT_MATMUL_PRECISION="highest")
    env.pop("PYTHONPATH", None)  # no accidental demucs_tpu on the path
    proc = subprocess.run([sys.executable, "run.py"], cwd=tmp_path,
                          env=env, capture_output=True, text=True,
                          timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "STANDALONE_OK" in proc.stdout
