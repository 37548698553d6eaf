"""HTTP serving tests: health + full separate round-trip over a socket."""

import io
import json
import threading
import urllib.request
import zipfile

import numpy as np
import pytest

from demucs_tpu import audio
from demucs_tpu import params as P
from demucs_tpu.config import HTDEMUCS_4S
from demucs_tpu.params.ggml import write_ggml
from demucs_tpu.tools.serve import make_server


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("srv")
    flat = P.init_flat(P.htdemucs_schema(HTDEMUCS_4S), seed=0)
    model = tmp / "m.bin"
    write_ggml(model, "htdemucs_4s", flat)
    srv = make_server(str(model), port=0, segment_samples=16384, batch=2)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_health(server):
    with urllib.request.urlopen(f"{server}/health", timeout=30) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["sources"] == ["drums", "bass", "other", "vocals"]


def test_separate_roundtrip(server, tmp_path):
    rng = np.random.default_rng(0)
    wav = tmp_path / "in.wav"
    audio.write_wav(wav, (rng.standard_normal((2, 20000)) * 0.2)
                    .astype(np.float32))
    req = urllib.request.Request(f"{server}/separate",
                                 data=wav.read_bytes(), method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.headers["Content-Type"] == "application/zip"
        blob = r.read()
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        names = sorted(z.namelist())
        assert names == [f"target_{i}_{n}.wav" for i, n in enumerate(
            ("drums", "bass", "other", "vocals"))]
        with z.open(names[0]) as f:
            data = f.read()
    (tmp_path / "stem.wav").write_bytes(data)
    stem, rate = audio.read_wav(tmp_path / "stem.wav")
    assert rate == 44100 and stem.shape == (2, 20000)
    assert np.isfinite(stem).all()


def test_separate_rejects_garbage(server):
    req = urllib.request.Request(f"{server}/separate",
                                 data=b"not a wav at all", method="POST")
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "error" in json.loads(e.read())
