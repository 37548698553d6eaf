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
    # precompile the geo bucket test_separate_roundtrip's 20000-sample
    # upload lands in: the request must reuse the warmed program
    srv = make_server(str(model), port=0, segment_samples=16384, batch=2,
                      precompile_secs=[20000 / 44100.0])
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


@pytest.fixture(scope="module")
def server_url(server):
    return f"http://127.0.0.1:{server.server_address[1]}"


def test_health(server_url):
    with urllib.request.urlopen(f"{server_url}/health", timeout=30) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["sources"] == ["drums", "bass", "other", "vocals"]


def test_separate_roundtrip(server, server_url, tmp_path):
    # --precompile warmed exactly one geo bucket at startup
    warmed = dict(server.separator._fused_cache)
    assert len(warmed) == 1
    rng = np.random.default_rng(0)
    wav = tmp_path / "in.wav"
    audio.write_wav(wav, (rng.standard_normal((2, 20000)) * 0.2)
                    .astype(np.float32))
    req = urllib.request.Request(f"{server_url}/separate",
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
    # the request reused the precompiled bucket — no new program
    assert dict(server.separator._fused_cache).keys() == warmed.keys()


def test_separate_rejects_garbage(server_url):
    req = urllib.request.Request(f"{server_url}/separate",
                                 data=b"not a wav at all", method="POST")
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "error" in json.loads(e.read())


def test_stream_endpoint_matches_direct_streaming(server, server_url):
    """POST /stream with a chunked body -> chunked raw-f32 stems equal
    to StreamingSeparator run directly on the same audio."""
    import http.client

    from demucs_tpu.streaming import StreamingSeparator

    rng = np.random.default_rng(8)
    N = 20000
    track = (rng.standard_normal((2, N)) * 0.2).astype(np.float32)

    # direct reference
    sess = server.session
    stream = StreamingSeparator(
        sess._segment_fn, sess.params, len(sess.sources),
        segment_samples=16384, max_batch=2)
    outs = [stream.push(track)]
    outs.append(stream.flush())
    ref = np.concatenate([o for o in outs if o.shape[-1]], -1)

    # over the socket, chunked request body (~0.1 s chunks)
    host, port = server.server_address
    con = http.client.HTTPConnection(host, port, timeout=300)
    con.putrequest("POST", "/stream")
    con.putheader("Transfer-Encoding", "chunked")
    con.endheaders()
    frames = np.ascontiguousarray(track.T.astype("<f4"))  # (N, 2)
    step = 4410
    for i in range(0, N, step):
        b = frames[i:i + step].tobytes()
        con.send(b"%X\r\n" % len(b) + b + b"\r\n")
    con.send(b"0\r\n\r\n")
    resp = con.getresponse()
    assert resp.status == 200
    assert resp.headers["X-Sources"] == ",".join(sess.sources)
    body = resp.read()  # http.client de-chunks
    con.close()

    S = len(sess.sources)
    got = np.frombuffer(body, "<f4").reshape(-1, S, 2).transpose(1, 2, 0)
    assert got.shape == (S, 2, N)
    # the endpoint now rides the shared feeder batches, which carry the
    # server's int16 device-transfer posture (quant step 2.4e-4 in the
    # normalized domain) — the direct reference here is f32
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_stream_does_not_block_separate(server, server_url, tmp_path):
    """A /stream session that is mid-track (chunks pending, body not
    finished) must NOT serialize /separate behind it — the r4 server
    held one device lock for the stream's whole life."""
    import http.client

    rng = np.random.default_rng(11)
    N = 20000
    track = (rng.standard_normal((2, N)) * 0.2).astype(np.float32)

    host, port = server.server_address
    con = http.client.HTTPConnection(host, port, timeout=300)
    con.putrequest("POST", "/stream")
    con.putheader("Transfer-Encoding", "chunked")
    con.endheaders()
    frames = np.ascontiguousarray(track.T.astype("<f4"))
    # send ENOUGH for one segment (16384) so the stream has already
    # used the device, then leave the request open
    b = frames[:17000].tobytes()
    con.send(b"%X\r\n" % len(b) + b + b"\r\n")

    # concurrent /separate must complete while the stream is open
    wav = tmp_path / "c.wav"
    audio.write_wav(wav, (rng.standard_normal((2, 20000)) * 0.2)
                    .astype(np.float32))
    req = urllib.request.Request(f"{server_url}/separate",
                                 data=wav.read_bytes(), method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.status == 200

    # finish the stream cleanly
    b = frames[17000:].tobytes()
    con.send(b"%X\r\n" % len(b) + b + b"\r\n")
    con.send(b"0\r\n\r\n")
    resp = con.getresponse()
    assert resp.status == 200
    body = resp.read()
    con.close()
    S = len(server.session.sources)
    got = np.frombuffer(body, "<f4").reshape(-1, S, 2)
    assert got.shape[0] == N and np.isfinite(got).all()


@pytest.fixture(scope="module")
def batched_server(tmp_path_factory):
    """Non-fused server: concurrent /separate requests share device
    batches through the feeder (continuous batching)."""
    tmp = tmp_path_factory.mktemp("srv_batched")
    flat = P.init_flat(P.htdemucs_schema(HTDEMUCS_4S), seed=0)
    model = tmp / "m.bin"
    write_ggml(model, "htdemucs_4s", flat)
    srv = make_server(str(model), port=0, segment_samples=16384, batch=4,
                      fused=False)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def test_ft_bag_server_roundtrip(tmp_path):
    """--ft-dir serves the 4-model fine-tuned ensemble through the same
    endpoints (reference premium config, demucs_ft.cpp:136-241):
    /separate returns the per-stem-selected ensemble stems, /stream
    works through the shared feeder with the bag program."""
    import http.client

    ftd = tmp_path / "ft"
    ftd.mkdir()
    for i, stem in enumerate(("drums", "bass", "other", "vocals")):
        flat = P.init_flat(P.htdemucs_schema(HTDEMUCS_4S), seed=i)
        write_ggml(ftd / f"htdemucs_ft_{stem}.bin", "htdemucs_4s", flat)

    srv = make_server(ft_dir=str(ftd), port=0, segment_samples=16384,
                      batch=2, fused=False)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        with urllib.request.urlopen(f"{url}/health", timeout=30) as r:
            body = json.loads(r.read())
        assert body["sources"] == ["drums", "bass", "other", "vocals"]

        rng = np.random.default_rng(13)
        track = (rng.standard_normal((2, 20000)) * 0.2).astype(np.float32)
        wav = tmp_path / "ft_in.wav"
        audio.write_wav(wav, track)
        req = urllib.request.Request(f"{url}/separate",
                                     data=wav.read_bytes(), method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            blob = r.read()
        with zipfile.ZipFile(io.BytesIO(blob)) as z:
            names = sorted(z.namelist())
        assert names == [f"target_{i}_{n}.wav" for i, n in enumerate(
            ("drums", "bass", "other", "vocals"))]

        # /stream drives the bag program through the feeder
        host, port = srv.server_address
        con = http.client.HTTPConnection(host, port, timeout=300)
        con.putrequest("POST", "/stream")
        con.putheader("Transfer-Encoding", "chunked")
        con.endheaders()
        frames = np.ascontiguousarray(track.T.astype("<f4"))
        b = frames.tobytes()
        con.send(b"%X\r\n" % len(b) + b + b"\r\n")
        con.send(b"0\r\n\r\n")
        resp = con.getresponse()
        assert resp.status == 200
        body = resp.read()
        con.close()
        got = np.frombuffer(body, "<f4").reshape(-1, 4, 2)
        assert got.shape[0] == 20000 and np.isfinite(got).all()
    finally:
        srv.shutdown()


def test_concurrent_separates_share_batches(batched_server, tmp_path):
    """N concurrent uploads: correct per-request stems AND the feeder
    assembled cross-request batches (fewer device calls than the
    serial per-request count)."""
    url = f"http://127.0.0.1:{batched_server.server_address[1]}"
    rng = np.random.default_rng(12)
    tracks = [(rng.standard_normal((2, 20000)) * 0.2).astype(np.float32)
              for _ in range(4)]
    payloads = []
    for i, tr in enumerate(tracks):
        wav = tmp_path / f"t{i}.wav"
        audio.write_wav(wav, tr)
        payloads.append(wav.read_bytes())

    calls_before = batched_server.feeder.stats["device_calls"]
    results = [None] * len(tracks)
    errs = []

    def post(i):
        try:
            req = urllib.request.Request(f"{url}/separate",
                                         data=payloads[i], method="POST")
            with urllib.request.urlopen(req, timeout=600) as r:
                results[i] = r.read()
        except Exception as e:  # pragma: no cover - failure path
            errs.append(e)

    threads = [threading.Thread(target=post, args=(i,))
               for i in range(len(tracks))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    # each 20000-sample track at segment 16384 yields 2 segments; with
    # batch=4, 4 concurrent tracks = 8 segments = 2 full batches when
    # shared; the serial path would use 4 calls (one padded batch per
    # request). <=3 proves at least one cross-request batch happened
    # (the first request may run alone while the others are in flight).
    calls = batched_server.feeder.stats["device_calls"] - calls_before
    assert calls <= 3, calls
    assert batched_server.feeder.stats["segments"] >= 8

    # every request got its own correct stems (route-back check):
    # compare against a direct library separation of the same track
    from demucs_tpu.pipeline import ApplyOptions

    sess = batched_server.session
    opts = ApplyOptions(batch_size=4, transfer_int16=True,
                        ).with_segment(16384)
    for tr, blob in zip(tracks, results):
        ref = sess.demix_track(tr, opts)
        with zipfile.ZipFile(io.BytesIO(blob)) as z:
            name = sorted(z.namelist())[0]  # target_0_drums.wav
            with z.open(name) as f:
                data = f.read()
        p = tmp_path / "chk.wav"
        p.write_bytes(data)
        stem, rate = audio.read_wav(p)
        assert rate == 44100 and stem.shape == tr.shape
        # PCM16 response grid + int16 transfer: compare coarsely
        np.testing.assert_allclose(stem, ref[0], atol=2e-3)
