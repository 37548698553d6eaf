"""Minimal HTTP separation server on top of serving.DemixSession.

The network-facing analog of the reference's WASM worker boundary
(src_wasm/demucs.cpp exposes modelInit/modelDemixSegment to a JS
worker): weights stay resident, programs stay compiled, each request is
one track. Stdlib-only (http.server + zipfile).

Concurrency model (reference anchor
cli-apps/threaded_inference.hpp:29-193 — the reference's parallelism is
a thread per track; the TPU translation is batching, not locking): a
single service.DeviceFeeder thread owns the chip. Concurrent /separate
and /stream requests submit segments that are assembled into shared
``batch_size`` device calls, so N concurrent uploads cost ~one batched
run, and a slow /stream client never blocks other requests (its
handler thread holds no device resource between chunks). Fused
whole-track programs run as exclusive FIFO items on the same queue.

Endpoints:
    GET  /health    -> {"status": "ok", "sources": [...]}
    POST /separate  -> body: WAV bytes (44.1 kHz) ->
                       application/zip of target_{i}_{stem}.wav
    POST /stream    -> body: raw little-endian float32 interleaved
                       stereo frames (Content-Length or chunked) ->
                       chunked raw float32 response, each chunk =
                       finalized frames x sources x 2 (stems emitted
                       incrementally as audio arrives —
                       streaming.StreamingSeparator; the low-latency
                       surface, reference src_wasm/demucs.cpp:86-171).
                       Clients MUST read the response concurrently
                       with uploading: stems stream back while audio
                       is still arriving, and a client that uploads
                       everything before reading can deadlock itself
                       once both socket buffers fill (the server side
                       guards itself with a socket timeout).

Usage:
    python -m demucs_tpu.tools.serve MODEL.bin [--port 8642] \
        [--segment-samples N] [--batch N]
"""

from __future__ import annotations

import argparse
import dataclasses
import io
import json
import sys
import tempfile
import zipfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np


MAX_BODY_BYTES = 256 * 1024 * 1024  # ~50 min of stereo f32 wav


def make_handler(session, options, feeder, max_body=MAX_BODY_BYTES):
    from .. import audio

    class Handler(BaseHTTPRequestHandler):
        # socket-op timeout: a stalled client (not reading its chunked
        # response, or not sending its body) kills only its own handler
        # thread — the device feeder is never blocked on a socket
        timeout = 600

        def log_message(self, fmt, *a):  # route to stderr, not stdout
            print("serve:", fmt % a, file=sys.stderr)

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._json(200, {"status": "ok",
                                 "sources": list(session.sources),
                                 "feeder": dict(feeder.stats)})
            else:
                self._json(404, {"error": "unknown path"})

        def _iter_body(self, max_total):
            """Yield request-body byte blocks; supports Content-Length
            (served in ~1 s slices) and Transfer-Encoding: chunked
            (BaseHTTPRequestHandler does not decode it for us)."""
            te = (self.headers.get("Transfer-Encoding") or "").lower()
            total = 0
            if "chunked" in te:
                while True:
                    line = self.rfile.readline(1024).strip()
                    size = int(line.split(b";")[0] or b"0", 16)
                    if size == 0:
                        self.rfile.readline()  # blank after last-chunk
                        return
                    total += size
                    if total > max_total:
                        raise ValueError(f"stream exceeds {max_total} bytes")
                    data = self.rfile.read(size)
                    self.rfile.read(2)  # chunk CRLF
                    yield data
            else:
                n = int(self.headers.get("Content-Length", 0))
                if n > max_total:
                    raise ValueError(f"stream exceeds {max_total} bytes")
                step = 4 * 2 * 44100  # ~1 s of interleaved stereo f32
                got = 0
                while got < n:
                    data = self.rfile.read(min(step, n - got))
                    if not data:
                        return
                    got += len(data)
                    yield data

        def _do_stream(self):
            """Chunked streaming separation: finalized stems leave as
            audio arrives. Device calls go through the shared feeder
            (this session's segments batch WITH other requests'), so a
            stream holds no device resource between chunks."""
            from ..streaming import StreamingSeparator

            S = len(session.sources)
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Transfer-Encoding", "chunked")
            self.send_header("X-Sources", ",".join(session.sources))
            self.send_header("X-Layout",
                             "frames x sources x 2, float32 LE")
            self.end_headers()

            def emit(out):
                if out.size == 0 or out.shape[-1] == 0:
                    return
                # (S, 2, n) -> (n, S, 2) frame-major so clients can
                # consume sample frames as they land
                b = np.ascontiguousarray(
                    out.transpose(2, 0, 1).astype("<f4")).tobytes()
                self.wfile.write(b"%X\r\n" % len(b) + b + b"\r\n")

            # stateless-on-device: run_batch routes every segment
            # through the feeder's shared batches (same compiled
            # program — and thus the same numerics — as /separate's
            # batched path)
            stream = StreamingSeparator(
                None, None, S,
                segment_samples=options.segment_samples,
                run_batch=lambda b: feeder.submit_segments(b).result())
            leftover = b""
            for data in self._iter_body(max_body):
                buf = leftover + data
                nf = len(buf) // 8
                leftover = buf[nf * 8:]
                if nf:
                    frames = np.frombuffer(buf[:nf * 8],
                                           "<f4").reshape(nf, 2)
                    emit(stream.push(np.ascontiguousarray(frames.T)))
            emit(stream.flush())
            self.wfile.write(b"0\r\n\r\n")

        def do_POST(self):
            if self.path == "/stream":
                try:
                    self._do_stream()
                except (ValueError, OSError) as e:
                    # headers may already be out; just log and drop
                    print(f"serve: /stream aborted: {e}", file=sys.stderr)
                    self.close_connection = True
                return
            if self.path != "/separate":
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
            except ValueError:
                self._json(400, {"error": "bad Content-Length header"})
                return
            if n > max_body:
                # refuse before reading: ThreadingHTTPServer would hold
                # every oversized body in RAM
                self._json(413, {"error": f"body {n} bytes exceeds "
                                          f"limit {max_body}"})
                return
            try:
                raw = self.rfile.read(n)
                with tempfile.NamedTemporaryFile(suffix=".wav") as f:
                    f.write(raw)
                    f.flush()
                    track = audio.load_track(f.name)
                if options.fused_track:
                    # transfer-optimal whole-track program: one
                    # exclusive FIFO device item (not a lifetime lock —
                    # concurrent streams interleave between tracks)
                    stems = feeder.run_exclusive(
                        lambda: session.demix_track(track, options)
                    ).result()
                else:
                    # batched path: this track's segments share device
                    # batches with every other in-flight request
                    stems = feeder.separate(track)
            except (ValueError, OSError) as e:
                self._json(400, {"error": str(e)})
                return

            buf = io.BytesIO()
            with zipfile.ZipFile(buf, "w") as z:
                for i, name in enumerate(session.sources):
                    with tempfile.NamedTemporaryFile(suffix=".wav") as f:
                        # int16 device transfer -> PCM16 response (same
                        # precision class, 2x smaller payload)
                        audio.write_wav(f.name, np.asarray(stems[i]),
                                        pcm16=options.transfer_int16)
                        z.writestr(f"target_{i}_{name}.wav",
                                   Path(f.name).read_bytes())
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "application/zip")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def make_server(model_path=None, port=0, segment_samples=None, batch=8,
                transfer_int16=True, fused=True,
                precompile_secs=(), fused_cache_limit=8, ft_dir=None):
    """transfer_int16 (default ON for serving): stems cross the
    device->host link as int16 and the response WAVs are PCM16 —
    halves both transfers; quantization is ~69 dB under a typical stem
    (pipeline.PCM16_TRANSFER_SCALE). Pass False for bit-exact f32.

    The fused path runs with geometric compile buckets (exact output
    for ANY length, log-many compiled programs over all upload
    lengths) and an LRU cap on the program cache; `precompile_secs`
    warms the buckets for the given track lengths at startup so the
    first request never pays a tunnel compile (minutes)."""
    from ..pipeline import ApplyOptions
    from ..service import DeviceFeeder
    from ..serving import BagDemixSession, DemixSession

    from ..utils import enable_compile_cache

    enable_compile_cache()
    if (model_path is None) == (ft_dir is None):
        raise ValueError("provide exactly one of model_path or ft_dir")
    # ft_dir: serve the fine-tuned 4-model ensemble (per-stem select)
    # through the exact same endpoints — reference premium config,
    # cli-apps/demucs_ft.cpp:136-241
    session = (BagDemixSession(ft_dir) if ft_dir
               else DemixSession(model_path))
    options = ApplyOptions(batch_size=batch,
                           transfer_int16=transfer_int16,
                           fused_track=fused,
                           fused_buckets="geo" if fused else "exact",
                           ).with_segment(segment_samples)
    sep = session._separator(options)
    sep.fused_cache_limit = fused_cache_limit
    if transfer_int16:
        print("serve: responses are PCM16 WAVs (int16 device "
              "transfers; pass --f32-transfer for bit-exact f32)",
              file=sys.stderr)
    if fused and precompile_secs:
        from ..config import SAMPLE_RATE

        for s in precompile_secs:
            print(f"serve: precompiling fused bucket for {s:g} s tracks "
                  "...", file=sys.stderr)
            sep.warmup([int(float(s) * SAMPLE_RATE)])
        print(f"serve: {len(sep._fused_cache)} fused program(s) ready",
              file=sys.stderr)
    # the feeder drives the BATCHED segment program (shared by /stream
    # and non-fused /separate); fused tracks run as exclusive items
    batch_sep = session._separator(
        dataclasses.replace(options, fused_track=False,
                            fused_buckets="exact"))
    if not fused:
        # every /separate request rides the batch program — compile it
        # at startup, not inside the first request (minutes on a
        # tunneled device). Fused servers skip this: their /separate
        # path never uses it and /stream sessions may never arrive.
        print("serve: precompiling the batched segment program ...",
              file=sys.stderr)
        zero = np.zeros((batch_sep.options.batch_size, 2,
                         options.segment_samples), np.float32)
        batch_sep._call_device(batch_sep._place(zero))
    feeder = DeviceFeeder(batch_sep)
    srv = ThreadingHTTPServer(("127.0.0.1", port),
                              make_handler(session, options, feeder))
    srv.session, srv.separator = session, sep  # introspection/tests
    srv.feeder = feeder
    return srv


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="HTTP separation server")
    ap.add_argument("model", nargs="?",
                    help="ggml weight file (or use --ft-dir)")
    ap.add_argument("--ft-dir", default=None,
                    help="directory with the 4 htdemucs_ft_* files: "
                         "serve the fine-tuned ensemble (per-stem "
                         "selection) through the same endpoints")
    ap.add_argument("--port", type=int, default=8642)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--segment-samples", type=int, default=None)
    ap.add_argument("--f32-transfer", action="store_true",
                    help="bit-exact f32 stem transfers + f32 WAV "
                         "responses (2x the bytes of the int16 default)")
    ap.add_argument("--no-fused", action="store_true",
                    help="use the batched path for /separate — with "
                         "concurrent clients their segments share "
                         "device batches (continuous batching) instead "
                         "of per-track fused programs")
    ap.add_argument("--precompile", default="",
                    help="comma-separated track lengths in SECONDS to "
                         "precompile fused buckets for at startup "
                         "(e.g. 30,120,240) — avoids multi-minute "
                         "first-request compiles")
    args = ap.parse_args(argv)
    if bool(args.model) == bool(args.ft_dir):
        ap.error("provide exactly one of `model` or --ft-dir")

    srv = make_server(args.model, args.port, args.segment_samples, args.batch,
                      transfer_int16=not args.f32_transfer,
                      fused=not args.no_fused,
                      precompile_secs=[float(s) for s in
                                       args.precompile.split(",") if s],
                      ft_dir=args.ft_dir)
    print(f"listening on http://127.0.0.1:{srv.server_address[1]}",
          file=sys.stderr)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
