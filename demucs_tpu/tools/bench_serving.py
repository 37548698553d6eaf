"""End-to-end serving throughput: continuous batching + HTTP path.

Records the two north-star configs VERDICT r1 asked for alongside the
headline segment number:
  * `separate_many` over N tracks (continuous batching through the full
    normalize/shift/split/overlap-add pipeline, host bookkeeping
    included)
  * request-level throughput through the HTTP server (tools/serve.py):
    wav-in -> zip-of-stems-out, serialized on the device lock

Usage: python -m demucs_tpu.tools.bench_serving [--tracks 4]
       [--track-secs 30] [--http] [--model MODEL.bin]
Prints one JSON line per mode.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracks", type=int, default=4)
    ap.add_argument("--track-secs", type=float, default=30.0)
    ap.add_argument("--http", action="store_true",
                    help="also measure the HTTP server path")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--f32-transfer", action="store_true",
                    help="bit-exact f32 stem transfers (default: int16 "
                         "device-side encoding, half the bytes)")
    ap.add_argument("--pipeline-depth", type=int, default=2)
    ap.add_argument("--fused", action="store_true",
                    help="fused whole-track device program (on-device "
                         "split + overlap-add; one up/down per track)")
    ap.add_argument("--concurrent", type=int, default=0,
                    help="N: also measure N SIMULTANEOUS HTTP uploads "
                         "against the batched (non-fused) server — "
                         "concurrent requests share device batches via "
                         "the feeder (service.DeviceFeeder); reports "
                         "serial vs concurrent wall time")
    args = ap.parse_args(argv)

    from ..utils import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from .. import params as P
    from ..config import HTDEMUCS_4S
    from ..models import htdemucs_segment
    from ..pipeline import ApplyOptions, Separator

    cfg = HTDEMUCS_4S
    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    tree = jax.tree.map(
        lambda x: jnp.asarray(x, dtype),
        P.unflatten_tree(P.init_flat(P.htdemucs_schema(cfg), seed=0)))

    n_samples = int(args.track_secs * 44100)
    rng = np.random.default_rng(0)
    tracks = [(rng.standard_normal((2, n_samples)) * 0.1).astype(np.float32)
              for _ in range(args.tracks)]
    total_audio_s = args.tracks * args.track_secs

    opts = ApplyOptions(batch_size=args.batch, shift_offset=1337,
                        transfer_int16=not args.f32_transfer,
                        pipeline_depth=args.pipeline_depth,
                        fused_track=args.fused)
    sep = Separator(lambda p, m: htdemucs_segment(p, m, cfg), tree,
                    num_sources=cfg.num_sources, options=opts)

    # warm-up (compiles the padded batch shapes)
    sep.separate_many(tracks[:1])
    t0 = time.perf_counter()
    outs = sep.separate_many(tracks)
    dt = time.perf_counter() - t0
    assert len(outs) == args.tracks
    print(json.dumps({
        "mode": "separate_many", "tracks": args.tracks,
        "track_secs": args.track_secs, "wall_s": round(dt, 3),
        "audio_s_per_s": round(total_audio_s / dt, 1),
        "int16_transfer": not args.f32_transfer,
        "pipeline_depth": args.pipeline_depth,
        "fused": args.fused,
    }))

    # single-track latency (what one user waits for, post-warmup)
    t0 = time.perf_counter()
    sep(tracks[0])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "mode": "single_track", "track_secs": args.track_secs,
        "wall_s": round(dt, 3),
        "audio_s_per_s": round(args.track_secs / dt, 1),
    }))

    # streaming path: 1 s pushes through StreamingSeparator (ready
    # segments batched per push/flush, bf16 on TPU) — the low-latency
    # surface's sustained rate, to compare against separate_many
    from ..streaming import StreamingSeparator

    stream = StreamingSeparator(lambda p, m: htdemucs_segment(p, m, cfg),
                                tree, cfg.num_sources,
                                max_batch=args.batch)
    chunk = 44100
    # warm-up: compile the pow2 batch buckets the loop will hit
    for pos in range(0, n_samples, chunk):
        stream.push(tracks[0][:, pos:pos + chunk])
    stream.flush()
    t0 = time.perf_counter()
    for tr in tracks:
        for pos in range(0, n_samples, chunk):
            stream.push(tr[:, pos:pos + chunk])
        stream.flush()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "mode": "streaming_1s_pushes", "tracks": args.tracks,
        "track_secs": args.track_secs, "wall_s": round(dt, 3),
        "audio_s_per_s": round(total_audio_s / dt, 1),
        "max_batch": args.batch,
    }))

    if args.http:
        import io
        import threading
        import urllib.request
        import zipfile

        from .. import audio as A
        from ..params.ggml import write_ggml
        from ..params.tree import flatten_tree
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            model_path = f"{td}/model.bin"
            write_ggml(model_path, "htdemucs_4s",
                       {k: np.asarray(v, np.float32)
                        for k, v in flatten_tree(tree).items()})
            from .serve import make_server

            srv = make_server(model_path, port=0, batch=args.batch)
            port = srv.server_address[1]
            th = threading.Thread(target=srv.serve_forever, daemon=True)
            th.start()
            wav_path = f"{td}/in.wav"
            A.write_wav(wav_path, tracks[0])
            body = open(wav_path, "rb").read()

            def request():
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/separate", data=body,
                    headers={"Content-Type": "audio/wav"})
                with urllib.request.urlopen(req, timeout=600) as r:
                    blob = r.read()
                names = zipfile.ZipFile(io.BytesIO(blob)).namelist()
                assert len(names) == cfg.num_sources

            request()  # warm-up/compile
            t0 = time.perf_counter()
            request()
            dt = time.perf_counter() - t0
            srv.shutdown()
            print(json.dumps({
                "mode": "http_request", "track_secs": args.track_secs,
                "wall_s": round(dt, 3),
                "audio_s_per_s": round(args.track_secs / dt, 1),
            }))

    if args.concurrent > 1:
        import threading
        import urllib.request

        from .. import audio as A
        from ..params.ggml import write_ggml
        from ..params.tree import flatten_tree
        import tempfile

        N = args.concurrent
        with tempfile.TemporaryDirectory() as td:
            model_path = f"{td}/model.bin"
            write_ggml(model_path, "htdemucs_4s",
                       {k: np.asarray(v, np.float32)
                        for k, v in flatten_tree(tree).items()})
            from .serve import make_server

            # non-fused: concurrent requests' segments share feeder
            # batches (the continuous-batching path under test)
            srv = make_server(model_path, port=0, batch=args.batch,
                              fused=False)
            port = srv.server_address[1]
            th = threading.Thread(target=srv.serve_forever, daemon=True)
            th.start()
            bodies = []
            for i in range(N):
                wav_path = f"{td}/in{i}.wav"
                A.write_wav(wav_path, tracks[i % len(tracks)])
                bodies.append(open(wav_path, "rb").read())

            def request(i):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/separate", data=bodies[i],
                    headers={"Content-Type": "audio/wav"})
                with urllib.request.urlopen(req, timeout=600) as r:
                    r.read()

            request(0)  # warm-up/compile
            t0 = time.perf_counter()
            for i in range(N):
                request(i)
            dt_serial = time.perf_counter() - t0

            calls0 = srv.feeder.stats["device_calls"]
            threads = [threading.Thread(target=request, args=(i,))
                       for i in range(N)]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            dt_conc = time.perf_counter() - t0
            calls = srv.feeder.stats["device_calls"] - calls0
            srv.shutdown()
            total = N * args.track_secs
            print(json.dumps({
                "mode": "http_concurrent", "concurrent": N,
                "track_secs": args.track_secs,
                "serial_wall_s": round(dt_serial, 3),
                "concurrent_wall_s": round(dt_conc, 3),
                "speedup": round(dt_serial / dt_conc, 2),
                "device_calls_concurrent": calls,
                "audio_s_per_s": round(total / dt_conc, 1),
            }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
