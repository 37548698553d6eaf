"""Command-line driver covering all six reference binaries in one tool.

Reference mapping (cli-apps/, SURVEY.md §2.2):
  demucs.cpp.main / demucs_v3.cpp.main  -> `demucs-tpu model.bin in.wav out/`
     (v3 selected automatically by the file's ggml magic, like the
      reference's src/model_load.cpp:79-102)
  demucs_ft.cpp.main                    -> `demucs-tpu --ft-dir models/ in.wav out/`
  *_mt variants                         -> `--batch N` (+ multi-device dp
     sharding replaces std::thread track-splitting,
     cli-apps/threaded_inference.hpp)

Output files are target_{i}_{name}.wav, matching the reference's naming
(cli-apps/demucs.cpp:168-231).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

from . import audio
from .config import HDemucsV3Config
from .models import bag_segment, hdemucs_v3_segment, htdemucs_segment
from .models.bag import stack_bag_params
from .params.ggml import load_model_params
from .pipeline import ApplyOptions, Separator
from .utils.progress import print_progress

FT_STEMS = ("drums", "bass", "other", "vocals")


def _segment_fn(cfg):
    if isinstance(cfg, HDemucsV3Config):
        return lambda p, m: hdemucs_v3_segment(p, m, cfg)
    return lambda p, m: htdemucs_segment(p, m, cfg)


def _find_ft_models(model_dir: Path) -> list[Path]:
    """Locate the 4 fine-tuned files by substring, one per stem
    (reference cli-apps/demucs_ft.cpp:136-172)."""
    files = []
    for stem in FT_STEMS:
        matches = sorted(p for p in model_dir.iterdir()
                         if f"htdemucs_ft_{stem}" in p.name)
        if not matches:
            raise FileNotFoundError(
                f"no htdemucs_ft_{stem} model in {model_dir}")
        files.append(matches[0])
    return files


def _build_separator(args) -> tuple[Separator, tuple[str, ...]]:
    opts = ApplyOptions(batch_size=args.batch,
                        shift_offset=args.offset,
                        transfer_int16=args.transfer_int16,
                        fused_track=args.fused,
                        fused_buckets=args.fused_buckets,
                        pipeline_depth=args.pipeline_depth,
                        ).with_segment(args.segment_samples)

    def maybe_quant(fn, tree):
        """Apply --bf16 / --int8 / --fp8 to one (fn, tree) pair. bf16 +
        quant composes: dequantization targets bf16 so the network and
        the fast inverse-DFT path actually run in bf16."""
        import jax as _jax
        import jax.numpy as _jnp

        dtype = _jnp.bfloat16 if args.bf16 else _jnp.float32
        if args.int8 or args.fp8:
            from .params.quant import (fp8_compute_supported, quantize_fp8,
                                       quantize_int8, quantized_model_fn)
            if args.fp8 and not fp8_compute_supported():
                d = _jax.devices()[0]
                print(f"warning: --fp8 on {d.device_kind or d.platform} has "
                      "no native fp8 matmul — XLA emulates via bf16 converts "
                      "(measured 7x e2e slowdown on TPU v5e); use --int8 or "
                      "--bf16 instead", file=sys.stderr)
            quant = quantize_int8 if args.int8 else quantize_fp8
            return quantized_model_fn(fn, dtype=dtype), quant(tree)
        if args.bf16:
            tree = _jax.tree.map(lambda x: _jnp.asarray(x, dtype), tree)
        return fn, tree
    import jax
    devices = jax.devices()
    multi = len(devices) > 1 and not args.no_mesh
    if args.fused and multi:
        # fused_track is the single-device transfer-bound serving path
        # (one host-link transfer per track); the mesh separator keeps
        # the batched dp path instead
        print("note: --fused is a single-device path; forcing "
              "--no-mesh", file=sys.stderr)
        multi = False

    if args.ft_dir:
        paths = _find_ft_models(Path(args.ft_dir))
        cfgs_trees = [load_model_params(p) for p in paths]
        cfg = cfgs_trees[0][0]
        # quantize per model (before stacking, so scales stay per-channel)
        single_fn = _segment_fn(cfg)
        trees = []
        for _, t in cfgs_trees:
            fn_i, t_i = maybe_quant(_segment_fn(cfg), t)
            single_fn, trees = fn_i, trees + [t_i]
        stacked = stack_bag_params(trees)

        from .models.bag import bag_select, unrolled_model_map

        def bag_fn(p, m):
            return bag_select(
                unrolled_model_map(lambda pi: single_fn(pi, m), p))

        if multi:
            from .parallel import ShardedSeparator, make_mesh
            bag = 4 if len(devices) % (4 * args.tp) == 0 else 1
            mesh = make_mesh(tp=args.tp, bag=bag)
            if bag > 1:
                sep = ShardedSeparator(single_fn, stacked, cfg.num_sources,
                                       mesh, opts, bag_stacked=True)
            else:
                sep = ShardedSeparator(bag_fn, stacked, cfg.num_sources,
                                       mesh, opts)
        else:
            # single device: the unrolled one-program bag (measured
            # 193.3 audio-s/s vs 187.7 for 4 sequential dispatches and
            # 161.2 for vmap — docs/bag_forms_micro.py); composes with
            # --fused into one whole-track program for the whole
            # ensemble (one upload, one selected-stem download)
            sep = Separator(bag_fn, stacked, cfg.num_sources, opts)
        return sep, cfg.sources

    cfg, params = load_model_params(args.model)
    fn, params = maybe_quant(_segment_fn(cfg), params)
    if multi:
        from .parallel import ShardedSeparator, make_mesh
        mesh = make_mesh(tp=args.tp)
        sep = ShardedSeparator(fn, params, cfg.num_sources, mesh, opts)
    else:
        sep = Separator(fn, params, cfg.num_sources, opts)
    return sep, cfg.sources


def _run_stream(args) -> int:
    """Chunked stateful separation (streaming.StreamingSeparator) —
    the user-facing low-latency surface (reference analog: the WASM
    worker feeding segments incrementally, src_wasm/demucs.cpp:86-171).
    Output matches the offline pipeline run without the shift trick,
    with causal normalization statistics."""
    import jax.numpy as jnp

    from . import config as C
    from .streaming import StreamingSeparator

    try:
        in_path = Path(args.input)
        if in_path.is_dir():
            raise ValueError("--stream takes a single WAV, not a dir")
        track = audio.load_track(in_path)
        t0 = time.monotonic()
        if args.ft_dir:
            # streaming ensemble: the unrolled one-program bag is just
            # another (params, mix) -> stems model fn for the stream
            from .models.bag import bag_select, unrolled_model_map

            paths = _find_ft_models(Path(args.ft_dir))
            cfg = None
            trees = []
            for p in paths:
                c, t = load_model_params(p)
                cfg = cfg or c
                trees.append(t)
            params = stack_bag_params(trees)
            single = _segment_fn(cfg)

            def fn(p, m):
                return bag_select(
                    unrolled_model_map(lambda pi: single(pi, m), p))
        else:
            cfg, params = load_model_params(args.model)
            fn = _segment_fn(cfg)
        dtype = jnp.bfloat16 if args.bf16 else None  # None = TPU default
        stream = StreamingSeparator(
            fn, params, cfg.num_sources,
            segment_samples=args.segment_samples or C.SEGMENT_SAMPLES,
            dtype=dtype, max_batch=args.batch)
        print(f"model loaded in {time.monotonic() - t0:.2f} s",
              file=sys.stderr)
    except (ValueError, FileNotFoundError, OSError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1

    N = track.shape[-1]
    chunk = max(1, int(args.stream_chunk_secs * C.SAMPLE_RATE))
    t0 = time.monotonic()
    outs, emitted = [], 0
    for pos in range(0, N, chunk):
        out = stream.push(track[:, pos:pos + chunk])
        if out.shape[-1]:
            outs.append(out)
            emitted += out.shape[-1]
            print(f"\rstreamed {emitted}/{N} samples "
                  f"({emitted / 44100.0:.1f} s)", end="", file=sys.stderr)
    outs.append(stream.flush())
    print("", file=sys.stderr)
    dt = time.monotonic() - t0
    stems = np.concatenate([o for o in outs if o.shape[-1]], -1)
    print(f"streamed {N / 44100.0:.1f} s of audio in {dt:.1f} s "
          f"({N / 44100.0 / dt:.2f}x realtime)", file=sys.stderr)

    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    for i, name in enumerate(cfg.sources):
        path = outdir / f"target_{i}_{name}.wav"
        audio.write_wav(path, np.asarray(stems[i]), pcm16=args.pcm16)
        print(f"wrote {path}", file=sys.stderr)
    return 0


def _maybe_hint_slow_link(threshold_mb_s: float = 100.0) -> None:
    """One-time host<->device link probe; on a slow link (tunneled or
    remote device) point at the transfer-bound serving config, which is
    measured 2.6x faster there (tools/bench_serving.py, CLAUDE.md).
    Costs two ~8 MB roundtrips (~0.2 s on a 100 MB/s link) — ONCE per
    device kind per day: the measured rate is cached on disk so repeat
    CLI invocations (the exact slow-link environment the hint targets,
    where the probe itself costs ~1 s) skip it."""
    import json
    import tempfile

    import jax
    import jax.numpy as jnp

    try:
        kind = jax.devices()[0].device_kind
        cache = Path(tempfile.gettempdir()) / "demucs_tpu_linkprobe.json"
        rate = None
        try:
            entry = json.loads(cache.read_text()).get(kind)
            if entry and time.time() - entry["t"] < 86400.0:
                rate = entry["mb_s"]
        except (OSError, ValueError, KeyError, TypeError):
            pass
        if rate is None:
            mb = 8.0
            buf = np.zeros(int(mb * 1e6 // 4), np.float32)
            up = jnp.asarray(buf)          # warm-up / connection setup
            _ = np.asarray(up)
            t0 = time.monotonic()
            up = jnp.asarray(buf)
            _ = np.asarray(up)             # host fetch = completion fence
            dt = time.monotonic() - t0
            rate = 2 * mb / dt
            try:
                data = {}
                try:
                    data = json.loads(cache.read_text())
                except (OSError, ValueError):
                    pass
                data[kind] = {"mb_s": rate, "t": time.time()}
                cache.write_text(json.dumps(data))
            except OSError:
                pass
        if rate < threshold_mb_s:
            print(f"note: host<->device link measured ~{rate:.0f} MB/s; "
                  "on link-bound hosts --fused --transfer-int16 is the "
                  "measured-fast path (one transfer per track)",
                  file=sys.stderr)
    except Exception:
        pass  # a failed probe must never block separation


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="demucs-tpu",
        description="TPU-native Demucs music source separation")
    ap.add_argument("model", nargs="?",
                    help="ggml weight file (dmc4/dmc6/dmc3 magic) or an "
                         "Orbax checkpoint directory")
    ap.add_argument("input", help="input WAV (44.1 kHz)")
    ap.add_argument("outdir", help="output directory for stem WAVs")
    ap.add_argument("--ft-dir", help="directory with 4 htdemucs_ft_* files "
                                     "(BagOfModels; replaces `model`)")
    ap.add_argument("--batch", type=int, default=8,
                    help="segments per device call")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel degree (multi-device)")
    ap.add_argument("--offset", type=int, default=None,
                    help="pin the shift-trick offset (1337 = reference "
                         "SDR setup, .github/SDR_scores.md:21)")
    ap.add_argument("--pcm16", action="store_true",
                    help="write 16-bit PCM instead of float32 WAV")
    ap.add_argument("--int8", action="store_true",
                    help="weight-only int8 quantization (per-channel scales)")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 weights/compute (DSP stays f32)")
    ap.add_argument("--fp8", action="store_true",
                    help="weight-only float8 e4m3 quantization")
    ap.add_argument("--no-mesh", action="store_true",
                    help="force single-device even if more are visible")
    # serving-path knobs (the measured-best config on link-bound hosts:
    # --fused --transfer-int16; see tools/bench_serving.py, CLAUDE.md)
    ap.add_argument("--fused", action="store_true",
                    help="fused whole-track device program: split + "
                         "segment graph + overlap-add on device, ONE "
                         "upload/download per track (2.6x on slow "
                         "host links; single-device)")
    ap.add_argument("--fused-buckets", choices=("exact", "geo"),
                    default="exact",
                    help="compile-bucket granularity for --fused "
                         "(geo: log-many compiles over all lengths)")
    ap.add_argument("--transfer-int16", action="store_true",
                    help="int16 device->host stem transfers (halves "
                         "the dominant transfer; ~69 dB below a "
                         "typical stem)")
    ap.add_argument("--pipeline-depth", type=int, default=2,
                    help="device calls in flight (compute overlaps "
                         "host transfers; measured knee = 2)")
    ap.add_argument("--stream", action="store_true",
                    help="chunked stateful streaming separation "
                         "(stems finalized as audio arrives; no shift "
                         "trick, causal normalization stats)")
    ap.add_argument("--stream-chunk-secs", type=float, default=1.0,
                    help="push granularity for --stream")
    ap.add_argument("--segment-samples", type=int, default=None,
                    help=argparse.SUPPRESS)  # testing: shrink the 7.8 s segment
    args = ap.parse_args(argv)

    from .utils import enable_compile_cache
    enable_compile_cache()

    if bool(args.model) == bool(args.ft_dir):
        ap.error("provide exactly one of `model` or --ft-dir")
    if args.stream:
        if args.fused or args.transfer_int16:
            ap.error("--stream has its own device path; drop "
                     "--fused/--transfer-int16")
        return _run_stream(args)

    try:
        in_path = Path(args.input)
        if in_path.is_dir():  # batch mode: every wav, one global batch
            files = sorted(p for p in in_path.iterdir()
                           if p.suffix.lower() == ".wav")
            if not files:
                raise FileNotFoundError(f"no .wav files in {in_path}")
            tracks = [audio.load_track(p) for p in files]
        else:
            files = [in_path]
            tracks = [audio.load_track(in_path)]
        total_s = sum(t.shape[1] for t in tracks) / 44100.0
        print(f"input: {len(files)} track(s), {total_s:.1f} s total",
              file=sys.stderr)

        t0 = time.monotonic()
        sep, sources = _build_separator(args)
        print(f"model loaded in {time.monotonic() - t0:.2f} s", file=sys.stderr)
    except (ValueError, FileNotFoundError, OSError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1

    if not (args.fused or args.transfer_int16):
        _maybe_hint_slow_link()

    t0 = time.monotonic()
    if len(tracks) == 1:
        outs = [sep(tracks[0], progress=print_progress)]
    else:
        # continuous batching: all tracks' segments share one device batch
        outs = sep.separate_many(tracks, progress=print_progress)
    dt = time.monotonic() - t0
    print(f"separated {total_s:.1f} s of audio in {dt:.1f} s "
          f"({total_s / dt:.2f}x realtime)", file=sys.stderr)

    outdir = Path(args.outdir)
    for f, out in zip(files, outs):
        d = outdir if len(files) == 1 else outdir / f.stem
        d.mkdir(parents=True, exist_ok=True)
        for i, name in enumerate(sources):
            path = d / f"target_{i}_{name}.wav"
            audio.write_wav(path, np.asarray(out[i]), pcm16=args.pcm16)
            print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
