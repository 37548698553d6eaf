"""Per-HLO on-chip profile of the benchmark step.

The reference's only profiling is /usr/bin/time sweeps
(reference scripts/run_benchmarks.sh); here we capture a real
jax.profiler trace of the htdemucs-4s segment graph on the TPU and
aggregate device time per HLO op (and per fusion category), so the
optimization targets are measured, not guessed.

Usage:
    python -m demucs_tpu.tools.profile_hlo [--v3] [--int8] [--out report.json]

Prints a JSON report: total device time per step, top ops by self time,
and a stage-level grouping keyed by HLO op-name metadata (the JAX
source line each fusion traces back to).
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import time

import numpy as np


def _aggregate_xspace(trace_dir: str) -> dict:
    """Parse the xplane.pb under trace_dir; sum device-core op durations."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")

    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    per_op = collections.Counter()          # op display name -> ps
    total_ps = 0
    lines_seen = []
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        ev_names = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            lines_seen.append((plane.name, line.name, len(line.events)))
            # The "XLA Ops" line carries per-op device timing.
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                per_op[ev_names.get(ev.metadata_id, "?")] += ev.duration_ps
                total_ps += ev.duration_ps
    if not per_op:
        raise RuntimeError(f"no 'XLA Ops' line found; lines: {lines_seen}")
    return {"per_op_ps": dict(per_op), "total_ps": total_ps}


def group_report(per_op_ps: dict, steps: int, top: int = 40) -> dict:
    """Group fusion names into readable buckets and convert to ms/step."""
    def bucket(name: str) -> str:
        return name.split(".")[0]

    per_bucket = collections.Counter()
    for name, ps in per_op_ps.items():
        per_bucket[bucket(name)] += ps

    total_ms = sum(per_op_ps.values()) / 1e9 / steps
    ops = sorted(per_op_ps.items(), key=lambda kv: -kv[1])[:top]
    return {
        "device_ms_per_step": round(total_ms, 3),
        "buckets_ms": {k: round(v / 1e9 / steps, 3)
                       for k, v in per_bucket.most_common(25)},
        "top_ops_ms": [{"op": k, "ms": round(v / 1e9 / steps, 4)}
                       for k, v in ops],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--v3", action="store_true")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--fp8", action="store_true")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--train", action="store_true",
                    help="profile one TRAINING step (fwd+bwd+Adam) "
                         "instead of inference")
    ap.add_argument("--train-remat", default="dots",
                    choices=["off", "dots", "none", "dots_nb"])
    ap.add_argument("--train-bf16", action="store_true",
                    help="bf16 compute, f32 master weights")
    ap.add_argument("--out", default="/tmp/hlo_profile.json")
    ap.add_argument("--trace-dir", default="/tmp/demucs_tpu_trace")
    args = ap.parse_args()

    from demucs_tpu.utils import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from demucs_tpu import params as P
    from demucs_tpu.config import HTDEMUCS_4S, HDEMUCS_V3, SEGMENT_SAMPLES

    if args.v3:
        from demucs_tpu.models import hdemucs_v3_segment as seg_fn
        cfg = HDEMUCS_V3
        schema = P.hdemucs_v3_schema(cfg)
    else:
        from demucs_tpu.models import htdemucs_segment as seg_fn
        cfg = HTDEMUCS_4S
        schema = P.htdemucs_schema(cfg)

    params = P.unflatten_tree(P.init_flat(schema))
    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    if args.int8 or args.fp8:
        from demucs_tpu.params import quant
        params = (quant.quantize_int8 if args.int8
                  else quant.quantize_fp8)(params)
        params = jax.tree.map(jnp.asarray, params)
        base = seg_fn
        model = quant.quantized_model_fn(
            lambda p, m: base(p, m, cfg), dtype)
        seg_call = lambda p, m, _cfg: model(p, m)  # noqa: E731
    else:
        seg_call = seg_fn

    batch = args.batch if on_tpu else 1
    seg = SEGMENT_SAMPLES if on_tpu else 65536
    rng = np.random.default_rng(0)

    if args.train:
        # training step: master weights f32, optional bf16 compute —
        # the exact step train_cli runs (minus augmentations)
        import optax

        from demucs_tpu.train import make_train_step

        init_fn, step_fn = make_train_step(
            cfg, optax.adam(3e-4),
            remat=args.train_remat != "off",
            remat_policy=(args.train_remat if args.train_remat != "off"
                          else "dots"),
            compute_dtype=jnp.bfloat16 if args.train_bf16 else None)
        params = P.unflatten_tree(P.init_flat(schema))
        params = jax.tree.map(jnp.asarray, params)
        opt_state = init_fn(params)
        mix = jnp.asarray(rng.standard_normal((batch, 2, seg)) * 0.1,
                          jnp.float32)
        refs = jnp.asarray(rng.standard_normal(
            (batch, cfg.num_sources, 2, seg)) * 0.05, jnp.float32)

        t0 = time.perf_counter()
        params, opt_state, loss = step_fn(params, opt_state, mix, refs)
        float(loss)
        print(f"# compile+warmup: {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            params, opt_state, loss = step_fn(params, opt_state, mix, refs)
        float(loss)
        wall_ms = (time.perf_counter() - t0) / args.steps * 1e3
        print(f"# wall: {wall_ms:.1f} ms/step", flush=True)

        os.makedirs(args.trace_dir, exist_ok=True)
        jax.profiler.start_trace(args.trace_dir)
        for _ in range(args.steps):
            params, opt_state, loss = step_fn(params, opt_state, mix, refs)
        float(loss)
        jax.profiler.stop_trace()
    else:
        mix = jnp.asarray(rng.standard_normal((batch, 2, seg)) * 0.1, dtype)

        fn = jax.jit(lambda p, m: seg_call(p, m, cfg).astype(jnp.float32).sum())
        t0 = time.perf_counter()
        float(fn(params, mix))
        print(f"# compile+warmup: {time.perf_counter() - t0:.1f}s", flush=True)

        # timed reference (same protocol as bench.py)
        t0 = time.perf_counter()
        out = None
        for _ in range(args.steps):
            out = fn(params, mix)
        float(out)
        wall_ms = (time.perf_counter() - t0) / args.steps * 1e3
        print(f"# wall: {wall_ms:.1f} ms/step", flush=True)

        os.makedirs(args.trace_dir, exist_ok=True)
        jax.profiler.start_trace(args.trace_dir)
        out = None
        for _ in range(args.steps):
            out = fn(params, mix)
        float(out)
        jax.profiler.stop_trace()

    agg = _aggregate_xspace(args.trace_dir)
    rep = group_report(agg["per_op_ps"], args.steps)
    rep["wall_ms_per_step"] = round(wall_ms, 2)
    rep["config"] = {"v3": args.v3, "int8": args.int8, "fp8": args.fp8,
                     "batch": batch, "segment": seg, "train": args.train,
                     "train_remat": args.train_remat if args.train else None,
                     "train_bf16": args.train_bf16 if args.train else None}
    with open(args.out, "w") as f:
        json.dump(rep, f, indent=1)
    print(json.dumps({k: rep[k] for k in
                      ("wall_ms_per_step", "device_ms_per_step")}))
    print("# full report:", args.out)


if __name__ == "__main__":
    main()
