"""Throughput sweep across batch sizes and dtypes.

Counterpart of reference scripts/run_benchmarks.sh + bench_plots.py
(BLAS-backend x thread-count sweeps): here the axes that matter are
segment batch size and compute dtype. Prints one JSON line per config.

NOTE: every (batch, dtype) pair is a fresh XLA compile — on a tunneled
TPU that is minutes per config. Use --batches sparingly.

Usage:
    python -m demucs_tpu.tools.bench_sweep [--batches 4 8 16] \
        [--dtypes bf16 f32] [--iters 10] [--v3]
    python -m demucs_tpu.tools.bench_sweep --family > BENCH_FAMILY.json
        # one JSON object covering every model family (4s/6s/v3
        # inference, the sequential ft bag, and a training step) so
        # non-headline regressions are diffable round over round
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def family_bench(batch: int = 1, iters: int = 8,
                 train_batch: int = 2, seg: int | None = None) -> dict:
    """Measure every model family at its adopted dispatch config (bf16,
    batch 1 — the r5 fence-amortized sweep's winner, PROFILE_r5 §3a)
    plus a training step — one dict, machine-readable.

    Timing protocol (CLAUDE.md): dispatch N steps back-to-back, ONE
    host fetch at the end (block_until_ready returns early on the
    tunneled TPU; only a host roundtrip fences). N is scaled by
    1/batch so the timed window stays long against the ~37 ms fence
    (at batch 1 an 8-iter window would be fence-dominated)."""
    import jax
    import jax.numpy as jnp

    from .. import params as P
    from ..config import HDEMUCS_V3, HTDEMUCS_4S, HTDEMUCS_6S
    from ..config import SEGMENT_SAMPLES
    from ..models import hdemucs_v3_segment, htdemucs_segment

    seg = seg or SEGMENT_SAMPLES
    rng = np.random.default_rng(0)
    mix_host = (rng.standard_normal((batch, 2, seg)) * 0.1)
    # fence amortization: keep the timed window >~1.2 s at any batch
    # (full-segment runs only; CPU smoke tests pass a short seg)
    if seg == SEGMENT_SAMPLES:
        iters = max(iters, 128 // max(batch, 1))
    report = {"batch": batch, "iters": iters, "segment_samples": seg,
              "device": str(jax.devices()[0].device_kind
                            or jax.devices()[0].platform)}

    def measure(fn, params, mix, n_calls=None, audio_s=None):
        out = fn(params, mix)
        float(jnp.sum(out.astype(jnp.float32)))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(n_calls or iters):
            out = fn(params, mix)
        float(jnp.sum(out.astype(jnp.float32)))  # ONE fence
        dt = (time.perf_counter() - t0) / (n_calls or iters)
        rate = (audio_s if audio_s is not None
                else batch * seg / 44100.0) / dt
        return {"step_s": round(dt, 4), "audio_s_per_s": round(rate, 1)}

    fams = (("htdemucs_4s", HTDEMUCS_4S, P.htdemucs_schema, htdemucs_segment),
            ("htdemucs_6s", HTDEMUCS_6S, P.htdemucs_schema, htdemucs_segment),
            ("hdemucs_v3", HDEMUCS_V3, P.hdemucs_v3_schema,
             hdemucs_v3_segment))
    params4 = None
    for name, cfg, schema_fn, seg_fn in fams:
        tree = P.unflatten_tree(P.init_flat(schema_fn(cfg), seed=0))
        tree = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), tree)
        if name == "htdemucs_4s":
            params4 = tree
        mix = jnp.asarray(mix_host, jnp.bfloat16)
        fn = jax.jit(lambda p, m, _c=cfg, _f=seg_fn: _f(p, m, _c))
        report[name] = measure(fn, tree, mix)
        print(f"{name}: {report[name]}", file=sys.stderr)

    # sequential-4 ft bag: the single-device deployed form — 4 calls of
    # ONE compiled program, params swapped per call (ideal = rate/4)
    fn4 = jax.jit(lambda p, m: htdemucs_segment(p, m, HTDEMUCS_4S))
    mix = jnp.asarray(mix_host, jnp.bfloat16)
    out = fn4(params4, mix)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        for _m in range(4):
            out = fn4(params4, mix)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    report["ft_bag_sequential4"] = {
        "step_s": round(dt, 4),
        "audio_s_per_s": round(batch * seg / 44100.0 / dt, 1)}
    print(f"ft_bag_sequential4: {report['ft_bag_sequential4']}",
          file=sys.stderr)

    # unrolled one-program bag: the ADOPTED single-device/shard_map
    # form (r4, docs/bag_forms_micro.py — beats sequential-4 by ~3%)
    from ..models.bag import bag_segment, stack_bag_params

    stacked = stack_bag_params([params4] * 4)
    fnb = jax.jit(lambda p, m: bag_segment(p, m, HTDEMUCS_4S))
    report["ft_bag_unrolled"] = measure(fnb, stacked, mix)
    del stacked
    print(f"ft_bag_unrolled: {report['ft_bag_unrolled']}", file=sys.stderr)

    # training step: full htdemucs_4s at the adopted r4 config
    # (no remat, bf16 compute / f32 master weights, flash backward —
    # docs/PROFILE_r4.md)
    import optax

    from ..train import make_train_step

    tree = P.unflatten_tree(P.init_flat(P.htdemucs_schema(HTDEMUCS_4S),
                                        seed=0))
    tree = jax.tree.map(jnp.asarray, tree)
    init_fn, step_fn = make_train_step(HTDEMUCS_4S, optax.adam(3e-4),
                                       remat=False,
                                       compute_dtype=jnp.bfloat16)
    opt_state = init_fn(tree)
    # NOT a slice of mix_host: with batch < train_batch that silently
    # ran the train fwd/bwd at the smaller batch (refs broadcast the
    # loss) and inflated the reported rate by train_batch/batch
    mixt = jnp.asarray(rng.standard_normal((train_batch, 2, seg)) * 0.1,
                       jnp.float32)
    refs = jnp.asarray((rng.standard_normal((train_batch, 4, 2, seg))
                        * 0.05), jnp.float32)
    p, s, loss = step_fn(tree, opt_state, mixt, refs)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        p, s, loss = step_fn(p, s, mixt, refs)
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    report["train_step"] = {
        "batch": train_batch, "remat": False, "compute_dtype": "bf16",
        "step_s": round(dt, 4),
        "audio_s_per_s": round(train_batch * seg / 44100.0 / dt, 1)}
    print(f"train_step: {report['train_step']}", file=sys.stderr)
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="throughput sweep")
    ap.add_argument("--batches", type=int, nargs="+", default=[8])
    ap.add_argument("--dtypes", nargs="+", default=["bf16"],
                    choices=["bf16", "f32"])
    ap.add_argument("--quant", nargs="+", default=["none"],
                    choices=["none", "int8", "fp8"],
                    help="weight storage format (weight-only quant; "
                         "compute stays at --dtypes)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--v3", action="store_true")
    ap.add_argument("--family", action="store_true",
                    help="benchmark EVERY model family + a train step; "
                         "print one JSON object")
    ap.add_argument("--segment-samples", type=int, default=None,
                    help=argparse.SUPPRESS)  # testing
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    if args.family:
        report = family_bench(batch=args.batches[0], iters=args.iters,
                              seg=args.segment_samples)
        print(json.dumps(report))
        return 0

    from .. import params as P
    from ..config import HDEMUCS_V3, HTDEMUCS_4S, SEGMENT_SAMPLES

    if args.v3:
        from ..models import hdemucs_v3_segment as seg_fn
        cfg, schema = HDEMUCS_V3, P.hdemucs_v3_schema(HDEMUCS_V3)
    else:
        from ..models import htdemucs_segment as seg_fn
        cfg, schema = HTDEMUCS_4S, P.htdemucs_schema(HTDEMUCS_4S)

    base = P.unflatten_tree(P.init_flat(schema))
    rng = np.random.default_rng(0)
    for dtype_name in args.dtypes:
      for quant_name in args.quant:
        dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
        if quant_name == "none":
            params = jax.tree.map(lambda x: jnp.asarray(x, dtype), base)
            model = seg_fn
        else:
            from ..params import quant as Q
            qt = (Q.quantize_int8 if quant_name == "int8"
                  else Q.quantize_fp8)(base)
            # dense leaves (norms/biases) still travel at compute dtype
            params = jax.tree.map(
                lambda x: jnp.asarray(x) if x.dtype == np.int8
                or "float8" in str(x.dtype) else jnp.asarray(x, dtype),
                qt)
            qfn = Q.quantized_model_fn(lambda p, m: seg_fn(p, m, cfg), dtype)
            model = lambda p, m, _cfg=None, _q=qfn: _q(p, m)  # noqa: E731
        for batch in args.batches:
            mix = jnp.asarray(
                rng.standard_normal((batch, 2, SEGMENT_SAMPLES)) * 0.1, dtype)
            fn = jax.jit(lambda p, m: model(p, m, cfg)
                         .astype(jnp.float32).sum())
            t0 = time.perf_counter()
            float(fn(params, mix))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = None
            for _ in range(args.iters):
                out = fn(params, mix)
            float(out)
            dt = (time.perf_counter() - t0) / args.iters
            print(json.dumps({
                "model": "hdemucs_mmi" if args.v3 else "htdemucs_4s",
                "batch": batch, "dtype": dtype_name, "quant": quant_name,
                "step_s": round(dt, 4),
                "audio_s_per_s": round(batch * SEGMENT_SAMPLES / 44100 / dt, 1),
                "compile_s": round(compile_s, 1),
            }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
