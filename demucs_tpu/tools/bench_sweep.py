"""Throughput sweep across batch sizes and dtypes.

Counterpart of reference scripts/run_benchmarks.sh + bench_plots.py
(BLAS-backend x thread-count sweeps): here the axes that matter are
segment batch size and compute dtype. Prints one JSON line per config.

NOTE: every (batch, dtype) pair is a fresh XLA compile — on a tunneled
TPU that is minutes per config. Use --batches sparingly.

Usage:
    python -m demucs_tpu.tools.bench_sweep [--batches 4 8 16] \
        [--dtypes bf16 f32] [--iters 10] [--v3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


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
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

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
