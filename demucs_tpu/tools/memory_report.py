"""Device-memory report for a compiled separation step.

Capacity planning for serving deployments: prints, per model/config,
the compiled executable's argument (weights + input), output, temp
(activation workspace) and peak HBM bytes from XLA's buffer assignment
— the numbers that decide how many concurrent model instances and what
batch size fit on one chip. (The reference has no analog; its capacity
story is a single resident fp16 weight blob, src/model_load.cpp.)

    python -m demucs_tpu.tools.memory_report [--model 4s|6s|v3]
        [--batch 8] [--segment N] [--dtype bf16|f32] [--int8] [--json]
"""

from __future__ import annotations

import argparse
import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

from .. import params as P
from ..config import HDEMUCS_V3, HTDEMUCS_4S, HTDEMUCS_6S, SEGMENT_SAMPLES
from ..models import hdemucs_v3_segment, htdemucs_segment

_MODELS = {
    "4s": (HTDEMUCS_4S, P.htdemucs_schema, htdemucs_segment),
    "6s": (HTDEMUCS_6S, P.htdemucs_schema, htdemucs_segment),
    "v3": (HDEMUCS_V3, P.hdemucs_v3_schema, hdemucs_v3_segment),
}


def compiled_memory(model: str = "4s", batch: int = 8,
                    segment: int = SEGMENT_SAMPLES, dtype=jnp.bfloat16,
                    int8: bool = False) -> dict:
    """Compile one segment step and return its HBM budget in bytes."""
    cfg, schema_fn, seg_fn = _MODELS[model]
    params = P.unflatten_tree(P.init_flat(schema_fn(cfg), seed=0))
    if int8:
        from ..params.quant import quantize_int8, quantized_model_fn
        # same layout as the benchmarked int8 config (bench_sweep): int8
        # storage, dense leaves AND the dequant target at the compute
        # dtype — an f32 dequant would double the reported temp/peak
        params = jax.tree.map(
            lambda x: jnp.asarray(x) if np.asarray(x).dtype == np.int8
            else jnp.asarray(x, dtype), quantize_int8(params))
        fn = jax.jit(quantized_model_fn(
            functools.partial(seg_fn, cfg=cfg), dtype=dtype))
    else:
        params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
        fn = jax.jit(functools.partial(seg_fn, cfg=cfg))
    mix = jnp.zeros((batch, 2, segment), jnp.float32)
    stats = fn.lower(params, mix).compile().memory_analysis()
    return {
        "model": model,
        "batch": batch,
        "segment": segment,
        "dtype": "int8" if int8 else jnp.dtype(dtype).name,
        "argument_bytes": stats.argument_size_in_bytes,
        "output_bytes": stats.output_size_in_bytes,
        "temp_bytes": stats.temp_size_in_bytes,
        "code_bytes": stats.generated_code_size_in_bytes,
        "peak_bytes": stats.peak_memory_in_bytes,
    }


def train_compiled_memory(model: str = "4s", batch: int = 2,
                          segment: int = SEGMENT_SAMPLES,
                          remat: bool = True) -> dict:
    """Compile one TRAINING step (fwd + bwd + Adam) and return its HBM
    budget — the number that sizes training batch per chip; remat
    trades temp bytes for recompute."""
    from ..train import make_train_step

    cfg, schema_fn, seg_fn = _MODELS[model]
    params = P.unflatten_tree(P.init_flat(schema_fn(cfg), seed=0))
    init_fn, step_fn = make_train_step(cfg, remat=remat)
    opt_state = jax.eval_shape(init_fn, params)
    mix = jax.ShapeDtypeStruct((batch, 2, segment), jnp.float32)
    refs = jax.ShapeDtypeStruct((batch, cfg.num_sources, 2, segment),
                                jnp.float32)
    abstract_params = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        params)
    stats = step_fn.lower(abstract_params, opt_state, mix,
                          refs).compile().memory_analysis()
    return {
        "model": model, "batch": batch, "segment": segment,
        "remat": remat, "mode": "train",
        "argument_bytes": stats.argument_size_in_bytes,
        "output_bytes": stats.output_size_in_bytes,
        "temp_bytes": stats.temp_size_in_bytes,
        "code_bytes": stats.generated_code_size_in_bytes,
        "peak_bytes": stats.peak_memory_in_bytes,
    }


def _fmt(n: int) -> str:
    return f"{n / 2**20:9.1f} MiB"


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", choices=sorted(_MODELS), default="4s")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--segment", type=int, default=SEGMENT_SAMPLES)
    ap.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--train", action="store_true",
                    help="report the TRAINING step (fwd+bwd+Adam, f32)")
    ap.add_argument("--no-remat", action="store_true",
                    help="with --train: disable jax.checkpoint")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)

    if args.train:
        rep = train_compiled_memory(args.model, args.batch, args.segment,
                                    remat=not args.no_remat)
    else:
        rep = compiled_memory(
            args.model, args.batch, args.segment,
            jnp.bfloat16 if args.dtype == "bf16" else jnp.float32, args.int8)
    if args.json:
        print(json.dumps(rep))
        return
    mode = (f"train remat={rep['remat']}" if args.train
            else f"dtype={rep['dtype']}")
    print(f"htdemucs-{args.model}  batch={args.batch} "
          f"segment={args.segment} {mode}")
    for k in ("argument_bytes", "output_bytes", "temp_bytes",
              "code_bytes", "peak_bytes"):
        print(f"  {k[:-6]:<10}{_fmt(rep[k])}")


if __name__ == "__main__":
    main()
