"""Training-step throughput sweep: batch x remat-policy x compute dtype.

The training counterpart of bench_sweep.py (net-new axis — the
reference is inference-only, SURVEY.md §1). Each config is one fresh
XLA compile (minutes through a tunneled TPU); one JSON line per config:

    python -m demucs_tpu.tools.bench_train --batches 2 4 8
    python -m demucs_tpu.tools.bench_train --batches 4 \
        --remat off dots none dots_nb --dtypes f32 bf16

Timing protocol (CLAUDE.md): steps chain through the donated params,
so dispatching N steps and fetching the LAST loss fences the chain —
one host roundtrip per timed window.

A config that exceeds HBM is recorded as {"oom": true} instead of
crashing the sweep (that boundary is itself the measurement).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def bench_one(cfg, batch: int, seg: int, remat: str, dtype_name: str,
              iters: int, lr: float = 3e-4,
              steps_per_call: int = 1) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from .. import params as P
    from ..train import make_multi_train_step, make_train_step

    compute_dtype = jnp.bfloat16 if dtype_name == "bf16" else None
    maker = (make_multi_train_step if steps_per_call > 1
             else make_train_step)
    init_fn, step_fn = maker(
        cfg, optax.adam(lr),
        remat=remat != "off",
        remat_policy=remat if remat != "off" else "dots",
        compute_dtype=compute_dtype)

    # master weights stay f32 (the mixed-precision recipe); the step
    # casts to bf16 inside the differentiated function when asked
    params = jax.tree.map(jnp.asarray, P.unflatten_tree(
        P.init_flat(P.htdemucs_schema(cfg) if hasattr(cfg, "t_layers")
                    else P.hdemucs_v3_schema(cfg), seed=0)))
    opt_state = init_fn(params)
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((batch, 2, seg)) * 0.1,
                      jnp.float32)
    refs = jnp.asarray(rng.standard_normal(
        (batch, cfg.num_sources, 2, seg)) * 0.05, jnp.float32)

    if steps_per_call > 1:
        mix = jnp.broadcast_to(mix, (steps_per_call,) + mix.shape)
        refs = jnp.broadcast_to(refs, (steps_per_call,) + refs.shape)

    def fence(loss):
        float(loss[-1] if steps_per_call > 1 else loss)

    t0 = time.perf_counter()
    p, s, loss = step_fn(params, opt_state, mix, refs)
    fence(loss)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        p, s, loss = step_fn(p, s, mix, refs)
    fence(loss)  # fences the whole chain
    dt = (time.perf_counter() - t0) / (iters * steps_per_call)
    return {"step_s": round(dt, 4),
            "audio_s_per_s": round(batch * seg / 44100.0 / dt, 1),
            "compile_s": round(compile_s, 1)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="training-step sweep")
    ap.add_argument("--batches", type=int, nargs="+", default=[2])
    ap.add_argument("--remat", nargs="+", default=["dots"],
                    choices=["off", "dots", "none", "dots_nb"])
    ap.add_argument("--dtypes", nargs="+", default=["f32"],
                    choices=["f32", "bf16"])
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--v3", action="store_true")
    ap.add_argument("--family", choices=("htdemucs_4s", "htdemucs_6s",
                                         "hdemucs_v3"), default=None,
                    help="model family (--v3 is shorthand for "
                         "hdemucs_v3)")
    ap.add_argument("--steps-per-call", type=int, default=1,
                    help="optimizer steps per dispatch (lax.scan)")
    ap.add_argument("--segment-samples", type=int, default=None)
    args = ap.parse_args(argv)

    from ..utils import enable_compile_cache

    enable_compile_cache()
    from ..config import (HDEMUCS_V3, HTDEMUCS_4S, HTDEMUCS_6S,
                          SEGMENT_SAMPLES)

    fam = args.family or ("hdemucs_v3" if args.v3 else "htdemucs_4s")
    cfg = {"htdemucs_4s": HTDEMUCS_4S, "htdemucs_6s": HTDEMUCS_6S,
           "hdemucs_v3": HDEMUCS_V3}[fam]
    seg = args.segment_samples or SEGMENT_SAMPLES

    for dtype_name in args.dtypes:
        for remat in args.remat:
            for batch in args.batches:
                rec = {"model": "hdemucs_mmi" if fam == "hdemucs_v3"
                       else fam,
                       "batch": batch, "remat": remat,
                       "compute_dtype": dtype_name,
                       "segment_samples": seg}
                if args.steps_per_call > 1:
                    rec["steps_per_call"] = args.steps_per_call
                try:
                    rec.update(bench_one(cfg, batch, seg, remat,
                                         dtype_name, args.iters,
                                         steps_per_call=args.steps_per_call))
                except Exception as e:  # OOM boundary is a data point
                    msg = str(e)
                    if "RESOURCE_EXHAUSTED" not in msg and "emory" not in msg:
                        raise
                    rec.update({"oom": True, "error": msg.splitlines()[0][:200]})
                print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
