"""ft-bag throughput: vmapped ensemble vs 4 sequential jitted calls.

Round-1 measured the vmapped bag at 96 audio-s/s vs ~110 ideal (441/4)
— a 13% overhead with grouped-conv-under-vmap as the suspect. This
tool measures both strategies on the same chip so the bag runs whichever
wins (pipeline picks via BAG_STRATEGY).

Usage: python -m demucs_tpu.tools.bench_bag [--iters 6] [--batch 8]
Prints one JSON line per strategy.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args(argv)

    from ..utils import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from .. import params as P
    from ..config import HTDEMUCS_4S, SEGMENT_SAMPLES
    from ..models import htdemucs_segment
    from ..models.bag import bag_segment, stack_bag_params

    cfg = HTDEMUCS_4S
    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    batch = args.batch if on_tpu else 1
    seg = SEGMENT_SAMPLES if on_tpu else 65536

    trees = [
        jax.tree.map(lambda x: jnp.asarray(x, dtype),
                     P.unflatten_tree(P.init_flat(P.htdemucs_schema(cfg),
                                                  seed=s)))
        for s in range(4)
    ]
    stacked = stack_bag_params(trees)
    mix = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, 2, seg)) * 0.1,
        dtype)
    audio_s = batch * seg / 44100.0

    def timed(fn, *a):
        float(fn(*a))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = None
            for _ in range(args.iters):
                out = fn(*a)
            float(out)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best

    # 1) vmapped bag (one program)
    vfn = jax.jit(lambda p, m: bag_segment(p, m, cfg)
                  .astype(jnp.float32).sum())
    dt = timed(vfn, stacked, mix)
    print(json.dumps({"strategy": "vmap", "step_s": round(dt, 4),
                      "audio_s_per_s": round(audio_s / dt, 1)}))

    # 2) four sequential jitted calls (reference demucs_ft.cpp:221-241
    #    shape, but batched); one compile, params swapped per call
    sfn = jax.jit(lambda p, m: htdemucs_segment(p, m, cfg)
                  .astype(jnp.float32).sum())

    def seq(trees, m):
        out = None
        for t in trees:
            out = sfn(t, m)
        return out

    dt = timed(seq, trees, mix)
    print(json.dumps({"strategy": "sequential4", "step_s": round(dt, 4),
                      "audio_s_per_s": round(audio_s / dt, 1),
                      "note": "time for all four models on the same batch"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
