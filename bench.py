"""Headline benchmark: htdemucs-4s separation throughput on one chip.

Metric: audio-seconds separated per wall-second (full 7.8 s segments,
batched). Baseline: the reference's best v4 number — a 4-minute song in
4m9.3s real (4 std::threads, 5950X; reference .github/PERFORMANCE.md:49-54)
= 240/249.3 = 0.9627 audio-s/s. vs_baseline is the speedup over that.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from demucs_tpu.utils import enable_compile_cache

# persistent XLA cache: the 343980-sample graph takes minutes to compile
# through the TPU tunnel; cached recompiles are seconds.
enable_compile_cache()

from demucs_tpu import params as P
from demucs_tpu.config import HTDEMUCS_4S, SEGMENT_SAMPLES
from demucs_tpu.models import htdemucs_segment

BASELINE_AUDIO_S_PER_S = 240.0 / 249.3  # reference v4 multi-threaded


def main():
    cfg = HTDEMUCS_4S
    params = P.unflatten_tree(P.init_flat(P.htdemucs_schema(cfg)))

    on_tpu = jax.devices()[0].platform == "tpu"
    import os

    # batch 1 is the measured-fastest dispatch size (r5 fence-amortized
    # sweep, docs/PROFILE_r5.md: 983 / 968 / 818 / 754 audio-s/s at
    # batch 1/2/4/8 — below batch 8 the per-layer activations stay
    # VMEM-resident, the same cliff mechanism as the r3 batch-16 spill,
    # measured downward for the first time). Real pipelines dispatch
    # segment calls back-to-back exactly like this loop.
    batch = int(os.environ.get("DT_BENCH_BATCH", "1")) if on_tpu else 1
    seg = SEGMENT_SAMPLES if on_tpu else 65536
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((batch, 2, seg)) * 0.1, dtype)

    # Reduce to a scalar on device; fetch only the LAST result. On the
    # tunneled platform block_until_ready() returns early and every host
    # fetch costs a ~37 ms roundtrip, so the honest protocol is: dispatch
    # N in-order steps, fence once at the end, amortize — with iters
    # scaled by 1/batch so the timed window stays >~1.3 s and the fence
    # (~37 ms) adds <3% regardless of batch (at batch 1 a 10-iter
    # window is 94 ms and the fence alone would eat 28%).
    fn = jax.jit(lambda p, m: htdemucs_segment(p, m, cfg)
                 .astype(jnp.float32).sum())
    float(fn(params, mix))  # compile + warm-up (fenced)

    iters = (160 // batch if on_tpu else 2)
    rounds = 2 if on_tpu else 1  # best-of-2: the tunnel occasionally stalls
    dt = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(params, mix)
        float(out)  # single completion fence
        dt = min(dt, (time.perf_counter() - t0) / iters)

    audio_s = batch * seg / 44100.0
    rate = audio_s / dt
    print(json.dumps({
        "metric": "htdemucs4s_audio_seconds_per_second",
        "value": round(rate, 3),
        "unit": "audio_s/s",
        "vs_baseline": round(rate / BASELINE_AUDIO_S_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
