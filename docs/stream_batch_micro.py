"""Compute-bound streaming-vs-offline adjudication (VERDICT r4 #7).

The r4 streaming-vs-offline comparison was measured in a degraded-link
window, so it adjudicated the LINK, not the compute. On the device the
two paths run the SAME compiled segment program and differ only in
batch size per dispatch: streaming with ~1 s pushes finalizes at most
one segment per push (batch-1 calls; stride = 5.85 s of audio per
segment), while the offline path batches 8. This micro measures the
per-segment device rate at each batch size with the only honest
protocol on the tunnel (dispatch N calls back-to-back, ONE host fence
at the end — per-fetch fences cost ~37 ms each, CLAUDE.md).

Run on chip: python docs/stream_batch_micro.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from demucs_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from demucs_tpu import params as P
from demucs_tpu.config import HTDEMUCS_4S, SEGMENT_SAMPLES
from demucs_tpu.models import htdemucs_segment

cfg = HTDEMUCS_4S
dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
tree = jax.tree.map(
    lambda x: jnp.asarray(x, dtype),
    P.unflatten_tree(P.init_flat(P.htdemucs_schema(cfg), seed=0)))

fn = jax.jit(lambda p, m: htdemucs_segment(p, m, cfg)
             .astype(jnp.float32).sum())
rng = np.random.default_rng(0)

# iters scale with 1/batch so the timed window stays >1.3 s: the ~37 ms
# host-fence otherwise dominates small-batch readings (a 16-dispatch
# batch-1 window is 150 ms and reads ~20% slow — the first version of
# this micro under-reported batch 1 at 833 vs the true 983)
ITERS = {1: 170, 2: 90, 4: 45, 8: 20}

print(f"{'batch':>5} {'ms/call':>9} {'ms/segment':>11} {'audio-s/s':>10}")
for rep in range(3):
    for bs in (1, 2, 4, 8):
        mix = jnp.asarray(
            rng.standard_normal((bs, 2, SEGMENT_SAMPLES)) * 0.1, dtype)
        float(fn(tree, mix))  # compile + warm (cached after rep 0)
        n = ITERS[bs]
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(tree, mix)
        float(out)  # single fence for the whole chain
        dt = (time.perf_counter() - t0) / n
        per_seg = dt / bs
        rate = bs * SEGMENT_SAMPLES / 44100.0 / dt
        print(f"{bs:>5} {dt * 1e3:>9.1f} {per_seg * 1e3:>11.1f}"
              f" {rate:>10.1f}", flush=True)
