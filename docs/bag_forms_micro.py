"""On-chip A/B of BagOfModels execution forms (VERDICT r3 weak #1).

The deployed multi-device bag (parallel/separator.py:make_bag_fn) runs
each bag group's local models with jax.vmap over the stacked params —
measured 13% slower than 4 sequential dispatches of one compiled
program (160.9 vs 184.8 audio-s/s at r2, grouped-conv-under-vmap
layout overhead). Candidates, all compiling to ONE program so they can
serve as the shard_map local body:

  vmap     jax.vmap over the stacked model axis (current form)
  scan     lax.scan over the stacked model axis (one model's program,
           XLA loops it — no grouped-conv batching, minimal code size)
  unroll   python loop over static model index, outputs stacked (the
           sequential form INSIDE one jit; per-model slices are
           constant-index gathers XLA folds away)
  dispatch 4 separate dispatches of one jitted single-model program
           (the SequentialBagSeparator baseline — NOT usable inside
           shard_map, shown as the reference rate)

Timing per CLAUDE.md: dispatch iters steps back-to-back, ONE host
fetch. Run on the real chip:
    python docs/bag_forms_micro.py [--batch 8] [--iters 6]

(Measured r4 numbers live in docs/PROFILE_r4.md.)
"""

import argparse
import os
import sys
import time

import numpy as np

# run as `python docs/bag_forms_micro.py` (PYTHONPATH interferes with
# the axon plugin registration — same pattern as the other docs micros)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--segment-samples", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from demucs_tpu import params as P
    from demucs_tpu.config import HTDEMUCS_4S, SEGMENT_SAMPLES
    from demucs_tpu.models import htdemucs_segment
    from demucs_tpu.models.bag import stack_bag_params

    cfg = HTDEMUCS_4S
    seg = args.segment_samples or SEGMENT_SAMPLES
    trees = [jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16),
                          P.unflatten_tree(P.init_flat(
                              P.htdemucs_schema(cfg), seed=s)))
             for s in range(4)]
    stacked = stack_bag_params(trees)
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((args.batch, 2, seg)) * 0.1,
                      jnp.bfloat16)
    single = lambda p, m: htdemucs_segment(p, m, cfg)  # noqa: E731
    audio_s = args.batch * seg / 44100.0

    def timed(fn, params, label, per_call=1):
        out = fn(params, mix)
        float(jnp.sum(out.astype(jnp.float32)))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(params, mix)
        float(jnp.sum(out.astype(jnp.float32)))  # ONE fence
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{label:9s} {dt:7.3f} s/step  {audio_s / dt:6.1f} "
              "audio-s/s", flush=True)
        return dt

    # vmap (current make_bag_fn local body)
    timed(jax.jit(lambda p, m: jax.vmap(lambda pi: single(pi, m))(p)),
          stacked, "vmap")

    # scan over the model axis
    def scan_fn(p, m):
        def body(_, pi):
            return None, single(pi, m)
        _, ys = jax.lax.scan(body, None, p)
        return ys

    timed(jax.jit(scan_fn), stacked, "scan")

    # unrolled static-index loop (sequential INSIDE one program)
    def unroll_fn(p, m):
        M = jax.tree.leaves(p)[0].shape[0]
        outs = [single(jax.tree.map(lambda x: x[i], p), m)
                for i in range(M)]
        return jnp.stack(outs)

    timed(jax.jit(unroll_fn), stacked, "unroll")

    # 4 dispatches of one compiled program (sequential baseline)
    fn1 = jax.jit(single)
    out = fn1(trees[0], mix)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        for t in trees:
            out = fn1(t, mix)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / args.iters
    print(f"{'dispatch':9s} {dt:7.3f} s/step  {audio_s / dt:6.1f} "
          "audio-s/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
