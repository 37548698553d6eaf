"""Training driver: MUSDB-layout stems (or synthetic data) -> checkpoint.

The reference is inference-only; this is the upstream-demucs-style
trainer loop over the TPU-native stack: SegmentSampler batches,
on-device augmentations fused into the jitted step (data.py), L1+Adam
with optional remat and EMA (train.py), Orbax checkpoint/resume.

Usage:
    python -m demucs_tpu.tools.train_cli --data MUSDB/train \
        [--steps 1000] [--batch 8] [--segment-samples 343980]
        [--lr 3e-4] [--remat] [--ema 0.9999]
        [--ckpt DIR] [--save-every 500] [--resume]
    python -m demucs_tpu.tools.train_cli --synthetic --steps 5  # smoke
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="demucs-tpu trainer")
    ap.add_argument("--data", help="dir of MUSDB-layout track dirs "
                                   "({stem}.wav files each)")
    ap.add_argument("--synthetic", action="store_true",
                    help="random training stems (smoke/benchmark)")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--segment-samples", type=int, default=None,
                    help="training crop (default: the 7.8 s segment)")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint over the segment graph")
    ap.add_argument("--ema", type=float, default=None,
                    help="EMA decay for evaluation weights")
    ap.add_argument("--ckpt", help="checkpoint dir (Orbax)")
    ap.add_argument("--save-every", type=int, default=500)
    ap.add_argument("--resume", action="store_true",
                    help="resume params/opt/step from --ckpt")
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    if bool(args.data) == bool(args.synthetic):
        ap.error("provide exactly one of --data or --synthetic")
    if args.ema is not None and args.ckpt:
        ap.error("--ema with --ckpt is not supported yet (the EMA tree "
                 "is not part of the checkpoint state)")
    if args.resume and not args.ckpt:
        ap.error("--resume needs --ckpt")

    from ..utils import enable_compile_cache

    enable_compile_cache()
    import jax
    import optax

    from .. import params as P
    from ..config import HTDEMUCS_4S, SEGMENT_SAMPLES
    from ..data import SegmentSampler, load_musdb_track
    from ..data import make_augmented_train_step
    from ..train import load_train_state, save_train_state

    cfg = HTDEMUCS_4S
    seg = args.segment_samples or SEGMENT_SAMPLES
    rng = np.random.default_rng(args.seed)

    if args.synthetic:
        tracks = [(rng.standard_normal((cfg.num_sources, 2, 4 * seg))
                   * 0.05).astype(np.float32) for _ in range(2)]
    else:
        root = Path(args.data)
        dirs = sorted(d for d in root.iterdir() if d.is_dir())
        if not dirs:
            print(f"error: no track dirs in {root}", file=sys.stderr)
            return 1
        tracks = [load_musdb_track(d, stems=cfg.sources) for d in dirs]
        print(f"loaded {len(tracks)} tracks", file=sys.stderr)
    sampler = SegmentSampler(tracks, seg, seed=args.seed)

    params = P.unflatten_tree(P.init_flat(P.htdemucs_schema(cfg),
                                          seed=args.seed))
    opt = optax.adam(args.lr)
    init_fn, step_fn = make_augmented_train_step(cfg, opt, remat=args.remat,
                                                 ema_decay=args.ema)
    opt_state = init_fn(params)
    start = 0
    if args.resume:
        params, opt_state, start = load_train_state(args.ckpt, params, opt)
        print(f"resumed at step {start}", file=sys.stderr)

    key = jax.random.key(args.seed)
    t0 = time.monotonic()
    loss = float("nan")
    for step in range(start, args.steps):
        key, sub = jax.random.split(key)
        stems = sampler.batch(args.batch)
        params, opt_state, loss_dev = step_fn(params, opt_state, sub, stems)
        if (step + 1) % args.log_every == 0 or step + 1 == args.steps:
            loss = float(loss_dev)  # host fetch = fence
            rate = (step + 1 - start) * args.batch * seg / 44100.0 \
                / max(time.monotonic() - t0, 1e-9)
            print(f"step {step + 1}/{args.steps}  loss {loss:.5f}  "
                  f"{rate:.1f} audio-s/s", file=sys.stderr)
        if args.ckpt and (step + 1) % args.save_every == 0:
            save_train_state(args.ckpt, params, opt_state, step + 1)
            print(f"checkpointed at step {step + 1}", file=sys.stderr)
    if start >= args.steps:
        print(f"nothing to do: resumed step {start} >= --steps "
              f"{args.steps}; checkpoint left untouched", file=sys.stderr)
        return 0
    if args.ckpt:
        save_train_state(args.ckpt, params, opt_state, args.steps)
        print(f"final checkpoint at {args.ckpt}", file=sys.stderr)
    if args.ema is not None:
        _, ema = opt_state
        print(f"ema tree: {len(jax.tree.leaves(ema))} leaves "
              "(in-memory; export via train.save_train_state on the "
              "ema tree)", file=sys.stderr)
    print(f"done: final loss {loss:.5f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
