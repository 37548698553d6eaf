"""Training driver: MUSDB-layout stems (or synthetic data) -> checkpoint.

The reference is inference-only; this is the upstream-demucs-style
trainer loop over the TPU-native stack: SegmentSampler batches,
on-device augmentations fused into the jitted step (data.py), L1+Adam
with optional remat / bf16-compute / EMA (train.py), Orbax
checkpoint/resume with the EMA tree in the state.

The fine-tuning lineage the model family actually has (the published
htdemucs_ft checkpoints are fine-tunes of htdemucs, reference
scripts/convert-pth-to-ggml.py:22-28) is `--init-from model.bin`:
start from a converted checkpoint instead of random init, and export
the result (EMA weights when --ema is on, the upstream convention —
the hub checkpoints ARE the EMA artifacts) back to a ggml file the
inference CLI loads directly.

Usage:
    python -m demucs_tpu.tools.train_cli --data MUSDB/train \
        [--family htdemucs_4s|htdemucs_6s|hdemucs_v3]
        [--init-from MODEL.bin|ORBAX_DIR]
        [--steps 1000] [--batch 8] [--segment-samples 343980]
        [--lr 3e-4] [--remat] [--remat-policy dots|none|dots_nb]
        [--bf16-compute] [--ema 0.9999]
        [--ckpt DIR] [--save-every 500] [--resume]
        [--export-ggml OUT.bin]
        [--coordinator HOST:PORT --num-processes N --process-id I [--tp T]]
    python -m demucs_tpu.tools.train_cli --synthetic --steps 5  # smoke
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

FAMILIES = ("htdemucs_4s", "htdemucs_6s", "hdemucs_v3")
# ggml container kind per family (params/ggml.py:GGML_MAGICS)
GGML_KIND = {"htdemucs_4s": "htdemucs_4s", "htdemucs_6s": "htdemucs_6s",
             "hdemucs_v3": "hdemucs_mmi"}


def _family_setup(family: str):
    """family name -> (cfg, schema)."""
    from .. import params as P
    from ..config import HDEMUCS_V3, HTDEMUCS_4S, HTDEMUCS_6S

    if family == "hdemucs_v3":
        return HDEMUCS_V3, P.hdemucs_v3_schema(HDEMUCS_V3)
    cfg = HTDEMUCS_6S if family == "htdemucs_6s" else HTDEMUCS_4S
    return cfg, P.htdemucs_schema(cfg)


def _family_of_cfg(cfg) -> str:
    from ..config import HDemucsV3Config

    if isinstance(cfg, HDemucsV3Config):
        return "hdemucs_v3"
    return "htdemucs_6s" if cfg.num_sources == 6 else "htdemucs_4s"


def _replicate_to_host(tree, mesh):
    """Fetch a mesh-sharded tree to host numpy (all processes must
    call; multi-host shards are not host-addressable individually)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    rep = jax.jit(lambda t: t,
                  out_shardings=NamedSharding(mesh, PartitionSpec()))(tree)
    return jax.tree.map(np.asarray, rep)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="demucs-tpu trainer")
    ap.add_argument("--data", help="dir of MUSDB-layout track dirs "
                                   "({stem}.wav files each)")
    ap.add_argument("--synthetic", action="store_true",
                    help="random training stems (smoke/benchmark)")
    ap.add_argument("--family", choices=FAMILIES, default=None,
                    help="model family (default htdemucs_4s; inferred "
                         "from --init-from when given)")
    ap.add_argument("--init-from", dest="init_from",
                    help="warm-start weights: ggml file or Orbax params "
                         "dir (fine-tuning lineage — the htdemucs_ft "
                         "checkpoints are fine-tunes of htdemucs)")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--segment-samples", type=int, default=None,
                    help="training crop (default: the 7.8 s segment)")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint over the segment graph")
    ap.add_argument("--remat-policy", choices=("dots", "none", "dots_nb"),
                    default="dots", help="remat policy (train.REMAT_POLICIES)")
    ap.add_argument("--bf16-compute", action="store_true",
                    help="bf16 forward/backward, f32 master weights + Adam")
    ap.add_argument("--steps-per-call", type=int, default=1,
                    help="optimizer steps per device dispatch "
                         "(lax.scan; amortizes the ~10 ms/step host "
                         "pytree marshaling — docs/PROFILE_r4.md §8; "
                         "single-host only)")
    ap.add_argument("--ema", type=float, default=None,
                    help="EMA decay for evaluation weights (persisted "
                         "in the checkpoint; exported by --export-ggml)")
    ap.add_argument("--ckpt", help="checkpoint dir (Orbax)")
    ap.add_argument("--save-every", type=int, default=500)
    ap.add_argument("--eval-every", type=int, default=0,
                    help="evaluate the EMA (or current) weights on "
                         "held-out tracks every N steps: valid-set L1 "
                         "per stem, logged to stderr and (with --ckpt) "
                         "to CKPT.eval.jsonl; tracks best-so-far and "
                         "keeps a CKPT.best checkpoint (upstream demucs "
                         "evaluates the EMA weights — train.py:195)")
    ap.add_argument("--eval-data",
                    help="dir of held-out MUSDB-layout track dirs "
                         "(default with --synthetic: a held-out "
                         "synthetic track)")
    ap.add_argument("--eval-sdr", action="store_true",
                    help="also report per-stem SDR (median over 1 s "
                         "frames, tools/evaluate_sdr.py) at each eval")
    ap.add_argument("--resume", action="store_true",
                    help="resume params/opt/step/EMA from --ckpt")
    ap.add_argument("--export-ggml", dest="export_ggml",
                    help="write final weights (EMA tree when --ema is "
                         "on) as a ggml file for the inference CLI")
    # multi-host (one process per host; net-new vs the single-process
    # reference — SURVEY.md §2.3)
    ap.add_argument("--coordinator", default=None,
                    help="jax.distributed coordinator address HOST:PORT")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel degree (multi-host mesh)")
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--test-tiny", action="store_true",
                    help=argparse.SUPPRESS)  # tests: shrink the model
    args = ap.parse_args(argv)
    if bool(args.data) == bool(args.synthetic):
        ap.error("provide exactly one of --data or --synthetic")
    if args.resume and not args.ckpt:
        ap.error("--resume needs --ckpt")
    if args.num_processes > 1 and not args.coordinator:
        ap.error("--num-processes > 1 needs --coordinator")
    if args.steps_per_call < 1:
        ap.error("--steps-per-call must be >= 1")
    if args.steps_per_call > 1:
        if args.num_processes > 1:
            ap.error("--steps-per-call > 1 is single-host only")
        if args.save_every % args.steps_per_call:
            ap.error("--save-every must be a multiple of --steps-per-call")
    if args.eval_every:
        if not (args.eval_data or args.synthetic):
            ap.error("--eval-every needs --eval-data (or --synthetic)")
        if args.steps_per_call > 1 and args.eval_every % args.steps_per_call:
            ap.error("--eval-every must be a multiple of --steps-per-call")

    from ..utils import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import optax

    multihost = args.num_processes > 1
    if multihost:
        jax.distributed.initialize(args.coordinator,
                                   num_processes=args.num_processes,
                                   process_id=args.process_id)
    is_lead = args.process_id == 0

    from .. import params as P
    from ..config import SEGMENT_SAMPLES
    from ..data import SegmentSampler, load_musdb_track
    from ..data import make_augmented_train_step
    from ..train import load_train_state, save_train_state

    # --- model: family + init weights -------------------------------
    if args.init_from:
        from ..params.ggml import load_model_params

        cfg, params = load_model_params(args.init_from)
        fam = _family_of_cfg(cfg)
        if args.family and args.family != fam:
            ap.error(f"--family {args.family} conflicts with --init-from "
                     f"({args.init_from} is a {fam} checkpoint)")
        if is_lead:
            print(f"initialized from {args.init_from} ({fam})",
                  file=sys.stderr)
    else:
        fam = args.family or "htdemucs_4s"
        cfg, schema = _family_setup(fam)
        if args.test_tiny:  # CI-sized variant (multi-process CPU tests)
            import dataclasses

            if fam == "hdemucs_v3":
                ap.error("--test-tiny supports the htdemucs families")
            cfg = dataclasses.replace(cfg, channels=8, bottom_channels=32,
                                      t_layers=3)
            schema = P.htdemucs_schema(cfg)
        params = P.unflatten_tree(P.init_flat(schema, seed=args.seed))

    seg = args.segment_samples or SEGMENT_SAMPLES
    rng = np.random.default_rng(args.seed)

    # --- data --------------------------------------------------------
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
        if is_lead:
            print(f"loaded {len(tracks)} tracks", file=sys.stderr)
    # every process samples the same global batch from the same seed;
    # in multi-host mode place_batch slices out each host's dp shard
    sampler = SegmentSampler(tracks, seg, seed=args.seed)

    # --- held-out evaluation set -------------------------------------
    eval_tracks: list[np.ndarray] = []
    if args.eval_every:
        if args.eval_data:
            eroot = Path(args.eval_data)
            edirs = sorted(d for d in eroot.iterdir() if d.is_dir())
            if not edirs:
                print(f"error: no track dirs in {eroot}", file=sys.stderr)
                return 1
            eval_tracks = [load_musdb_track(d, stems=cfg.sources)
                           for d in edirs]
        else:  # --synthetic: one held-out synthetic track
            ev_rng = np.random.default_rng(args.seed + 10_000)
            eval_tracks = [(ev_rng.standard_normal(
                (cfg.num_sources, 2, 2 * seg + 1001)) * 0.05
                ).astype(np.float32)]
        if is_lead:
            print(f"eval set: {len(eval_tracks)} held-out track(s)",
                  file=sys.stderr)

    # --- step --------------------------------------------------------
    opt = optax.adam(args.lr)
    compute_dtype = jnp.bfloat16 if args.bf16_compute else None
    if multihost:
        from ..parallel.mesh import make_multihost_mesh
        from ..train import make_sharded_train_step

        mesh = make_multihost_mesh(tp=args.tp)
        if args.batch % mesh.shape["dp"]:
            ap.error(f"--batch {args.batch} must divide by dp="
                     f"{mesh.shape['dp']}")
        place_fn, step_fn, place_batch = make_sharded_train_step(
            mesh, cfg, opt, remat=args.remat,
            remat_policy=args.remat_policy, compute_dtype=compute_dtype,
            ema_decay=args.ema, augment=True)
        params, opt_state = place_fn(params)
    else:
        if args.steps_per_call > 1:
            from ..data import make_augmented_multi_train_step

            init_fn, step_fn = make_augmented_multi_train_step(
                cfg, opt, remat=args.remat, ema_decay=args.ema,
                remat_policy=args.remat_policy,
                compute_dtype=compute_dtype)
        else:
            init_fn, step_fn = make_augmented_train_step(
                cfg, opt, remat=args.remat, ema_decay=args.ema,
                remat_policy=args.remat_policy,
                compute_dtype=compute_dtype)
        opt_state = init_fn(params)
        place_batch = jnp.asarray

    def split_state(state):
        """(opt_state, ema_or_None) regardless of --ema."""
        if args.ema is not None:
            return state[0], state[1]
        return state, None

    def _place_like(host, placed):
        """Overwrite `placed`'s values with host arrays, keeping its
        shardings (multi-host: index callbacks, device_put cannot
        target non-addressable devices)."""
        def put(h, p):
            if jax.process_count() > 1:
                return jax.make_array_from_callback(
                    np.shape(h), p.sharding,
                    lambda idx, _h=np.asarray(h): _h[idx])
            return jax.device_put(np.asarray(h), p.sharding)
        return jax.tree.map(put, host, placed)

    start = 0
    if args.resume:
        # restore to host trees first; re-place onto the live shardings
        loaded, opt_loaded, start, ema_loaded = load_train_state(
            args.ckpt, params, opt)
        if multihost:
            fresh_opt, fresh_ema = split_state(opt_state)
            params = _place_like(loaded, params)
            opt_placed = _place_like(opt_loaded, fresh_opt)
            if args.ema is not None:
                ema = (_place_like(ema_loaded, fresh_ema)
                       if ema_loaded is not None else fresh_ema)
                opt_state = (opt_placed, ema)
            else:
                opt_state = opt_placed
        else:
            params = jax.tree.map(jnp.asarray, loaded)
            if args.ema is not None:
                ema = (jax.tree.map(jnp.asarray, ema_loaded)
                       if ema_loaded is not None
                       else jax.tree.map(lambda x: jnp.array(x, copy=True),
                                         params))
                opt_state = (opt_loaded, ema)
            else:
                opt_state = opt_loaded
        if is_lead:
            print(f"resumed at step {start}", file=sys.stderr)

    def do_save(step_no):
        o, e = split_state(opt_state)
        if multihost:
            # every process fetches the replicated state AND calls
            # save_train_state (it is collective: Orbax saves end in a
            # global barrier; the lead does the filesystem swap)
            p_host = _replicate_to_host(params, mesh)
            o_host = _replicate_to_host(o, mesh)
            e_host = _replicate_to_host(e, mesh) if e is not None else None
            save_train_state(args.ckpt, p_host, o_host, step_no,
                             ema=e_host)
        else:
            save_train_state(args.ckpt, params, o, step_no, ema=e)
        if is_lead:
            print(f"checkpointed at step {step_no}", file=sys.stderr)

    # --- evaluation loop ---------------------------------------------
    # Scores the EMA weights when --ema is on (the upstream-demucs
    # convention: the shipped hub checkpoints ARE the EMA artifacts),
    # else the live params. Every process evaluates deterministically
    # (same replicated weights, same data) so the best-checkpoint save
    # stays a consistent collective in multi-host mode.
    from ..models import hdemucs_v3_segment, htdemucs_segment
    from ..config import HDemucsV3Config
    from ..pipeline import ApplyOptions, Separator

    seg_fn = (hdemucs_v3_segment if isinstance(cfg, HDemucsV3Config)
              else htdemucs_segment)
    best = {"l1": float("inf"), "step": -1}
    eval_log = (Path(str(args.ckpt) + ".eval.jsonl")
                if args.ckpt and is_lead else None)
    eval_cache: dict = {}  # one Separator => one jit cache across evals

    def evaluate(step_no) -> None:
        import json

        _, e = split_state(opt_state)
        weights = e if e is not None else params
        if multihost:
            weights = _replicate_to_host(weights, mesh)
        sep = eval_cache.get("sep")
        if sep is None:
            sep = Separator(lambda p, m: seg_fn(p, m, cfg), weights,
                            cfg.num_sources,
                            ApplyOptions(segment_samples=seg,
                                         shift_offset=0,
                                         batch_size=args.batch))
            eval_cache["sep"] = sep
        else:  # swap weights, keep the compiled programs
            import jax.numpy as _jnp

            sep.params = jax.tree.map(_jnp.asarray, weights)
        l1s, sdrs = [], []
        for stems in eval_tracks:
            mix = stems.sum(0)
            est = sep(mix)
            l1s.append(float(np.mean(np.abs(est - stems))))
            if args.eval_sdr:
                from .evaluate_sdr import median_sdr

                sdrs.append([median_sdr(stems[i], est[i])
                             for i in range(cfg.num_sources)])
        l1 = float(np.mean(l1s))
        rec = {"step": step_no, "l1": l1,
               "weights": "ema" if e is not None else "params"}
        if sdrs:
            rec["sdr"] = {name: round(float(np.mean([s[i] for s in sdrs])), 3)
                          for i, name in enumerate(cfg.sources)}
        improved = l1 < best["l1"]
        if improved:
            best.update(l1=l1, step=step_no)
            rec["best"] = True
            if args.ckpt:
                o, e2 = split_state(opt_state)
                if multihost:
                    save_train_state(
                        str(args.ckpt) + ".best",
                        _replicate_to_host(params, mesh),
                        _replicate_to_host(o, mesh), step_no,
                        ema=_replicate_to_host(e2, mesh)
                        if e2 is not None else None)
                else:
                    save_train_state(str(args.ckpt) + ".best", params, o,
                                     step_no, ema=e2)
        if is_lead:
            extra = f"  sdr {rec.get('sdr')}" if sdrs else ""
            mark = "  (best)" if improved else ""
            print(f"eval @ step {step_no}: l1 {l1:.5f}{extra}{mark}",
                  file=sys.stderr)
            if eval_log is not None:
                with open(eval_log, "a") as f:
                    f.write(json.dumps(rec) + "\n")

    K = args.steps_per_call
    if K > 1 and start < args.steps and (args.steps - start) % K:
        ap.error(f"--steps-per-call {K} must divide the remaining "
                 f"steps ({args.steps} - resumed {start})")
    key = jax.random.key(args.seed)
    t0 = time.monotonic()
    loss = float("nan")
    step = start
    while step < args.steps:
        key, sub = jax.random.split(key)
        if K > 1:
            stems = np.stack([sampler.batch(args.batch)
                              for _ in range(K)])
            params, opt_state, losses_dev = step_fn(
                params, opt_state, sub, place_batch(stems))
            loss_dev = losses_dev[-1]
        else:
            stems = sampler.batch(args.batch)
            params, opt_state, loss_dev = step_fn(params, opt_state, sub,
                                                  place_batch(stems))
        step += K
        if step % args.log_every < K or step == args.steps:
            loss = float(loss_dev)  # host fetch = fence
            rate = (step - start) * args.batch * seg / 44100.0 \
                / max(time.monotonic() - t0, 1e-9)
            if is_lead:
                print(f"step {step}/{args.steps}  loss {loss:.5f}  "
                      f"{rate:.1f} audio-s/s", file=sys.stderr)
        if args.eval_every and step % args.eval_every < K:
            evaluate(step)
        if args.ckpt and step % args.save_every == 0 \
                and step != args.steps:
            do_save(step)
    if start >= args.steps:
        print(f"nothing to do: resumed step {start} >= --steps "
              f"{args.steps}; checkpoint left untouched", file=sys.stderr)
        return 0
    if args.eval_every and args.steps % args.eval_every:
        evaluate(args.steps)  # close the curve at the final step
    if args.ckpt:
        do_save(args.steps)
        if is_lead:
            print(f"final checkpoint at {args.ckpt}", file=sys.stderr)
            if args.eval_every and best["step"] >= 0:
                print(f"best eval l1 {best['l1']:.5f} at step "
                      f"{best['step']} -> {args.ckpt}.best",
                      file=sys.stderr)

    if args.export_ggml:
        from ..params.ggml import write_ggml

        _, e = split_state(opt_state)
        export = e if e is not None else params
        if multihost:
            export = _replicate_to_host(export, mesh)
        if is_lead:
            which = "EMA" if e is not None else "trained"
            flat = {k: np.asarray(v)
                    for k, v in P.flatten_tree(export).items()}
            write_ggml(args.export_ggml, GGML_KIND[fam], flat)
            print(f"exported {which} weights -> {args.export_ggml} "
                  f"({GGML_KIND[fam]})", file=sys.stderr)
    if is_lead:
        print(f"done: final loss {loss:.5f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
