"""Training step for the Demucs v4 segment graph (net-new vs the
reference — sevagh/demucs.cpp is a pure-inference engine, SURVEY.md §1;
the loss/optimizer conventions follow the upstream facebookresearch/
demucs trainer the reference's checkpoints come from: per-source L1 on
waveforms, Adam).

TPU-first design:
  * one jitted (params, opt_state, mix, refs) -> (params, opt_state,
    loss) step; optimizer state and master weights stay f32, the
    forward/backward run in the weight dtype;
  * optional `jax.checkpoint` rematerialization over the segment graph
    (trades MXU FLOPs for HBM — the 7.8 s segment's activations
    dominate training memory);
  * multi-chip: dp-sharded batch + Megatron-style tp param shardings
    from parallel/sharding.py, compiled with pjit (GSPMD inserts the
    grad all-reduces over the mesh; no hand-written collectives).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from .config import HDemucsV3Config, HTDemucsConfig
from .models import hdemucs_v3_segment, htdemucs_segment


def _segment_fn_for(cfg):
    """v4 or v3 graph by config type (same dispatch as cli._segment_fn)."""
    if isinstance(cfg, HDemucsV3Config):
        return hdemucs_v3_segment
    return htdemucs_segment


REMAT_POLICIES = {
    # dots_saveable: keep every matmul output, recompute the cheap
    # elementwise/norm chains — the r3 default
    "dots": jax.checkpoint_policies.dots_saveable,
    # nothing_saveable: recompute the whole segment graph in the
    # backward (minimum HBM, maximum recompute FLOPs)
    "none": jax.checkpoint_policies.nothing_saveable,
    # dots_with_no_batch_dims: save only true contractions (excludes
    # the batched einsum forms the conv lowerings use)
    "dots_nb": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
}


def l1_loss(params: dict, mix: jnp.ndarray, refs: jnp.ndarray,
            cfg: HTDemucsConfig | HDemucsV3Config,
            remat: bool = False, remat_policy: str = "dots",
            compute_dtype=None) -> jnp.ndarray:
    """Mean per-source L1 between separated and reference stems.

    mix: (B, 2, L); refs: (B, S, 2, L). The upstream demucs trainer's
    default time-domain objective (args.optim.loss = l1). Works for
    both the v4 (htdemucs) and v3 (hdemucs_mmi) families — the BiLSTM
    scan and LocalAttention are plain differentiable JAX.

    compute_dtype (e.g. jnp.bfloat16) casts the float params for the
    forward/backward only — master weights, grads, and the optimizer
    update stay f32 (the standard mixed-precision recipe; the cast is
    inside the differentiated function, so grads come back f32).
    """
    if mix.shape[0] != refs.shape[0]:
        # a mismatched batch would silently BROADCAST through the L1
        # (running the model at the smaller batch) — caught live in a
        # bench harness that under-reported the step by exactly B_r/B_m
        raise ValueError(f"mix batch {mix.shape[0]} != refs batch "
                         f"{refs.shape[0]}")
    fwd = _segment_fn_for(cfg)
    if remat:
        fwd = jax.checkpoint(fwd, policy=REMAT_POLICIES[remat_policy],
                             static_argnums=(2,))
    if compute_dtype is not None:
        params = jax.tree.map(
            lambda x: x.astype(compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
        mix = mix.astype(compute_dtype)
    est = fwd(params, mix, cfg)
    return jnp.mean(jnp.abs(est.astype(jnp.float32) -
                            refs.astype(jnp.float32)))


def make_train_step(cfg: HTDemucsConfig,
                    optimizer: optax.GradientTransformation | None = None,
                    loss_fn: Callable | None = None,
                    remat: bool = False,
                    ema_decay: float | None = None,
                    remat_policy: str = "dots",
                    compute_dtype=None):
    """Returns (init_fn, step_fn).

    Without ema_decay:
      init_fn(params) -> opt_state
      step_fn(params, opt_state, mix, refs) -> (params, opt_state, loss)
    With ema_decay (the upstream demucs trainer keeps batch-level EMA
    copies of the weights for evaluation, demucs/solver.py):
      init_fn(params) -> (opt_state, ema_params)
      step_fn(params, (opt_state, ema), mix, refs)
          -> (params, (opt_state, ema), loss)

    step_fn is jitted with donated params/opt_state (in-place update on
    device — no second copy of the model in HBM).
    """
    opt = optimizer or optax.adam(3e-4)
    loss = loss_fn or functools.partial(l1_loss, cfg=cfg, remat=remat,
                                        remat_policy=remat_policy,
                                        compute_dtype=compute_dtype)
    init_fn = make_init_fn(opt, ema_decay)
    step_impl = make_step_impl(opt, loss, ema_decay)
    return init_fn, jax.jit(step_impl, donate_argnums=(0, 1))


def make_multi_train_step(cfg: HTDemucsConfig,
                          optimizer: optax.GradientTransformation | None = None,
                          loss_fn: Callable | None = None,
                          remat: bool = False,
                          ema_decay: float | None = None,
                          remat_policy: str = "dots",
                          compute_dtype=None):
    """K chained optimizer steps per device dispatch (lax.scan).

    Each dispatch of the single-step make_train_step re-marshals the
    533-leaf donated params pytree — measured ~10 ms/step of host time
    next to a 57 ms device step (docs/PROFILE_r4.md §8). Scanning K
    steps inside one jit amortizes that to ~10/K ms: the standard
    host-offload trainer pattern (upload K batches, dispatch once).

    Returns (init_fn, multi_step_fn):
      multi_step_fn(params, opt_state, mixes, refss) ->
          (params, opt_state, losses)
    with mixes (K, B, 2, L), refss (K, B, S, 2, L), losses (K,) — K is
    whatever leading length the batch arrays carry (static per
    compile). The op sequence is K sequential step_fn calls (the scan
    body compiles once, so XLA fusion choices can differ from the
    per-step graphs at float level). EMA composes as in
    make_train_step.
    """
    opt = optimizer or optax.adam(3e-4)
    loss = loss_fn or functools.partial(l1_loss, cfg=cfg, remat=remat,
                                        remat_policy=remat_policy,
                                        compute_dtype=compute_dtype)
    init_fn = make_init_fn(opt, ema_decay)
    step_impl = make_step_impl(opt, loss, ema_decay)

    def multi_step(params, opt_state, mixes, refss):
        def body(carry, batch):
            p, s = carry
            p, s, l = step_impl(p, s, batch[0], batch[1])
            return (p, s), l

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (mixes, refss))
        return params, opt_state, losses

    return init_fn, jax.jit(multi_step, donate_argnums=(0, 1))


def make_init_fn(opt: optax.GradientTransformation,
                 ema_decay: float | None):
    def init_fn(params):
        if ema_decay is not None:
            # a REAL copy: jnp.asarray would alias device-placed params
            # and the donated step would then try to donate the same
            # buffer twice (argnum 0 and the ema leaf of argnum 1)
            return opt.init(params), jax.tree.map(
                lambda x: jnp.array(x, copy=True), params)
        return opt.init(params)

    return init_fn


def make_step_impl(opt: optax.GradientTransformation, loss: Callable,
                   ema_decay: float | None):
    """Un-jitted (params, opt_state, mix, refs) -> (params, opt_state,
    loss) body — shared by make_train_step and the augmented variant
    (data.py) so the optimizer/EMA logic exists exactly once."""

    def step_impl(params, opt_state, mix, refs):
        ema = None
        if ema_decay is not None:
            opt_state, ema = opt_state
        l, grads = jax.value_and_grad(
            lambda p: loss(p, mix, refs))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema_decay is not None:
            ema = jax.tree.map(
                lambda e, p: e * ema_decay + p.astype(e.dtype)
                * (1.0 - ema_decay), ema, params)
            return params, (opt_state, ema), l
        return params, opt_state, l

    return step_impl


def save_train_state(path, params, opt_state, step: int, ema=None) -> None:
    """Checkpoint the full training state (params + optimizer moments +
    step + optional EMA weights) as one Orbax checkpoint — the resume
    counterpart the inference-only reference never needed. Params (and
    the EMA tree) stay in the flat PyTorch-named layout
    (params/orbax_io.py contract) so a training checkpoint's weights
    also load directly for inference.

    ema: the EMA parameter tree from a make_train_step(ema_decay=...)
    state. Upstream demucs evaluates and SHIPS the EMA weights (the
    converted hub checkpoints are EMA artifacts,
    reference scripts/convert-pth-to-ggml.py:22-28), so a release-able
    trainer must persist them.
    """
    import numpy as np
    import orbax.checkpoint as ocp
    from pathlib import Path

    from .params.tree import flatten_tree

    state = {
        "step": np.asarray(step, np.int64),
        "params": {k: np.asarray(v)
                   for k, v in flatten_tree(params).items()},
        "opt_state": jax.tree.map(np.asarray, opt_state),
    }
    if ema is not None:
        state["ema"] = {k: np.asarray(v)
                        for k, v in flatten_tree(ema).items()}
    # crash-safe overwrite: write the new state NEXT TO the live
    # checkpoint, then swap with atomic renames — a kill during the
    # save leaves the previous checkpoint intact (force=True's
    # delete-then-write would destroy the only resumable state).
    # Multi-process: EVERY process must call this function (Orbax's
    # save ends in a global barrier); the filesystem dance runs on the
    # lead only, fenced by global syncs.
    import shutil

    multiproc = jax.process_count() > 1
    lead = jax.process_index() == 0

    def _sync(tag):
        if multiproc:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(tag)

    path = Path(path).absolute()
    new = path.with_name(path.name + ".new")
    old = path.with_name(path.name + ".old")
    if lead:
        if not path.exists():
            # crash landed between the two swap renames: the only
            # complete state lives in .new (written before the swap
            # began) or .old (the pre-save checkpoint). Promote it back
            # to `path` FIRST — the stale cleanup below must never
            # delete the only copy.
            for cand in (new, old):
                if cand.exists():
                    cand.rename(path)
                    break
        for stale in (new, old):
            if stale.exists():
                shutil.rmtree(stale)
    _sync("demucs_ckpt_pre")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(new, state)
    _sync("demucs_ckpt_written")
    if lead:
        if path.exists():
            path.rename(old)
        new.rename(path)
        if old.exists():
            shutil.rmtree(old)
    _sync("demucs_ckpt_post")


def load_train_state(path, params_like,
                     optimizer: optax.GradientTransformation):
    """Restore (params, opt_state, step, ema_or_None) from
    save_train_state.

    params_like: any tree with the right shapes/dtypes (e.g. a fresh
    init) — needed to rebuild the optimizer-state pytree structure
    (optax namedtuples) for Orbax's typed restore. The EMA slot is
    detected from the checkpoint's own metadata, so checkpoints written
    with and without --ema both load.
    """
    import numpy as np
    import orbax.checkpoint as ocp
    from pathlib import Path

    from .params.tree import flatten_tree, unflatten_tree

    path = Path(path).absolute()
    if not path.exists():
        # crash window between the two swap renames in save_train_state:
        # .new is the complete just-written state (it exists before the
        # live path is ever moved aside), .old the previous one — prefer
        # the newer
        for cand in (path.with_name(path.name + ".new"),
                     path.with_name(path.name + ".old")):
            if cand.exists():
                path = cand
                break
    def _sds(x):
        # works for host arrays AND mesh-sharded (non-addressable)
        # global arrays — never materializes the value
        dt = getattr(x, "dtype", None)
        return jax.ShapeDtypeStruct(
            jnp.shape(x), dt if dt is not None else np.asarray(x).dtype)

    abstract = jax.tree.map(_sds, params_like)
    flat_like = {k: _sds(v)
                 for k, v in flatten_tree(params_like).items()}
    target = {
        "step": np.asarray(0, np.int64),
        "params": dict(flat_like),
        "opt_state": jax.eval_shape(optimizer.init, abstract),
    }
    with ocp.StandardCheckpointer() as ckptr:
        try:
            has_ema = "ema" in ckptr.metadata(path).item_metadata
        except Exception:  # orbax versions with a different metadata API
            # structural fallback: StandardCheckpointer lays each top-
            # level item out as a subdirectory — never silently drop a
            # saved EMA tree just because the metadata API moved
            has_ema = (path / "ema").exists()
            import sys

            print(f"train: checkpoint metadata lookup failed at {path}; "
                  f"detected EMA slot structurally: {has_ema}",
                  file=sys.stderr)
        if has_ema:
            target["ema"] = dict(flat_like)
        state = ckptr.restore(path, target)
    ema = (unflatten_tree(dict(state["ema"])) if "ema" in state else None)
    return (unflatten_tree(dict(state["params"])), state["opt_state"],
            int(state["step"]), ema)


def make_sharded_train_step(mesh, cfg: HTDemucsConfig,
                            optimizer: optax.GradientTransformation | None = None,
                            remat: bool = False,
                            remat_policy: str = "dots",
                            compute_dtype=None,
                            ema_decay: float | None = None,
                            augment: bool = False):
    """Mesh-sharded training step: batch over ``dp``, params per the
    Megatron tp rules (parallel/sharding.py), optimizer state sharded
    like its parameter. GSPMD inserts the gradient reduction over dp
    and the tp collectives — the scaling-book recipe: annotate
    shardings, let XLA place psums on ICI.

    Returns (place_fn, step_fn, place_batch):
      place_fn(params)                      -> (placed_params, opt_state)
      step_fn(params, opt_state, mix, refs) -> (params, opt_state, loss)
      place_batch(mix, refs)                -> device-placed (mix, refs)

    With augment=True the step fuses the on-device augmentations
    (data.augment_stems) and the signatures become the augmented-step
    ones: step_fn(params, opt_state, key, stems(B,S,C,T)) and
    place_batch(stems) -> placed stems. With ema_decay, opt_state is
    (opt_state, ema) exactly as in make_train_step.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .parallel.sharding import batch_pspec, param_pspecs

    opt = optimizer or optax.adam(3e-4)

    def _put(x, sh):
        if jax.process_count() > 1:
            # every process holds the full host copy; build the global
            # array by per-shard index callbacks (device_put cannot
            # target non-addressable devices)
            import numpy as np

            return jax.make_array_from_callback(
                np.shape(x), sh, lambda idx, _x=np.asarray(x): _x[idx])
        return jax.device_put(jnp.asarray(x), sh)

    def place_fn(params):
        pspecs = param_pspecs(params, mesh)
        shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs)
        placed = jax.tree.map(_put, params, shardings)
        # optimizer state mirrors its parameter's sharding for free:
        # opt.init builds moments with zeros_like on the placed arrays,
        # which inherit the input sharding; step counters replicate
        opt_state = opt.init(placed)
        if ema_decay is not None:
            ema = jax.tree.map(lambda x: jnp.array(x, copy=True), placed)
            return placed, (opt_state, ema)
        return placed, opt_state

    in_batch = NamedSharding(mesh, batch_pspec(3))
    in_refs = NamedSharding(mesh, batch_pspec(4))

    loss = functools.partial(l1_loss, cfg=cfg, remat=remat,
                             remat_policy=remat_policy,
                             compute_dtype=compute_dtype)
    step_impl = make_step_impl(opt, loss, ema_decay)

    # flash attention stays ON under the mesh: the pallas kernels carry
    # custom_partitioning rules (ops/pallas/attention.py flash_*_p) that
    # shard the batch/head grid axes, so the fused flash backward's
    # +31% survives multi-chip training (the r4 _flash_safe einsum
    # fallback is gone).
    if augment:
        from .data import augment_stems, mix_from_stems

        def aug_step(params, opt_state, key, stems):
            a = augment_stems(key, stems)
            return step_impl(params, opt_state, mix_from_stems(a), a)

        step_fn = jax.jit(aug_step, donate_argnums=(0, 1))

        def place_batch(stems):
            return _put(stems, in_refs)
    else:
        step_fn = jax.jit(step_impl, donate_argnums=(0, 1))

        def place_batch(mix, refs):
            return (_put(mix, in_batch), _put(refs, in_refs))

    return place_fn, step_fn, place_batch
