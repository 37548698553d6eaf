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


def l1_loss(params: dict, mix: jnp.ndarray, refs: jnp.ndarray,
            cfg: HTDemucsConfig | HDemucsV3Config,
            remat: bool = False) -> jnp.ndarray:
    """Mean per-source L1 between separated and reference stems.

    mix: (B, 2, L); refs: (B, S, 2, L). The upstream demucs trainer's
    default time-domain objective (args.optim.loss = l1). Works for
    both the v4 (htdemucs) and v3 (hdemucs_mmi) families — the BiLSTM
    scan and LocalAttention are plain differentiable JAX.
    """
    fwd = _segment_fn_for(cfg)
    if remat:
        fwd = jax.checkpoint(fwd,
                             policy=jax.checkpoint_policies.dots_saveable,
                             static_argnums=(2,))
    est = fwd(params, mix, cfg)
    return jnp.mean(jnp.abs(est.astype(jnp.float32) -
                            refs.astype(jnp.float32)))


def make_train_step(cfg: HTDemucsConfig,
                    optimizer: optax.GradientTransformation | None = None,
                    loss_fn: Callable | None = None,
                    remat: bool = False,
                    ema_decay: float | None = None):
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
    loss = loss_fn or functools.partial(l1_loss, cfg=cfg, remat=remat)
    init_fn = make_init_fn(opt, ema_decay)
    step_impl = make_step_impl(opt, loss, ema_decay)
    return init_fn, jax.jit(step_impl, donate_argnums=(0, 1))


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


def save_train_state(path, params, opt_state, step: int) -> None:
    """Checkpoint the full training state (params + optimizer moments +
    step) as one Orbax checkpoint — the resume counterpart the
    inference-only reference never needed. Params stay in the flat
    PyTorch-named layout (params/orbax_io.py contract) so a training
    checkpoint's weights also load directly for inference."""
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
    # crash-safe overwrite: write the new state NEXT TO the live
    # checkpoint, then swap with atomic renames — a kill during the
    # save leaves the previous checkpoint intact (force=True's
    # delete-then-write would destroy the only resumable state)
    import shutil

    path = Path(path).absolute()
    new = path.with_name(path.name + ".new")
    old = path.with_name(path.name + ".old")
    for stale in (new, old):
        if stale.exists():
            shutil.rmtree(stale)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(new, state)
    if path.exists():
        path.rename(old)
    new.rename(path)
    if old.exists():
        shutil.rmtree(old)


def load_train_state(path, params_like,
                     optimizer: optax.GradientTransformation):
    """Restore (params, opt_state, step) from save_train_state.

    params_like: any tree with the right shapes/dtypes (e.g. a fresh
    init) — needed to rebuild the optimizer-state pytree structure
    (optax namedtuples) for Orbax's typed restore.
    """
    import numpy as np
    import orbax.checkpoint as ocp
    from pathlib import Path

    from .params.tree import flatten_tree, unflatten_tree

    path = Path(path).absolute()
    if not path.exists():
        # crash window between the two swap renames in save_train_state
        for cand in (path.with_name(path.name + ".old"),
                     path.with_name(path.name + ".new")):
            if cand.exists():
                path = cand
                break
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        params_like)
    target = {
        "step": np.asarray(0, np.int64),
        "params": {k: jax.ShapeDtypeStruct(np.shape(v),
                                           np.asarray(v).dtype)
                   for k, v in flatten_tree(params_like).items()},
        "opt_state": jax.eval_shape(optimizer.init, abstract),
    }
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(path, target)
    return (unflatten_tree(dict(state["params"])), state["opt_state"],
            int(state["step"]))


def make_sharded_train_step(mesh, cfg: HTDemucsConfig,
                            optimizer: optax.GradientTransformation | None = None,
                            remat: bool = False):
    """Mesh-sharded training step: batch over ``dp``, params per the
    Megatron tp rules (parallel/sharding.py), optimizer state sharded
    like its parameter. GSPMD inserts the gradient reduction over dp
    and the tp collectives — the scaling-book recipe: annotate
    shardings, let XLA place psums on ICI.

    Returns (place_fn, step_fn, place_batch):
      place_fn(params)                      -> (placed_params, opt_state)
      step_fn(params, opt_state, mix, refs) -> (params, opt_state, loss)
      place_batch(mix, refs)                -> device-placed (mix, refs)
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
        return placed, opt_state

    in_batch = NamedSharding(mesh, batch_pspec(3))
    in_refs = NamedSharding(mesh, batch_pspec(4))

    step_fn = jax.jit(
        make_step_impl(opt, functools.partial(l1_loss, cfg=cfg,
                                              remat=remat), None),
        donate_argnums=(0, 1))

    def place_batch(mix, refs):
        return (_put(mix, in_batch), _put(refs, in_refs))

    return place_fn, step_fn, place_batch
