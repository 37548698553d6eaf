"""Mesh-sharded full-track separation.

`ShardedSeparator` is the multi-chip counterpart of
pipeline.Separator: the per-track segment batch is sharded over the
mesh's ``dp`` axis, weights are placed per parallel/sharding.py, and
the whole segment graph runs as one jitted SPMD program. This replaces
the reference's coarse std::thread track-splitting
(cli-apps/threaded_inference.hpp:29-193) — no crossfade recombination
is needed because segmentation already happens at overlap-add
granularity and every segment is independent.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding

from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..pipeline import ApplyOptions, Separator
from .sharding import batch_pspec, param_pspecs


def make_sharded_fn(model_fn, mesh: Mesh, params, bag_stacked: bool = False):
    """Jit model_fn over the mesh; returns (jitted_fn, placed_params).

    model_fn(params, mix(B, C, L)) -> (B, S, C, L); B must be divisible
    by mesh dp size.
    """
    pspecs = param_pspecs(params, mesh, bag_stacked)
    p_shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs)
    multihost = jax.process_count() > 1
    if multihost:
        # every process holds the full (replicated-on-host) param copy;
        # build global arrays by answering per-shard index callbacks —
        # device_put of host data onto non-addressable devices is not
        # allowed across processes
        placed = jax.tree.map(
            lambda x, sh: jax.make_array_from_callback(
                np.shape(x), sh,
                lambda idx, _x=np.asarray(x): _x[idx]),
            params, p_shardings)
    else:
        placed = jax.tree.map(
            lambda x, sh: jax.device_put(jnp.asarray(x), sh),
            params, p_shardings)
    in_sharding = NamedSharding(mesh, batch_pspec(3))
    # multihost: replicate the output so every process can fetch its
    # stems without a cross-process gather
    out_sharding = NamedSharding(
        mesh, batch_pspec(4) if not multihost else
        jax.sharding.PartitionSpec())
    fn = jax.jit(
        model_fn,
        in_shardings=(p_shardings, in_sharding),
        out_shardings=out_sharding,
    )
    return fn, placed, in_sharding


def make_bag_spmd(model_fn_single, mesh: Mesh, stacked_params, select=None):
    """BagOfModels over the ``bag`` mesh axis via explicit shard_map —
    UNJITTED form, composable inside larger programs (the fused
    whole-track program embeds it).

    model_fn_single(params, mix(B, C, L)) -> (B, S, C, L); stacked_params
    carry a leading models axis M (models/bag.py:stack_bag_params). Each
    bag group runs its M/bag models locally as an UNROLLED static-index
    loop — the measured-fastest one-program form (193.3 vs 161.2
    audio-s/s for vmap on a v5e, docs/bag_forms_micro.py: vmap's
    grouped convs pay relayout copies; the unrolled slices compile to
    plain per-model subgraphs). GSPMD never partitions the model axis
    itself (its grouped-conv partitioning of vmapped conv weights
    miscompiles on some backends — found on the CPU SPMD emulator, so
    the explicit shard_map is also the safer design).
    Returns (full_fn, placed_params, input_sharding); full_fn maps
    (params, mix) -> (B, S, C, L) after per-stem selection (default:
    models/bag.py:bag_select, the ft convention).
    """
    from ..models.bag import bag_select, unrolled_model_map

    bag = mesh.shape.get("bag", 1)
    n_models = jax.tree.leaves(stacked_params)[0].shape[0]
    if n_models % bag:
        raise ValueError(f"{n_models} models not divisible by bag={bag}")

    placed = jax.tree.map(
        lambda x: jax.device_put(
            jnp.asarray(x),
            NamedSharding(mesh, P("bag", *(None,) * (x.ndim - 1)))),
        stacked_params)
    in_sharding = NamedSharding(mesh, P("dp", None, None))

    def spmd(params, mix):
        # local shapes: params (M/bag, ...), mix (B/dp, C, L)
        return unrolled_model_map(lambda p: model_fn_single(p, mix),
                                  params)

    mapped = shard_map(spmd, mesh=mesh,
                       in_specs=(P("bag"), P("dp")),
                       out_specs=P("bag", "dp"),
                       check_vma=False)

    def full(params, mix):
        per_model = mapped(params, mix)      # (M, B, S, C, L)
        return (select or bag_select)(per_model)

    return full, placed, in_sharding


def make_bag_fn(model_fn_single, mesh: Mesh, stacked_params, select=None):
    """Jitted make_bag_spmd: (jitted_fn, placed_params, input_sharding)."""
    full, placed, in_sharding = make_bag_spmd(model_fn_single, mesh,
                                              stacked_params, select)
    return jax.jit(full), placed, in_sharding


class ShardedSeparator(Separator):
    """Separator whose segment batches are dp-sharded over a mesh.

    With ``bag_stacked`` pass the *single-model* fn plus stacked params;
    the models axis is distributed one-group-per-model via make_bag_fn.
    """

    def __init__(self, model_fn, params, num_sources: int, mesh: Mesh,
                 options: ApplyOptions | None = None,
                 bag_stacked: bool = False):
        import collections
        import dataclasses

        options = options or ApplyOptions()
        dp = mesh.shape.get("dp", 1)
        # batch must tile evenly across dp shards (copy — never mutate
        # the caller's options object)
        options = dataclasses.replace(
            options,
            batch_size=max(dp, math.ceil(options.batch_size / dp) * dp))
        self.mesh = mesh
        self.options = options
        self.num_sources = num_sources
        # fused whole-track path state (the fused program dp-shards its
        # internal segment batch via _fused_model_call; input/output
        # stay replicated so the host link still sees ONE transfer)
        self._model_fn = model_fn
        self._fused_cache = collections.OrderedDict()
        self.fused_cache_limit: int | None = None
        if options.transfer_int16:
            from ..pipeline import PCM16_TRANSFER_SCALE

            base_fn = model_fn

            def model_fn(p, m, _f=base_fn):
                out = _f(p, m).astype(jnp.float32)
                q = jnp.round(out * PCM16_TRANSFER_SCALE)
                return jnp.clip(q, -32768.0, 32767.0).astype(jnp.int16)

        if options.fine_progress:
            from ..utils.progress import stage_tracing

            inner_fn = model_fn

            def model_fn(p, m):
                # trace-time wrapper: embeds the intra-segment stage
                # markers (see pipeline.Separator) in the SPMD graph
                with stage_tracing():
                    return inner_fn(p, m)

        if bag_stacked:
            full, self.params, self._in_sharding = make_bag_spmd(
                model_fn, mesh, params)
            self._fn = jax.jit(full)
            # The fused whole-track path embeds the RAW bag spmd (the
            # fused program does its own int16 encode/decode at the
            # track boundaries; reference premium config
            # cli-apps/demucs_ft.cpp:221-241): one replicated upload,
            # per-group models, device-side stem select, one download.
            # Passing the already-placed tree makes the second
            # placement a no-op (same shardings).
            self._fused_inner, _, _ = make_bag_spmd(
                self._model_fn, mesh, self.params)
        else:
            self._fn, self.params, self._in_sharding = make_sharded_fn(
                model_fn, mesh, params)
            self._fused_inner = self._model_fn

    def _place(self, host: np.ndarray):
        if jax.process_count() > 1:  # all processes see the same full track
            return jax.make_array_from_callback(
                host.shape, self._in_sharding,
                lambda idx, _b=host: _b[idx])
        return jax.device_put(host, self._in_sharding)

    # --- fused whole-track path over the mesh -------------------------
    # One (C, L) upload and one (S, C, L) download still cross the host
    # link (replicated in/out); inside the program the segment batch is
    # dp-sharded, so the whole mesh works on one track's segments.

    def _place_track(self, up: np.ndarray):
        rep = NamedSharding(self.mesh, P())
        if jax.process_count() > 1:
            return jax.make_array_from_callback(
                up.shape, rep, lambda idx, _b=up: _b[idx])
        return jax.device_put(up, rep)

    def _fused_auto_sub(self) -> int:
        # the sub-batch must cover the dp axis, or every lax.map call
        # pads its group up to a dp multiple (options.batch_size was
        # already rounded up to dp in __init__)
        return max(1, self.options.batch_size)

    def _fused_model_call(self, params, batch):
        dp = self.mesh.shape.get("dp", 1)
        pad = (-batch.shape[0]) % dp
        if pad:
            batch = jnp.pad(batch, ((0, pad),) + ((0, 0),) * (batch.ndim - 1))
        batch = jax.lax.with_sharding_constraint(
            batch, NamedSharding(self.mesh, P("dp")))
        # single-model: the raw segment fn (GSPMD shards it); bag: the
        # shard_map'd ensemble with device-side stem select
        out = self._fused_inner(params, batch)
        return out[:out.shape[0] - pad] if pad else out
