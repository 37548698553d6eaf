"""BagOfModels: the htdemucs_ft ensemble (4 fine-tuned models, one stem each).

Re-design of reference cli-apps/demucs_ft.cpp:221-241: the four
parameter pytrees are stacked on a leading axis and the segment graph
runs over it inside ONE compiled program — a natural axis to shard one
model per device group (see parallel/separator.py:make_bag_fn, which
uses an explicit shard_map over the models axis).

Execution form (measured on a v5e chip, docs/bag_forms_micro.py,
batch 8 / bf16 / full segments):
    unrolled static-index loop  193.3 audio-s/s  <- used here
    lax.scan over models        192.4
    4 dispatches of one program 187.7 (the old SequentialBagSeparator
                                       ideal — beaten: no per-dispatch
                                       overhead inside one program)
    jax.vmap over models        161.2 (grouped-conv layout overhead)
The unrolled form keeps each model's convs un-grouped (XLA folds the
constant-index gathers away) while sharing one dispatch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import HTDemucsConfig
from .htdemucs import htdemucs_segment


def stack_bag_params(param_trees: list) -> dict:
    """Stack per-model pytrees along a new leading axis (models axis)."""
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *param_trees)


def unrolled_model_map(fn, stacked_params):
    """Apply fn to each model slice of the stacked tree; outputs get a
    leading models axis. The measured-fastest one-program bag form:
    static-index slices compile to plain (non-grouped, non-batched)
    per-model subgraphs."""
    M = jax.tree.leaves(stacked_params)[0].shape[0]
    return jnp.stack([fn(jax.tree.map(lambda x, _i=i: x[_i],
                                      stacked_params))
                      for i in range(M)])


def bag_per_model(stacked_params: dict, mix: jnp.ndarray,
                  cfg: HTDemucsConfig) -> jnp.ndarray:
    """(M-stacked params, (B, 2, L)) -> (M, B, S, 2, L): every model's
    full separation."""
    return unrolled_model_map(lambda p: htdemucs_segment(p, mix, cfg),
                              stacked_params)


def bag_select(per_model: jnp.ndarray) -> jnp.ndarray:
    """(M, B, S, 2, L) -> (B, S, 2, L): keep model i's stem i only (the
    ft convention, reference cli-apps/demucs_ft.cpp:233-241). Requires
    M == S."""
    M, _, S = per_model.shape[:3]
    assert M == S, (M, S)
    return jnp.stack([per_model[i, :, i] for i in range(M)], axis=1)


def bag_segment(stacked_params: dict, mix: jnp.ndarray,
                cfg: HTDemucsConfig) -> jnp.ndarray:
    """(M-stacked params, (B, 2, L)) -> (B, S, 2, L)."""
    return bag_select(bag_per_model(stacked_params, mix, cfg))
