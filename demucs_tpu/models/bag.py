"""BagOfModels: the htdemucs_ft ensemble (4 fine-tuned models, one stem each).

Re-design of reference cli-apps/demucs_ft.cpp:221-241: instead of 4
sequential full inferences, the four parameter pytrees are stacked on a
leading axis and the segment graph is vmapped over it — one compiled
program, 4x the arithmetic intensity, and a natural axis to shard one
model per device group (see parallel/separator.py:make_bag_fn, which
uses an explicit shard_map over the models axis).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import HTDemucsConfig
from .htdemucs import htdemucs_segment


def stack_bag_params(param_trees: list) -> dict:
    """Stack per-model pytrees along a new leading axis (models axis)."""
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *param_trees)


def bag_per_model(stacked_params: dict, mix: jnp.ndarray,
                  cfg: HTDemucsConfig) -> jnp.ndarray:
    """(M-stacked params, (B, 2, L)) -> (M, B, S, 2, L): every model's
    full separation."""
    return jax.vmap(lambda p: htdemucs_segment(p, mix, cfg))(stacked_params)


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
