"""Orbax checkpoint IO for parameter trees.

The reference's only weight format is its ggml container
(src/model_load.cpp; bit-preserved by params/ggml.py). For users living
in the JAX ecosystem this module adds the idiomatic alternative: an
Orbax StandardCheckpointer over the same PyTorch-named flat dict, so
trees round-trip with dtypes intact and load sharded under a Mesh via
the normal Orbax restore-with-abstract-target path.

Flat-dict (not nested) on disk: the schema's dotted PyTorch names are
the stable contract (params/schema.py), identical to the ggml records.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from .tree import flatten_tree, unflatten_tree


def save_checkpoint(path: str | Path, tree) -> None:
    """Write a param tree (nested or flat) as an Orbax checkpoint."""
    import orbax.checkpoint as ocp

    flat = tree if _is_flat(tree) else flatten_tree(tree)
    flat = {k: np.asarray(v) for k, v in flat.items()}
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(Path(path).absolute(), flat)


def load_checkpoint(path: str | Path, dtype=None) -> dict:
    """Read an Orbax checkpoint back into the nested param tree.

    dtype (optional) casts floating-point leaves on restore (e.g.
    jnp.bfloat16 for the TPU serving configuration).
    """
    flat = load_flat(path)
    if dtype is not None:
        # jnp.issubdtype, not np: ml_dtypes floats (bfloat16, float8)
        # are NOT np.floating subtypes and must still be cast
        import jax.numpy as jnp

        flat = {
            k: (np.asarray(v).astype(dtype)
                if jnp.issubdtype(np.asarray(v).dtype, jnp.floating) else v)
            for k, v in flat.items()
        }
    return unflatten_tree(flat)


def load_flat(path: str | Path) -> dict:
    """Restore the flat PyTorch-named state dict from a checkpoint dir."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return dict(ckptr.restore(Path(path).absolute()))


def infer_kind(flat: dict) -> str:
    """Model kind from the state-dict contents (an Orbax dir carries no
    ggml magic): v3 has no crosstransformer; 4s vs 6s differ in the last
    freq decoder's CaC output width (num_sources * 4)."""
    if not any(k.startswith("crosstransformer.") for k in flat):
        return "hdemucs_v3"
    key = "decoder.3.conv_tr.weight"
    if key not in flat:
        raise ValueError(
            f"unrecognized checkpoint: has a crosstransformer but no {key} "
            "(not a stock htdemucs 4s/6s tree)")
    out_ch = np.asarray(flat[key]).shape[1]
    kinds = {16: "htdemucs_4s", 24: "htdemucs_6s"}
    if out_ch not in kinds:
        raise ValueError(
            f"unrecognized checkpoint: {key} has {out_ch} output channels; "
            "expected 16 (htdemucs-4s) or 24 (htdemucs-6s)")
    return kinds[out_ch]


def _is_flat(tree) -> bool:
    return isinstance(tree, dict) and all(
        not isinstance(v, dict) and not isinstance(v, (list, tuple))
        for v in tree.values())
