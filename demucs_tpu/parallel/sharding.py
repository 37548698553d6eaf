"""Partition specs for Demucs parameter pytrees and segment batches.

Weights are small (80 MB for htdemucs-4s, reference README.md:98-100),
so the default layout is fully replicated with the segment batch sharded
over ``dp`` — the TPU analog of the reference's thread-per-chunk model
(cli-apps/threaded_inference.hpp). Tensor parallelism (``tp``) shards
the transformer's projection matrices, which hold most of the FLOPs
(reference hot loop src/layers.cpp:454-482); GSPMD inserts the
all-reduces.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_pspec(ndim: int = 3) -> P:
    """Segment batches (B, ...) shard their leading axis over dp."""
    return P("dp", *(None,) * (ndim - 1))


def replicated_pspecs(params) -> dict:
    return jax.tree.map(lambda _: P(), params)


def _tp_rule(path: str, shape: tuple[int, ...], tp: int) -> P:
    """Megatron-style specs for the transformer projections.

    linear1 / in_proj split the output features (row-parallel torch
    layout: weight is (out, in)); linear2 / out_proj split the input
    features, producing partial sums that GSPMD all-reduces.
    """
    def ok(dim):
        return tp > 1 and shape[dim] % tp == 0

    if path.endswith("in_proj_weight") and ok(0):
        return P("tp", None)
    if path.endswith("in_proj_bias") and ok(0):
        return P("tp")
    if "linear1" in path and path.endswith("weight") and ok(0):
        return P("tp", None)
    if "linear1" in path and path.endswith("bias") and ok(0):
        return P("tp")
    if "linear2" in path and path.endswith("weight") and ok(1):
        return P(None, "tp")
    if "out_proj" in path and path.endswith("weight") and ok(1):
        return P(None, "tp")
    return P()


def param_pspecs(params, mesh: Mesh, bag_stacked: bool = False) -> dict:
    """PartitionSpec pytree for a (possibly bag-stacked) param tree.

    Only transformer projections get tp specs; conv/norm/embedding
    weights are replicated. With ``bag_stacked`` every leaf carries a
    leading models axis (models/bag.py:stack_bag_params) sharded over
    ``bag``.
    """
    tp = mesh.shape.get("tp", 1)
    bag = mesh.shape.get("bag", 1)

    flat, treedef = jax.tree.flatten_with_path(params)
    specs = []
    for path, leaf in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        shape = tuple(leaf.shape)
        if bag_stacked:
            inner = _tp_rule(key, shape[1:], tp)
            lead = "bag" if (bag > 1 and shape[0] % bag == 0) else None
            specs.append(P(lead, *inner))
        else:
            specs.append(_tp_rule(key, shape, tp))
    return jax.tree.unflatten(treedef, specs)


def shard_params(params, mesh: Mesh, bag_stacked: bool = False):
    """Place a param pytree on the mesh per param_pspecs."""
    specs = param_pspecs(params, mesh, bag_stacked)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
