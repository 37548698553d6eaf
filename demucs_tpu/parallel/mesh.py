"""Device mesh construction (ICI within a slice, DCN across hosts).

Axis order is (bag, dp, tp): tp innermost so tensor-parallel
collectives ride the fastest ICI links; bag outermost so each
fine-tuned model of the ensemble lives on a contiguous device group
(reference analog: one full model per std::thread-group,
cli-apps/demucs_ft.cpp:221-241 — but concurrent here).
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("bag", "dp", "tp")


def mesh_shape_for(n_devices: int, tp: int = 1, bag: int = 1) -> tuple[int, int, int]:
    """Factor n_devices into (bag, dp, tp); dp absorbs the remainder."""
    if n_devices % (tp * bag):
        raise ValueError(f"{n_devices} devices not divisible by tp={tp} * bag={bag}")
    return (bag, n_devices // (tp * bag), tp)


def make_mesh(devices=None, tp: int = 1, bag: int = 1) -> Mesh:
    """Build a (bag, dp, tp) mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    shape = mesh_shape_for(len(devices), tp=tp, bag=bag)
    assert math.prod(shape) == len(devices)
    return Mesh(np.asarray(devices).reshape(shape), AXES)


def make_multihost_mesh(tp: int = 1, bag: int = 1) -> Mesh:
    """Multi-host mesh: bag/dp ride DCN (cross-host), tp stays on ICI.

    Call jax.distributed.initialize() first (one process per host). Uses
    create_hybrid_device_mesh so the tp axis maps to intra-slice links —
    tensor-parallel all-reduces never cross hosts, while segment batches
    and BagOfModels groups (independent, no collectives) span DCN. This
    is the net-new distributed capability the reference lacks
    (SURVEY.md §2.3: no MPI/NCCL/sockets — single process only).
    """
    from jax.experimental import mesh_utils

    n = jax.device_count()
    n_hosts = max(jax.process_count(), 1)
    per_host = n // n_hosts
    if tp > per_host or per_host % tp:
        raise ValueError(f"tp={tp} must divide per-host device count {per_host}")
    shape = mesh_shape_for(n, tp=tp, bag=bag)
    dcn_bag = math.gcd(shape[0], n_hosts)
    dcn_dp = n_hosts // dcn_bag
    if n_hosts == 1:  # single host: no DCN dimension exists
        return make_mesh(tp=tp, bag=bag)
    if shape[1] % dcn_dp:
        raise ValueError(
            f"dp={shape[1]} (from {n} devices / tp={tp} / bag={bag}) is not "
            f"divisible by the {dcn_dp} hosts left after the bag axis "
            f"absorbs {dcn_bag} of {n_hosts}; choose tp/bag so the "
            "data-parallel axis splits evenly across hosts")
    devices = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(shape[0] // dcn_bag, shape[1] // dcn_dp, shape[2]),
        dcn_mesh_shape=(dcn_bag, dcn_dp, 1),
        process_is_granule=True,
    )
    return Mesh(devices, AXES)
