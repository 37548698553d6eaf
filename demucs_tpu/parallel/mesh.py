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
