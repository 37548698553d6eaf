"""Fused int8-dequant matmul kernel — STANDBY, deliberately unwired.

Weight-only quantization (params/quant.py) stores w as int8 with
per-output-channel scales. Measured on-chip (round 2): XLA already
keeps the int8 tensor as the HBM-crossing operand and fuses the dequant
multiply into the consuming matmul — verified at the HLO level by
tests/test_quant.py (s8 parameters, no standalone converts) — and the
e2e int8 number (724.3) equals bf16 (724): the graph is
activation-bound, so weight bytes are not the bottleneck and a custom
kernel has nothing left to win. Kept as a tested standby (like
ops/pallas/dconv.py) for a hardware/shape regime where XLA's fusion
breaks or weights dominate HBM traffic; it guarantees the widening
happens in VMEM right before the MXU.

Computes y = x @ (q * scale).T for torch-Linear layout:
x (M, K), q (N, K) int8, scale (N,) -> y (M, N).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, q_ref, s_ref, o_ref):
    # x (BM, K), q (BN, K) int8, s (1, BN) -> o (BM, BN)
    w = q_ref[:].astype(jnp.bfloat16)               # widen in VMEM
    acc = jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16), w,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)         # (BM, BN)
    o_ref[:] = (acc * s_ref[0, :][None, :]).astype(o_ref.dtype)


def _pick(n: int, target: int) -> int:
    from .attention import _pick_block

    return _pick_block(n, target) or n


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8_matmul(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """x (M, K) @ dequant(q (N, K), scale (N,)).T -> (M, N), x.dtype."""
    M, K = x.shape
    N = q.shape[0]
    bm = _pick(M, 512)
    bn = _pick(N, 512)
    s2 = scale.reshape(1, N).astype(jnp.float32)

    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid=(M // bm, N // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0)),
            pl.BlockSpec((bn, K), lambda i, j: (j, 0)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        interpret=interpret,
    )(x, q, s2)


def int8_linear(x: jnp.ndarray, qleaf: dict, bias=None,
                interpret: bool = False) -> jnp.ndarray:
    """torch nn.Linear on a {"q", "scale"} leaf: x (..., K) -> (..., N)."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    q = qleaf["q"]
    scale = jnp.asarray(qleaf["scale"]).reshape(-1)
    y = int8_matmul(x.reshape(-1, K), q, scale, interpret=interpret)
    y = y.reshape(*lead, q.shape[0])
    return y if bias is None else y + jnp.asarray(bias, y.dtype)
