"""Fused GroupNorm(1) -> GLU -> LayerScale -> residual pallas kernel.

HONEST NEGATIVE RESULT (kept for the record, not wired into models):
the DConv expand tail (reference src/layers.cpp:152-375: norm "4" ->
GLU -> LayerScale -> residual) moves ~1.3 GB/step through XLA as three
HBM passes, and this kernel does it in one read + write — yet measures
SLOWER on a v5e (4.31 vs 3.88 ms at R=4096, 2C=96, T=336, bf16): the
kernel is VPU-bound (f32 converts + two-stage reductions + sigmoid at
~8x the byte floor) while XLA's mature elementwise codegen wins despite
2.5x the traffic. Same lesson as ops/pallas/dconv.py — at Demucs
widths, Mosaic VPU chains don't beat XLA fusions.

Mosaic note: rank-reducing reductions (jnp.sum(..., axis=2)) fail with
"Invalid relayout"; the keepdims form compiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# per-program VMEM budget for the f32 working set (bytes); v5e has
# 16 MB more-or-less usable — stay well under it
_VMEM_BUDGET = 6 * 1024 * 1024


def _gn_glu_res_kernel(x_ref, g_ref, b_ref, ls_ref, r_ref, o_ref,
                       *, eps: float):
    """x_ref: (rb, 2C, T); r_ref/o_ref: (rb, C, T); g/b: (2C,); ls: (C,)."""
    x = x_ref[...].astype(jnp.float32)
    rb, c2, t = x.shape
    c = c2 // 2
    n = c2 * t
    # keepdims two-stage reductions — Mosaic rejects the rank-reducing
    # form ("invalid relayout" on the (rb, 2C) intermediate)
    s1 = jnp.sum(x, axis=2, keepdims=True)           # (rb, 2C, 1)
    mean = jnp.sum(s1, axis=1, keepdims=True) / n    # (rb, 1, 1)
    d = x - mean
    v1 = jnp.sum(d * d, axis=2, keepdims=True)
    var = jnp.sum(v1, axis=1, keepdims=True) / n
    y = d * jax.lax.rsqrt(var + eps)
    y = (y * g_ref[...].astype(jnp.float32)[None, :, None]
         + b_ref[...].astype(jnp.float32)[None, :, None])
    a = y[:, :c, :]
    gate = y[:, c:, :]
    out = a * jax.nn.sigmoid(gate)
    out = out * ls_ref[...].astype(jnp.float32)[None, :, None]
    o_ref[...] = (out + r_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def gn_glu_res_supported(x_shape: tuple, dtype) -> bool:
    """True when one row's f32 working set fits the VMEM budget."""
    _, c2, t = x_shape
    # x f32 + y + out + residual, roughly 4 slabs
    return 4 * c2 * t * 4 <= _VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def gn_glu_scale_res(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
                     scale: jnp.ndarray, res: jnp.ndarray,
                     eps: float = 1e-5, interpret: bool = False
                     ) -> jnp.ndarray:
    """GroupNorm(1, affine) -> GLU(dim=1) -> LayerScale -> + res.

    x: (R, 2C, T); weight/bias: (2C,); scale: (C,); res: (R, C, T).
    Returns (R, C, T) in x.dtype. Matches ops.group_norm + ops.glu +
    ops.layer_scale + add to f32 accuracy.
    """
    R, c2, T = x.shape
    c = c2 // 2
    # pick the largest row block whose working set fits the budget
    per_row = 4 * c2 * T * 4
    rb = max(1, min(R, _VMEM_BUDGET // per_row))
    while R % rb:
        rb -= 1
    out = pl.pallas_call(
        functools.partial(_gn_glu_res_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((R, c, T), x.dtype),
        grid=(R // rb,),
        in_specs=[
            pl.BlockSpec((rb, c2, T), lambda r: (r, 0, 0)),
            pl.BlockSpec((c2,), lambda r: (0,)),
            pl.BlockSpec((c2,), lambda r: (0,)),
            pl.BlockSpec((c,), lambda r: (0,)),
            pl.BlockSpec((rb, c, T), lambda r: (r, 0, 0)),
        ],
        out_specs=pl.BlockSpec((rb, c, T), lambda r: (r, 0, 0)),
        interpret=interpret,
    )(x, weight, bias, scale, res)
    return out
