"""Fused DConv residual block kernel.

The DConv branch (reference src/layers.cpp:152-375) is a chain of 12
small ops per sub-block — on TPU each materializes a full (N, C, T)
or (N, h, T) tensor, so the chain is pure HBM traffic (~12x the tensor
size). This kernel runs the whole sub-block in VMEM per row-block:

    y = conv1d(x, W0, k=3, pad=dil, dil=dil)   # C -> h (= C/compress)
    y = GroupNorm1(y) ; y = GELU(y)
    y = conv1d(y, W3, k=1)                     # h -> 2C
    y = GroupNorm1(y) ; y = GLU(y, dim=C)      # 2C -> C
    x = x + layer_scale * y

Layout: the caller passes x as (C, N, T) (channels leading) so the
in-kernel contractions are clean 2D matmuls with the row*time axis on
the MXU lanes; rows are fully independent (each (b·f) sample normalizes
over its own (h, T), exactly like GroupNorm(1) on the folded batch).

All intermediates are f32; only the (C, BN, T) input/output tiles cross
HBM. Weights (a few KB) are replicated into every grid step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _sub_block_kernel(x_ref, w0_ref, b0_ref, g1_ref, be1_ref,
                      w3_ref, b3_ref, g4_ref, be4_ref, sc_ref, o_ref,
                      *, dil: int, eps: float = 1e-5):
    """x_ref/o_ref: (C, BN, T). w0 (h, C, 3), w3 (2C, h)."""
    C, BN, T = x_ref.shape
    h = w0_ref.shape[0]

    x = x_ref[:].astype(jnp.float32)
    x2 = x.reshape(C, BN * T)

    # conv k=3 with dilation: three shifted matmuls. Shift via pad+slice
    # (VMEM-local); zero padding == the conv's own zero pad.
    xp = jnp.pad(x, ((0, 0), (0, 0), (dil, dil)))
    acc = jnp.zeros((h, BN * T), jnp.float32)
    for k in range(3):
        xs = xp[:, :, k * dil:k * dil + T].reshape(C, BN * T)
        acc = acc + jax.lax.dot_general(
            w0_ref[:, :, k].astype(jnp.float32), xs,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    y = acc + b0_ref[:].astype(jnp.float32)[:, None]

    # GroupNorm(1) per row: stats over (h, T) for each of the BN rows
    y3 = y.reshape(h, BN, T)
    mean = y3.mean(axis=(0, 2), keepdims=True)
    var = jnp.square(y3 - mean).mean(axis=(0, 2), keepdims=True)
    y3 = (y3 - mean) * jax.lax.rsqrt(var + eps)
    y3 = y3 * g1_ref[:].astype(jnp.float32)[:, None, None] \
        + be1_ref[:].astype(jnp.float32)[:, None, None]
    y = _gelu(y3).reshape(h, BN * T)

    # 1x1 expand h -> 2C
    z = jax.lax.dot_general(
        w3_ref[:].astype(jnp.float32), y,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    z = z + b3_ref[:].astype(jnp.float32)[:, None]

    z3 = z.reshape(2 * C, BN, T)
    mean = z3.mean(axis=(0, 2), keepdims=True)
    var = jnp.square(z3 - mean).mean(axis=(0, 2), keepdims=True)
    z3 = (z3 - mean) * jax.lax.rsqrt(var + eps)
    z3 = z3 * g4_ref[:].astype(jnp.float32)[:, None, None] \
        + be4_ref[:].astype(jnp.float32)[:, None, None]

    a, g = z3[:C], z3[C:]
    y_out = a * jax.nn.sigmoid(g) * sc_ref[:].astype(jnp.float32)[:, None, None]
    o_ref[:] = (x + y_out).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dil", "interpret"))
def dconv_sub_block(x: jnp.ndarray, w0, b0, g1, be1, w3, b3, g4, be4, scale,
                    dil: int = 1, interpret: bool = False) -> jnp.ndarray:
    """One fused DConv sub-block. x: (C, N, T) channels-leading."""
    C, N, T = x.shape
    h = w0.shape[0]
    bn = 64
    while N % bn:
        bn //= 2
    grid = (N // bn,)

    return pl.pallas_call(
        functools.partial(_sub_block_kernel, dil=dil),
        out_shape=jax.ShapeDtypeStruct((C, N, T), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((C, bn, T), lambda i: (0, i, 0)),
            pl.BlockSpec((h, C, 3), lambda i: (0, 0, 0)),
            pl.BlockSpec((h,), lambda i: (0,)),
            pl.BlockSpec((h,), lambda i: (0,)),
            pl.BlockSpec((h,), lambda i: (0,)),
            pl.BlockSpec((2 * C, h), lambda i: (0, 0)),
            pl.BlockSpec((2 * C,), lambda i: (0,)),
            pl.BlockSpec((2 * C,), lambda i: (0,)),
            pl.BlockSpec((2 * C,), lambda i: (0,)),
            pl.BlockSpec((C,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((C, bn, T), lambda i: (0, i, 0)),
        interpret=interpret,
    )(x, w0, b0, g1, be1, w3, b3, g4, be4, scale)


def dconv_fused(x: jnp.ndarray, blocks: list, interpret: bool = False
                ) -> jnp.ndarray:
    """Fused DConv on (N, C, T): one kernel launch per sub-block.

    Numerically equivalent to models/htdemucs.dconv (same f32 stats).
    """
    xc = jnp.transpose(x, (1, 0, 2))              # (C, N, T)
    for j, blk in enumerate(blocks):
        xc = dconv_sub_block(
            xc,
            blk["0"]["weight"], blk["0"]["bias"],
            blk["1"]["weight"], blk["1"]["bias"],
            jnp.asarray(blk["3"]["weight"])[:, :, 0], blk["3"]["bias"],
            blk["4"]["weight"], blk["4"]["bias"],
            blk["6"]["scale"],
            dil=2 ** j, interpret=interpret)
    return jnp.transpose(xc, (1, 0, 2))
