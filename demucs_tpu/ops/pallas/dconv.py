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

Every row (a (b·f) sample after the freq fold) is independent — its
GroupNorm statistics cover its own (channels, T) exactly as GroupNorm(1)
on the folded batch. The kernel walks the rows of its block with 2D
(C, T) tiles (Mosaic cannot reshape across the sublane/lane boundary,
so no (C, BN*T) flattening); intermediates are f32 and never leave
VMEM. Only the (BN, C, T) input/output tiles cross HBM.

STATUS: correct (4e-7 vs the XLA chain in f32; bf16-noise-level on
bf16 data) but measured 2.0x SLOWER than the unfused XLA chain at the
htdemucs level-0 shape (12.5 vs 6.3 ms for N=4096, C=48, T=336, both
sub-blocks) — the per-row fori_loop serializes (6, 48)x(48, 336)
matmuls that XLA batches across rows. NOT wired into the models; kept
as the starting point for a cross-row-batched variant (needs Mosaic
sublane-collapse support or a strided-lane layout) and because it wins
when C/h are large enough to fill the MXU per row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _erf(x):
    """Abramowitz & Stegun 7.1.26 polynomial erf, |err| <= 1.5e-7.

    Mosaic has no erf/erfc lowering, so exact-erf GELU is evaluated with
    this polynomial — well below the bf16 noise floor of the data.
    """
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _sub_block_kernel(x_ref, w0_ref, b0_ref, g1_ref, be1_ref,
                      w3_ref, b3_ref, g4_ref, be4_ref, sc_ref, o_ref,
                      *, dil: int, eps: float = 1e-5):
    """x_ref/o_ref: (BN, C, T). w0 (h, C, 3), w3 (2C, h)."""
    BN, C, T = x_ref.shape
    h = w0_ref.shape[0]

    w0 = w0_ref[:].astype(jnp.float32)
    b0 = b0_ref[:].astype(jnp.float32).reshape(h, 1)
    g1 = g1_ref[:].astype(jnp.float32).reshape(h, 1)
    be1 = be1_ref[:].astype(jnp.float32).reshape(h, 1)
    w3 = w3_ref[:].astype(jnp.float32)
    b3 = b3_ref[:].astype(jnp.float32).reshape(2 * C, 1)
    g4 = g4_ref[:].astype(jnp.float32).reshape(2 * C, 1)
    be4 = be4_ref[:].astype(jnp.float32).reshape(2 * C, 1)
    sc = sc_ref[:].astype(jnp.float32).reshape(C, 1)

    def row(b, _):
        x = x_ref[b].astype(jnp.float32)           # (C, T)
        xp = jnp.pad(x, ((0, 0), (dil, dil)))
        acc = jnp.zeros((h, T), jnp.float32)
        for k in range(3):
            acc = acc + jax.lax.dot_general(
                w0[:, :, k], xp[:, k * dil:k * dil + T],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        y = acc + b0

        mean = y.mean()
        var = jnp.square(y - mean).mean()
        y = (y - mean) * jax.lax.rsqrt(var + eps) * g1 + be1
        y = _gelu(y)

        z = jax.lax.dot_general(
            w3, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b3
        mean = z.mean()
        var = jnp.square(z - mean).mean()
        z = (z - mean) * jax.lax.rsqrt(var + eps) * g4 + be4

        a, g = z[:C], z[C:]
        o_ref[b] = (x + a * jax.nn.sigmoid(g) * sc).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, BN, row, 0)


@functools.partial(jax.jit, static_argnames=("dil", "interpret"))
def dconv_sub_block(x: jnp.ndarray, w0, b0, g1, be1, w3, b3, g4, be4, scale,
                    dil: int = 1, interpret: bool = False) -> jnp.ndarray:
    """One fused DConv sub-block. x: (N, C, T)."""
    N, C, T = x.shape
    h = w0.shape[0]
    bn = 32
    while N % bn:
        bn //= 2
    w3_2d = jnp.asarray(w3)
    if w3_2d.ndim == 3:
        w3_2d = w3_2d[:, :, 0]

    return pl.pallas_call(
        functools.partial(_sub_block_kernel, dil=dil),
        out_shape=jax.ShapeDtypeStruct((N, C, T), x.dtype),
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((bn, C, T), lambda i: (i, 0, 0)),
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
        out_specs=pl.BlockSpec((bn, C, T), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(x, w0, b0, g1, be1, w3_2d, b3, g4, be4, scale)


def dconv_fused(x: jnp.ndarray, blocks: list, interpret: bool = False
                ) -> jnp.ndarray:
    """Fused DConv on (N, C, T): one kernel launch per sub-block.

    Numerically equivalent to models/htdemucs.dconv (same f32 stats).
    """
    for j, blk in enumerate(blocks):
        x = dconv_sub_block(
            x,
            blk["0"]["weight"], blk["0"]["bias"],
            blk["1"]["weight"], blk["1"]["bias"],
            blk["3"]["weight"], blk["3"]["bias"],
            blk["4"]["weight"], blk["4"]["bias"],
            blk["6"]["scale"],
            dil=2 ** j, interpret=interpret)
    return x
