"""Convolutions with PyTorch-compatible semantics on TPU.

The reference lowers every conv to im2col + GEMM with compile-time
template shapes (reference src/conv.hpp:16-524). On TPU the idiomatic
design is `lax.conv_general_dilated`, which XLA tiles directly onto the
MXU; transposed convs are expressed as input-dilated convs with flipped
kernels (exactly PyTorch's ConvTranspose semantics).

Weight layouts follow PyTorch state dicts:
  conv1d:           (out, in, k)
  conv2d:           (out, in, kh, kw)
  conv_transpose1d: (in, out, k)
  conv_transpose2d: (in, out, kh, kw)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DN1 = ("NCH", "OIH", "NCH")
_DN2 = ("NCHW", "OIHW", "NCHW")


def _bias(y: jnp.ndarray, b: jnp.ndarray | None, spatial: int) -> jnp.ndarray:
    if b is None:
        return y
    return y + b.reshape((1, -1) + (1,) * spatial)


def conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None,
           stride: int = 1, padding: int = 0, dilation: int = 1,
           groups: int = 1) -> jnp.ndarray:
    """x: (B, C, T), w: (O, I/groups, K) -> (B, O, T')."""
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=lax.conv_dimension_numbers(x.shape, w.shape, _DN1),
        feature_group_count=groups,
    )
    return _bias(y, b, 1)


def conv2d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None,
           stride=(1, 1), padding=(0, 0), dilation=(1, 1),
           groups: int = 1) -> jnp.ndarray:
    """x: (B, C, H, W), w: (O, I/groups, KH, KW) -> (B, O, H', W')."""
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=tuple(stride),
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=tuple(dilation),
        dimension_numbers=lax.conv_dimension_numbers(x.shape, w.shape, _DN2),
        feature_group_count=groups,
    )
    return _bias(y, b, 2)


def conv_transpose1d(x: jnp.ndarray, w: jnp.ndarray,
                     b: jnp.ndarray | None = None, stride: int = 1,
                     padding: int = 0) -> jnp.ndarray:
    """PyTorch ConvTranspose1d. x: (B, C, T), w: (I, O, K).

    out_len = (T - 1) * stride + K - 2 * padding. Implemented as an
    input-dilated conv with the spatially-flipped, (I,O)-swapped kernel.
    """
    k = w.shape[-1]
    w2 = jnp.flip(w, -1).swapaxes(0, 1)  # (O, I, K)
    y = lax.conv_general_dilated(
        x, w2.astype(x.dtype),
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=lax.conv_dimension_numbers(x.shape, w2.shape, _DN1),
    )
    return _bias(y, b, 1)


def conv_transpose2d(x: jnp.ndarray, w: jnp.ndarray,
                     b: jnp.ndarray | None = None, stride=(1, 1),
                     padding=(0, 0)) -> jnp.ndarray:
    """PyTorch ConvTranspose2d. x: (B, C, H, W), w: (I, O, KH, KW)."""
    kh, kw = w.shape[-2:]
    w2 = jnp.flip(w, (-2, -1)).swapaxes(0, 1)  # (O, I, KH, KW)
    y = lax.conv_general_dilated(
        x, w2.astype(x.dtype),
        window_strides=(1, 1),
        padding=[(kh - 1 - padding[0], kh - 1 - padding[0]),
                 (kw - 1 - padding[1], kw - 1 - padding[1])],
        lhs_dilation=tuple(stride),
        dimension_numbers=lax.conv_dimension_numbers(x.shape, w2.shape, _DN2),
    )
    return _bias(y, b, 2)
