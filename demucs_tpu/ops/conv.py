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

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DN1 = ("NCH", "OIH", "NCH")
_DN2 = ("NCHW", "OIHW", "NCHW")

# Hand-written conv VJP gates (r5): autodiff of the shifted-slice
# einsum lowerings transposes each tap's slice into pad+scatter-add
# chains and lets XLA pick cotangent layouts — the ~13 ms conv-backward
# copy bucket in the r4 train profile (docs/PROFILE_r4.md §11). The
# hand VJPs below express dx as the same slice-einsum family
# (correlation with channel-transposed, tap-flipped weights: ONE pad of
# the cotangent, K in-place slice reads) and dw as K tap GEMMs, so the
# backward inherits the forward's e2e-adjudicated layouts.
# r5 on-chip e2e A/B (batch 2 / remat off / bf16, baseline 258.8 and
# 258.5 audio-s/s same window — docs/PROFILE_r5.md): only the phase
# conv_tr VJP won (264.3, +2.1%) and is ON by default. The rest are
# adjudicated negatives kept for re-testing if the graph shifts:
# TAP 258.8 (exactly neutral), CHUNK 255.4 (-1.3%), FMAJOR 234.5
# (-9.4% — XLA's transpose of the F-major slice einsums already picks
# better layouts than the hand correlation), FCONVTR 254.0 (-1.9%),
# all five ON 262.9 (the losers eat most of the conv_tr win).
TAP_BWD = os.environ.get("DT_TAP_BWD", "0") == "1"
CHUNK_BWD = os.environ.get("DT_CHUNK_BWD", "0") == "1"
CONVTR_BWD = os.environ.get("DT_CONVTR_BWD", "1") == "1"
FMAJOR_BWD = os.environ.get("DT_FMAJOR_BWD", "0") == "1"
FCONVTR_BWD = os.environ.get("DT_FCONVTR_BWD", "0") == "1"


def _bias(y: jnp.ndarray, b: jnp.ndarray | None, spatial: int) -> jnp.ndarray:
    if b is None:
        return y
    return y + b.reshape((1, -1) + (1,) * spatial)


def _chunked_strided_conv(x: jnp.ndarray, w: jnp.ndarray, stride: int,
                          padding: int) -> jnp.ndarray:
    """Strided conv with stride | K as one einsum (last axis of x).

    x: (..., C, L), w: (O, C, K). Each output position reads r = K/stride
    consecutive stride-chunks, so after padding and a chunk reshape the
    conv is a plain GEMM over C*K features — XLA's conv emitter is ~10x
    off the byte roofline for the small-C_in strided front-end convs
    (measured 3.3 ms vs 0.3 ms at the htdemucs level-0 shape).
    """
    O, C, K = w.shape
    r = K // stride
    L = x.shape[-1]
    lp = L + 2 * padding
    n_out = (lp - K) // stride + 1
    chunks = -(-lp // stride)
    pad_extra = chunks * stride - lp
    pads = [(0, 0)] * (x.ndim - 1) + [(padding, padding + pad_extra)]
    xp = jnp.pad(x, pads)
    xr = xp.reshape(xp.shape[:-1] + (chunks, stride))      # (..., C, ch, s)
    # sum of r chunk-tap GEMMs on free views of xr — concatenating the
    # taps into one (..., C, out, K) operand makes XLA materialize a
    # relayout copy of the whole activation before the GEMM
    y = None
    for j in range(r):
        xs = jax.lax.slice_in_dim(xr, j, j + n_out, axis=xr.ndim - 2)
        wj = w[:, :, j * stride:(j + 1) * stride]          # (O, C, s)
        t = jnp.einsum("...cos,xcs->...xo", xs, wj.astype(x.dtype))
        y = t if y is None else y + t
    return y                                               # (..., O, out)


def _tap_conv(x: jnp.ndarray, w: jnp.ndarray, padding: int,
              dilation: int) -> jnp.ndarray:
    """Small-K stride-1 conv as K shifted-slice einsums (last axis of x).

    x: (..., C, T), w: (O, C, K). Each tap is a plain GEMM over C; XLA
    fuses the K adds. Beats the conv emitter 2.25x on the long
    time-branch DConv chains (8.5 -> 3.8 ms at B=8, C=48, T=85995) and
    turns every 1x1 rewrite into a single einsum.
    """
    O, C, K = w.shape
    T = x.shape[-1]
    if padding:
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(padding, padding)])
    else:
        xp = x
    t_out = T + 2 * padding - dilation * (K - 1)
    y = None
    for j in range(K):
        xs = lax.slice_in_dim(xp, j * dilation, j * dilation + t_out,
                              axis=x.ndim - 1)
        t = jnp.einsum("...ct,xc->...xt", xs, w[:, :, j].astype(x.dtype))
        y = t if y is None else y + t
    return y


def _tap_conv_hand(x, w, padding: int, dilation: int):
    """_tap_conv with a hand-written VJP (3D x only): dx is the K-tap
    shifted-slice correlation with the channel-transposed, tap-flipped
    kernel (itself a _tap_conv — one pad of g, K slice reads), dw is K
    tap GEMMs contracting (batch, time). Autodiff instead scatter-adds
    each tap's slice cotangent through pad chains in XLA-chosen layouts
    (the r4 conv-bwd copy bucket)."""

    @jax.custom_vjp
    def run(x, w):
        return _tap_conv(x, w, padding, dilation)

    def fwd(x, w):
        return _tap_conv(x, w, padding, dilation), (x, w)

    def bwd(res, g):
        x, w = res
        O, C, K = w.shape
        d = dilation
        T = x.shape[-1]
        t_out = T + 2 * padding - d * (K - 1)
        wt = jnp.transpose(w, (1, 0, 2))[:, :, ::-1]       # (C, O, K)
        dxf = _tap_conv(g, wt, d * (K - 1), d)             # (..., C, T+2p)
        dx = dxf[..., padding:padding + T] if padding else dxf
        xp = (jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(padding, padding)])
              if padding else x)
        taps = []
        for j in range(K):
            xs = lax.slice_in_dim(xp, j * d, j * d + t_out, axis=x.ndim - 1)
            taps.append(jnp.einsum("bct,bxt->xc", xs, g,
                                   preferred_element_type=jnp.float32))
        dw = jnp.stack(taps, axis=-1).astype(w.dtype)
        return dx.astype(x.dtype), dw

    run.defvjp(fwd, bwd)
    return run(x, w)


def _chunked_strided_conv_hand(x, w, stride: int, padding: int):
    """_chunked_strided_conv with a hand-written VJP (3D x only): dx is
    an r-tap shifted-slice einsum on the CHUNK axis of the padded
    cotangent (the transposed conv of a stride|K conv is itself a
    chunked form), dw is r tap GEMMs."""

    @jax.custom_vjp
    def run(x, w):
        return _chunked_strided_conv(x, w, stride, padding)

    def fwd(x, w):
        return _chunked_strided_conv(x, w, stride, padding), (x, w)

    def bwd(res, g):
        x, w = res
        O, C, K = w.shape
        s = stride
        r = K // s
        L = x.shape[-1]
        lp = L + 2 * padding
        n_out = (lp - K) // s + 1
        chunks = -(-lp // s)
        pad_extra = chunks * s - lp
        wr = w.reshape(O, C, r, s)
        # dxr[b, c, m, p] = sum_j g[b, o, m - j] * w[o, c, j*s + p]
        gp = jnp.pad(g, [(0, 0)] * (g.ndim - 1)
                     + [(r - 1, chunks - n_out)])
        y = None
        for jj in range(r):
            gs = lax.slice_in_dim(gp, jj, jj + chunks, axis=g.ndim - 1)
            wj = wr[:, :, r - 1 - jj, :]                   # (O, C, s)
            t = jnp.einsum("bom,ocp->bcmp", gs, wj.astype(g.dtype))
            y = t if y is None else y + t
        dxp = y.reshape(*y.shape[:-2], chunks * s)
        dx = dxp[..., padding:padding + L]
        # dw[o, c, j*s + p] = sum_{b, m} xr[b, c, m + j, p] g[b, o, m]
        pads = [(0, 0)] * (x.ndim - 1) + [(padding, padding + pad_extra)]
        xr = jnp.pad(x, pads).reshape(*x.shape[:-1], chunks, s)
        parts = []
        for j in range(r):
            xs = lax.slice_in_dim(xr, j, j + n_out, axis=xr.ndim - 2)
            parts.append(jnp.einsum("bcmp,bom->ocp", xs, g,
                                    preferred_element_type=jnp.float32))
        dw = jnp.concatenate(parts, axis=-1).astype(w.dtype)
        return dx.astype(x.dtype), dw

    run.defvjp(fwd, bwd)
    return run(x, w)


def conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None,
           stride: int = 1, padding: int = 0, dilation: int = 1,
           groups: int = 1) -> jnp.ndarray:
    """x: (B, C, T), w: (O, I/groups, K) -> (B, O, T')."""
    k = w.shape[-1]
    if stride == 1 and groups == 1 and k <= 3:
        # Shape-dependent split (docs/dconv_k3_micro.py): on big folded
        # batches (freq `(b f) c t`, 4096 rows) the conv emitter reads
        # the activation once and wins 3x; on the long thin time chains
        # (B=8, T up to 86k) the K shifted-slice GEMMs win ~2x.
        if k > 1 and x.shape[0] >= 64:
            y = lax.conv_general_dilated(
                x, w.astype(x.dtype), (stride,), [(padding, padding)],
                rhs_dilation=(dilation,),
                dimension_numbers=lax.conv_dimension_numbers(
                    x.shape, w.shape, _DN1))
            return _bias(y, b, 1)
        if TAP_BWD and k > 1 and x.ndim == 3:
            return _bias(_tap_conv_hand(x, w, padding, dilation), b, 1)
        return _bias(_tap_conv(x, w, padding, dilation), b, 1)
    if (stride > 1 and k % stride == 0 and dilation == 1 and groups == 1):
        if CHUNK_BWD and x.ndim == 3:
            return _bias(_chunked_strided_conv_hand(x, w, stride, padding),
                         b, 1)
        return _bias(_chunked_strided_conv(x, w, stride, padding), b, 1)
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
    kh, kw = w.shape[-2:]
    if (stride[0] > 1 and kh % stride[0] == 0 and kw == 1 and stride[1] == 1
            and dilation == (1, 1) and groups == 1 and padding[1] == 0):
        # strided (KH, 1) freq conv -> chunked einsum on the H axis
        # (see _chunked_strided_conv; same trick, H kept in place)
        s = stride[0]
        r = kh // s
        B, C, H, W = x.shape
        lp = H + 2 * padding[0]
        n_out = (lp - kh) // s + 1
        chunks = -(-lp // s)
        xp = jnp.pad(x, [(0, 0), (0, 0),
                         (padding[0], padding[0] + chunks * s - lp), (0, 0)])
        xr = xp.reshape(B, C, chunks, s, W)
        y = None
        for j in range(r):                 # tap-sum: see _chunked_strided_conv
            xs = jax.lax.slice_in_dim(xr, j, j + n_out, axis=2)
            wj = w[:, :, j * s:(j + 1) * s, 0]           # (O, C, s)
            t = jnp.einsum("bcopw,xcp->bxow", xs, wj.astype(x.dtype))
            y = t if y is None else y + t
        return _bias(y, b, 2)
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=tuple(stride),
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=tuple(dilation),
        dimension_numbers=lax.conv_dimension_numbers(x.shape, w.shape, _DN2),
        feature_group_count=groups,
    )
    return _bias(y, b, 2)


# --- frequency-major (B, F, C, T) helpers ----------------------------------
#
# The htdemucs frequency branch flows in (B, F, C, T) layout so the
# per-frequency DConv fold `(b f) c t` is a pure reshape (the reference
# keeps (C, F, T) and its torch original rearranges every block,
# src/encdec.cpp:8-80). All frequency-axis convs become shifted-slice
# einsums over the MAJOR F axis; the minor (C, T) block layout never
# changes, so XLA inserts no tiled transposes (measured ~1 ms per
# fold/unfold copy at the level-0 shape in the channel-major design).


# The stride/phase axis is contracted INSIDE the chunk einsum. The
# split-per-phase alternative (r*s separate GEMMs on in-place slice
# views, targeting copy.610's ~1.0 ms pre-GEMM relayout) measured
# NEGATIVE e2e on chip: 710.9 vs 724.8 audio-s/s (round 3 A/B) — the
# r*s small contractions cost more than the relayout they avoid.
def _freq_conv_fmajor_body(x, w, stride: int, padding: int):
    O, I, kh, kw = w.shape
    assert kw == 1 and kh % stride == 0
    r = kh // stride
    B, F, C, T = x.shape
    lp = F + 2 * padding
    n_out = (lp - kh) // stride + 1
    chunks = -(-lp // stride)
    xp = jnp.pad(x, [(0, 0), (padding, padding + chunks * stride - lp),
                     (0, 0), (0, 0)])
    xr = xp.reshape(B, chunks, stride, C, T)
    y = None
    for j in range(r):                     # tap-sum: see _chunked_strided_conv
        xs = jax.lax.slice_in_dim(xr, j, j + n_out, axis=1)
        wj = w[:, :, j * stride:(j + 1) * stride, 0]     # (O, I, s)
        t = jnp.einsum("bopct,xcp->boxt", xs, wj.astype(x.dtype))
        y = t if y is None else y + t
    return y


def _freq_conv_fmajor_hand(x, w, stride: int, padding: int):
    """freq_conv_fmajor with a hand-written VJP: same r-tap
    shifted-slice structure on the MAJOR F axis for dx (one pad of g,
    r slice reads; the minor (C, T) layout never moves), r tap GEMMs
    for dw."""

    @jax.custom_vjp
    def run(x, w):
        return _freq_conv_fmajor_body(x, w, stride, padding)

    def fwd(x, w):
        return _freq_conv_fmajor_body(x, w, stride, padding), (x, w)

    def bwd(res, g):
        x, w = res
        O, I, kh, _ = w.shape
        s = stride
        r = kh // s
        B, F, C, T = x.shape
        lp = F + 2 * padding
        n_out = (lp - kh) // s + 1
        chunks = -(-lp // s)
        pad_extra = chunks * s - lp
        wr = w[:, :, :, 0].reshape(O, I, r, s)
        # dxr[b, m, p, c, t] = sum_j g[b, m - j, o, t] wr[o, c, j, p]
        gp = jnp.pad(g, [(0, 0), (r - 1, chunks - n_out), (0, 0), (0, 0)])
        y = None
        for jj in range(r):
            gs = lax.slice_in_dim(gp, jj, jj + chunks, axis=1)
            wj = wr[:, :, r - 1 - jj, :]                 # (O, I, s)
            t = jnp.einsum("bmxt,xcp->bmpct", gs, wj.astype(g.dtype))
            y = t if y is None else y + t
        dxp = y.reshape(B, chunks * s, C, T)
        dx = dxp[:, padding:padding + F]
        # dwr[x, c, j, p] = sum_{b,m,t} xr[b, m + j, p, c, t] g[b, m, x, t]
        xp = jnp.pad(x, [(0, 0), (padding, padding + pad_extra),
                         (0, 0), (0, 0)])
        xr = xp.reshape(B, chunks, s, C, T)
        parts = []
        for j in range(r):
            xs = lax.slice_in_dim(xr, j, j + n_out, axis=1)
            parts.append(jnp.einsum("bmpct,bmxt->xcp", xs, g,
                                    preferred_element_type=jnp.float32))
        dw = jnp.concatenate(parts, axis=-1)[..., None].astype(w.dtype)
        return dx.astype(x.dtype), dw

    run.defvjp(fwd, bwd)
    return run(x, w)


def freq_conv_fmajor(x: jnp.ndarray, w: jnp.ndarray,
                     b: jnp.ndarray | None = None, stride: int = 4,
                     padding: int = 2) -> jnp.ndarray:
    """Strided (KH, 1) freq conv on (B, F, C, T); w: (O, I, KH, 1).

    Same math as conv2d's chunked-einsum fast path, with the chunking
    on the major F axis (stride must divide KH).
    """
    if FMAJOR_BWD:
        y = _freq_conv_fmajor_hand(x, w, stride, padding)
    else:
        y = _freq_conv_fmajor_body(x, w, stride, padding)
    return y if b is None else y + b.reshape(1, 1, -1, 1)


def freq_conv1x1_fmajor(x: jnp.ndarray, w: jnp.ndarray,
                        b: jnp.ndarray | None = None) -> jnp.ndarray:
    """1x1 conv on (B, F, C, T); w: (O, I, 1, 1) or (O, I)."""
    w2 = w.reshape(w.shape[0], w.shape[1])
    y = jnp.einsum("bfct,xc->bfxt", x, w2.astype(x.dtype))
    return y if b is None else y + b.reshape(1, 1, -1, 1)


def freq_conv3x3_fmajor(x: jnp.ndarray, w: jnp.ndarray,
                        b: jnp.ndarray | None = None) -> jnp.ndarray:
    """3x3 conv, padding (1, 1), on (B, F, C, T); w: (O, I, 3, 3).

    One conv_general_dilated with F-major dimension numbers (batch=B,
    feature=C in place, spatial=(F, T)). Two alternatives measured
    SLOWER and were removed: the 9-tap shifted-slice einsum re-reads
    the activation per tap inside XLA's fusions, 5.3x slower isolated
    at the level-3 decoder shape (docs/conv3x3_micro.py); the
    per-F-tap folded K=3 conv trio (targeting the ~2 ms of boundary
    copies around this conv) was 711.4 vs 724.8 audio-s/s e2e in the
    round-3 chip A/B — the three folded convs re-read the (B*F, C, T)
    fold and pay their own shifted-add pads."""
    dn = lax.ConvDimensionNumbers((0, 2, 1, 3), (0, 1, 2, 3), (0, 2, 1, 3))
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=dn)
    return y if b is None else y + b.reshape(1, 1, -1, 1)


def _freq_convtr_fmajor_body(x, w, stride: int, padding: int):
    I, O, kh, kw = w.shape
    assert kw == 1 and kh % stride == 0
    r = kh // stride
    B, F, C, T = x.shape
    # phase p, tap j uses w[:, :, j*stride + p] flipped across taps:
    # out[f*s + p] = sum_j x[f + j - (r-1)] @ w[.., (r-1-j)*s + p]
    wp = w[:, :, :, 0].reshape(I, O, r, stride)      # (I, O, j, p)
    wp = wp[:, :, ::-1, :]                           # flip taps
    xp = jnp.pad(x, [(0, 0), (r - 1, r - 1), (0, 0), (0, 0)])
    n_out = F + r - 1
    y = None
    for j in range(r):                     # tap-sum: see _chunked_strided_conv
        xs = jax.lax.slice_in_dim(xp, j, j + n_out, axis=1)
        t = jnp.einsum("bfct,cop->bfpot", xs, wp[:, :, j, :].astype(x.dtype))
        y = t if y is None else y + t
    raw = (F - 1) * stride + kh
    y = y.reshape(B, n_out * stride, O, T)[:, :raw]
    if padding:
        y = y[:, padding:raw - padding]
    return y


def _freq_convtr_fmajor_hand(x, w, stride: int, padding: int):
    """freq_convtr_fmajor with a hand-written VJP: dx is r tap
    slice-einsums of the phase-folded cotangent (all MAJOR-axis moves —
    the minor (O/C, T) layout never changes), dw r tap GEMMs."""

    @jax.custom_vjp
    def run(x, w):
        return _freq_convtr_fmajor_body(x, w, stride, padding)

    def fwd(x, w):
        return _freq_convtr_fmajor_body(x, w, stride, padding), (x, w)

    def bwd(res, g):
        x, w = res
        I, O, kh, _ = w.shape
        s = stride
        r = kh // s
        B, F, C, T = x.shape
        n_out = F + r - 1
        raw = (F - 1) * s + kh
        wp = w[:, :, :, 0].reshape(I, O, r, s)[:, :, ::-1, :]
        # un-slice + un-reshape the cotangent back to phase-major:
        # g (B, raw - 2p, O, T) -> g3 (B, n_out, s, O, T)
        g2 = jnp.pad(g, [(0, 0), (padding, n_out * s - raw + padding),
                         (0, 0), (0, 0)])
        g3 = g2.reshape(B, n_out, s, O, T)
        # dx[b, f] = sum_j g3[b, f + (r-1) - j] . wp[:, :, j] — indices
        # always in range, no extra pad needed
        dx = None
        for j in range(r):
            gs = lax.slice_in_dim(g3, r - 1 - j, r - 1 - j + F, axis=1)
            t = jnp.einsum("bmpot,cop->bmct", gs,
                           wp[:, :, j, :].astype(g.dtype))
            dx = t if dx is None else dx + t
        # dwp[c, o, j, p] = sum_{b,m,t} xp[b, m + j, c, t] g3[b, m, p, o, t]
        xp = jnp.pad(x, [(0, 0), (r - 1, r - 1), (0, 0), (0, 0)])
        parts = []
        for j in range(r):
            xs = lax.slice_in_dim(xp, j, j + n_out, axis=1)
            parts.append(jnp.einsum("bmct,bmpot->cop", xs, g3,
                                    preferred_element_type=jnp.float32))
        dwp = jnp.stack(parts, axis=2)                 # (I, O, r, s)
        dw = dwp[:, :, ::-1, :].reshape(I, O, kh)[..., None].astype(w.dtype)
        return dx.astype(x.dtype), dw

    run.defvjp(fwd, bwd)
    return run(x, w)


def freq_convtr_fmajor(x: jnp.ndarray, w: jnp.ndarray,
                       b: jnp.ndarray | None = None, stride: int = 4,
                       padding: int = 0) -> jnp.ndarray:
    """(KH, 1) transposed conv on (B, F, C, T); w: (I, O, KH, 1).

    Phase decomposition along F: the per-phase einsum produces
    (B, F', O, s, T) and the interleave reshapes MAJOR axes only, so
    the minor (T) layout survives untouched (the channel-major
    interleave costs ~1-2 ms in tiled copies per decoder layer).
    """
    if FCONVTR_BWD:
        y = _freq_convtr_fmajor_hand(x, w, stride, padding)
    else:
        y = _freq_convtr_fmajor_body(x, w, stride, padding)
    return y if b is None else y + b.reshape(1, 1, -1, 1)


def _phase_weights(w: jnp.ndarray, stride: int) -> jnp.ndarray:
    """(I, O, K) torch-transposed kernel -> (O*stride, I, K//stride)
    phase-decomposed forward-conv kernel (flipped taps)."""
    i_ch, o_ch, k = w.shape
    r = k // stride
    wp = w.reshape(i_ch, o_ch, r, stride)          # w[..., s*d + p]
    wp = jnp.transpose(wp, (1, 3, 0, 2)).reshape(o_ch * stride, i_ch, r)
    return jnp.flip(wp, -1)


def _interleave_phases(y: jnp.ndarray, o_ch: int, stride: int,
                       out_len: int, axis_len: int) -> jnp.ndarray:
    """(B, O*stride, Q, ...) -> (B, O, stride*Q, ...)[:out_len] on dim 2."""
    B = y.shape[0]
    rest = y.shape[3:]
    y = y.reshape(B, o_ch, stride, axis_len, *rest)
    y = jnp.swapaxes(y, 2, 3)                      # (B, O, Q, stride, ...)
    y = y.reshape(B, o_ch, stride * axis_len, *rest)
    return y[:, :, :out_len]


_BLOCKED_U = 128  # one lane-tile of contiguous output samples per GEMM row


@functools.lru_cache(maxsize=None)
def _tapsel_tensor(k: int, stride: int, trim: int, d_len: int,
                   u_len: int) -> np.ndarray:
    """0/1 selector T2[k, d, u]: output sample u of a U-sample block
    reads input column d with kernel tap k (see conv_transpose1d_blocked)."""
    r = k // stride
    t2 = np.zeros((k, d_len, u_len), np.float32)
    for u in range(u_len):
        n = u + trim
        for j in range(r):
            d = n // stride - j + (r - 1)
            if 0 <= d < d_len:
                t2[n % stride + stride * j, d, u] = 1.0
    return t2


def conv_transpose1d_blocked(x: jnp.ndarray, w: jnp.ndarray,
                             b: jnp.ndarray | None, stride: int,
                             trim: int, out_len: int) -> jnp.ndarray:
    """Fused ConvTranspose1d + [trim : trim+out_len] slice, emitted
    directly in interleaved output order.

    The phase-decomposed path's interleave writes a size-`stride` minor
    axis, which the TPU tiles at (8,128) — a ~4 ms relayout at the last
    tdecoder shape (B=8, O=8, L=344k). Here each 128-sample output block
    is one GEMM row against a (C*D, O*128) matrix built by folding a 0/1
    tap selector into the weights, so the output is written t-contiguous
    at byte floor. The selector is r*stride-sparse, i.e. the dense GEMM
    wastes ~(D*stride/K)x FLOPs — a good trade only at small C*O (the
    epilogue layers); callers gate on that.

    x: (B, C, Q), w: (C, O, K) torch ConvTranspose layout. stride must
    divide K and 128; trim < stride covers every Demucs trim (2 at s=4).
    """
    C, O, K = w.shape
    r = K // stride
    B, _, Q = x.shape
    U = _BLOCKED_U
    qs = U // stride                   # input columns consumed per block
    M = -(-out_len // U)
    D = qs + r
    # input column d of block m is x[qs*m + d - (r-1)]; with a left pad
    # of r-1 that is xp[qs*m + d], and columns d >= qs of block m are
    # columns d - qs of block m+1 — so one (M+1)-block reshape provides
    # every window with no strided slicing.
    need = qs * (M + 1)
    xp = jnp.pad(x, [(0, 0), (0, 0), (r - 1, max(0, need - Q - (r - 1)))])
    base2 = xp[:, :, :need].reshape(B, C, M + 1, qs)
    xb = jnp.concatenate([base2[:, :, :M], base2[:, :, 1:, :r]], axis=-1)
    t2 = _tapsel_tensor(K, stride, trim, D, U)
    w2 = jnp.einsum("cok,kdu->cdou", w.astype(x.dtype),
                    jnp.asarray(t2, x.dtype))        # (C, D, O, U)
    y = jnp.einsum("bcmd,cdou->bomu", xb, w2)        # (B, O, M, U)
    y = y.reshape(B, O, M * U)[:, :, :out_len]
    return _bias(y, b, 1)


def _convtr_phase_fwd(x, w, stride: int, padding: int):
    """Phase-decomposed ConvTranspose1d body (stride | K)."""
    k = w.shape[-1]
    T = x.shape[-1]
    r = k // stride
    wp = _phase_weights(w, stride).astype(x.dtype)
    y = lax.conv_general_dilated(
        x, wp, (1,), [(r - 1, r - 1)],
        dimension_numbers=lax.conv_dimension_numbers(
            x.shape, wp.shape, _DN1))           # (B, O*s, T+r-1)
    o_ch = w.shape[1]
    raw = (T - 1) * stride + k
    y = _interleave_phases(y, o_ch, stride, raw, T + r - 1)
    return y[:, :, padding:raw - padding]


def _convtr_phase_hand(x, w, stride: int, padding: int):
    """Phase ConvTranspose1d with a hand-written VJP: dx is the
    stride-chunked conv of the cotangent with the SAME kernel viewed as
    a forward conv weight (the transpose of a conv_tr IS a strided
    conv — routed through the adjudicated _chunked_strided_conv form),
    dw is r*stride tap GEMMs on chunk views of the cotangent. Autodiff
    instead transposes the interleave reshape (a size-`stride` minor
    axis relayout) and the phase conv separately."""

    @jax.custom_vjp
    def run(x, w):
        return _convtr_phase_fwd(x, w, stride, padding)

    def fwd(x, w):
        return _convtr_phase_fwd(x, w, stride, padding), (x, w)

    def bwd(res, g):
        x, w = res
        I, O, K = w.shape
        s = stride
        r = K // s
        Q = x.shape[-1]
        # dx[c, q] = sum_{o,k} g[o, q*s + k - p] w[c, o, k]: exactly a
        # stride-s conv of g with w as an (out=I, in=O, K) conv weight
        dx = _chunked_strided_conv(g, w, s, padding)
        # dw[c, o, j*s + ph] = sum_{b,q} x[b, c, q] gr[b, o, q + j, ph]
        gp = jnp.pad(g, [(0, 0)] * (g.ndim - 1) + [(padding, padding)])
        gr = gp.reshape(*gp.shape[:-1], Q + r - 1, s)
        parts = []
        for j in range(r):
            gs = lax.slice_in_dim(gr, j, j + Q, axis=gr.ndim - 2)
            parts.append(jnp.einsum("bcq,boqp->cop", x, gs,
                                    preferred_element_type=jnp.float32))
        dw = jnp.concatenate(parts, axis=-1).astype(w.dtype)
        return dx.astype(x.dtype), dw

    run.defvjp(fwd, bwd)
    return run(x, w)


def conv_transpose1d(x: jnp.ndarray, w: jnp.ndarray,
                     b: jnp.ndarray | None = None, stride: int = 1,
                     padding: int = 0) -> jnp.ndarray:
    """PyTorch ConvTranspose1d. x: (B, C, T), w: (I, O, K).

    out_len = (T - 1) * stride + K - 2 * padding. When stride divides K
    (every Demucs case: K=8/s=4, K=4/s=2) the transposed conv runs as a
    phase-decomposed regular conv + interleave — ~2.7x faster on TPU
    than XLA's lhs_dilation lowering (measured on the decoder-3 shape).
    Falls back to the input-dilated form otherwise.
    """
    k = w.shape[-1]
    T = x.shape[-1]
    if stride > 1 and k % stride == 0:
        if CONVTR_BWD:
            return _bias(_convtr_phase_hand(x, w, stride, padding), b, 1)
        return _bias(_convtr_phase_fwd(x, w, stride, padding), b, 1)
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
    """PyTorch ConvTranspose2d. x: (B, C, H, W), w: (I, O, KH, KW).

    Demucs only up-samples the H (frequency) axis — (KH, 1) kernels with
    stride (s, 1). That case takes the phase-decomposition fast path
    (see conv_transpose1d); anything else uses lhs_dilation.
    """
    kh, kw = w.shape[-2:]
    sh, sw = stride
    if sh > 1 and kh % sh == 0 and kw == 1 and sw == 1 and padding[1] == 0:
        H = x.shape[2]
        r = kh // sh
        wp = _phase_weights(w[:, :, :, 0], sh)[:, :, :, None].astype(x.dtype)
        y = lax.conv_general_dilated(
            x, wp, (1, 1), [(r - 1, r - 1), (0, 0)],
            dimension_numbers=lax.conv_dimension_numbers(
                x.shape, wp.shape, _DN2))           # (B, O*s, H+r-1, W)
        o_ch = w.shape[1]
        raw = (H - 1) * sh + kh
        y = _interleave_phases(y, o_ch, sh, raw, H + r - 1)
        y = y[:, :, padding[0]:raw - padding[0]]
        return _bias(y, b, 2)
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
