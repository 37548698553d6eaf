"""STFT / ISTFT with the exact conventions the Demucs family expects.

Reproduces the reference DSP layer (reference src/dsp.{hpp,cpp}) and the
PyTorch `torch.stft/istft(normalized=True, center=True)` semantics it
mirrors:

  * periodic Hann window of FFT_WINDOW_SIZE=4096 (src/dsp.hpp:59-75)
  * hop 1024, forward scaling 1/sqrt(4096) (src/dsp.cpp:142-147)
  * inverse with window-sumsquare (librosa-style) normalization
    (src/dsp.hpp:77-100, src/dsp.cpp:151-185)
  * the Demucs `_spec`/`_ispec` bookkeeping: reflect pre-pad of
    hop//2*3 samples, frame trim [2:2+le], 2049->2048 bin drop and the
    inverse re-pad (reference src/model_inference.cpp:64-99,432-455).

TPU-first design notes: framing is done with reshape/slice tricks (the
hop divides the window 4x, so frames are a concat of 4 shifted
contiguous views) rather than gathers; everything is batched over a
leading dimension and jit-friendly with static shapes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 44100
FFT_WINDOW_SIZE = 4096
FFT_HOP_SIZE = 1024
_RATIO = FFT_WINDOW_SIZE // FFT_HOP_SIZE  # 4


@functools.lru_cache(maxsize=None)
def hann_window(n: int = FFT_WINDOW_SIZE) -> np.ndarray:
    """Periodic Hann window, identical to torch.hann_window(n, periodic=True)."""
    i = np.arange(n, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / n))).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _window_sumsquare(n_frames: int, n: int = FFT_WINDOW_SIZE,
                      hop: int = FFT_HOP_SIZE) -> np.ndarray:
    """Sum of squared, hop-shifted windows (librosa window_sumsquare)."""
    w2 = hann_window(n).astype(np.float64) ** 2
    total = n + hop * (n_frames - 1)
    out = np.zeros(total, dtype=np.float64)
    for i in range(n_frames):
        out[i * hop:i * hop + n] += w2
    return out.astype(np.float32)


def _frame(x: jnp.ndarray, n: int = FFT_WINDOW_SIZE,
           hop: int = FFT_HOP_SIZE) -> jnp.ndarray:
    """(..., L) -> (..., n_frames, n) sliding frames; L must be a multiple of hop.

    Uses the reshape/shift trick (n == 4*hop): each frame is the
    concatenation of 4 consecutive hop-chunks, so frames = concat of 4
    shifted views of the chunked signal. Pure slices — no gather.
    """
    L = x.shape[-1]
    assert L % hop == 0, f"framed length {L} must be a multiple of hop {hop}"
    ratio = n // hop
    n_chunks = L // hop
    n_frames = n_chunks - (ratio - 1)
    xr = x.reshape(x.shape[:-1] + (n_chunks, hop))
    parts = [
        jax.lax.slice_in_dim(xr, i, i + n_frames, axis=xr.ndim - 2)
        for i in range(ratio)
    ]
    return jnp.concatenate(parts, axis=-1)


def _overlap_add(frames: jnp.ndarray, hop: int = FFT_HOP_SIZE) -> jnp.ndarray:
    """(..., n_frames, n) -> (..., n + hop*(n_frames-1)) overlap-add.

    Inverse of `_frame`: split each frame into 4 hop-chunks and sum the
    4 shifted chunk-sequences. Pure pad/add — no scatter.
    """
    n = frames.shape[-1]
    n_frames = frames.shape[-2]
    ratio = n // hop
    out_chunks = n_frames + ratio - 1
    fr = frames.reshape(frames.shape[:-1] + (ratio, hop))
    out = jnp.zeros(frames.shape[:-2] + (out_chunks, hop), frames.dtype)
    for i in range(ratio):
        pad = [(0, 0)] * (out.ndim - 2) + [(i, out_chunks - n_frames - i), (0, 0)]
        out = out + jnp.pad(fr[..., i, :], pad)
    return out.reshape(out.shape[:-2] + (out_chunks * hop,))


# --- DFT-as-matmul backend -------------------------------------------------
#
# XLA's TPU FFT is slow and HBM-heavy; a dense windowed DFT is ~180 GFLOP
# per benchmark step, which the MXU does in ~1 ms. The Hann window and the
# 1/sqrt(n) normalization are folded into the DFT matrices, so the matmul
# consumes raw frames directly. f32 operands at Precision.HIGH (3-pass
# bf16 on TPU) keep ~1e-6 relative accuracy vs the FFT — far below the
# fp16 weight noise the SDR targets tolerate.
#
# None = auto (matmul on TPU, FFT elsewhere); True/False forces.
USE_MATMUL_DFT: bool | None = None


def _use_matmul() -> bool:
    if USE_MATMUL_DFT is not None:
        return USE_MATMUL_DFT
    return jax.default_backend() == "tpu"


@functools.lru_cache(maxsize=None)
def _dft_fwd_mats(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Windowed forward rDFT: frames(..., n) @ W -> (..., n//2+1) re/im."""
    t = np.arange(n, dtype=np.float64)
    k = np.arange(n // 2 + 1, dtype=np.float64)
    ang = -2.0 * np.pi * np.outer(t, k) / n
    w = hann_window(n).astype(np.float64) / math.sqrt(n)
    return ((np.cos(ang) * w[:, None]).astype(np.float32),
            (np.sin(ang) * w[:, None]).astype(np.float32))


@functools.lru_cache(maxsize=None)
def _dft_inv_mats(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Windowed inverse rDFT incl. the sqrt(n) de-normalization:
    re(..., n//2+1) @ Vr + im @ Vi -> windowed frames (..., n)."""
    t = np.arange(n, dtype=np.float64)
    k = np.arange(n // 2 + 1, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(k, t) / n
    s = np.full(n // 2 + 1, 2.0)
    s[0] = s[-1] = 1.0
    w = hann_window(n).astype(np.float64)
    scale = (s[:, None] / n) * w[None, :] * math.sqrt(n)
    return ((np.cos(ang) * scale).astype(np.float32),
            (-np.sin(ang) * scale).astype(np.float32))


@functools.lru_cache(maxsize=None)
def _dft_inv_conv_kernels(n: int, hop: int, in_bins: int,
                          raw_rows: int | None = None, offset: int = 0
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Inverse-DFT-plus-overlap-add as conv kernels (out=hop, in, k=ratio).

    Output chunk k of the OLA waveform is sum_i frame[k-i] @ V[:, i*hop:
    (i+1)*hop] — a kernel-size-`ratio` convolution along the frame axis
    whose tap j holds block_{ratio-1-j}. The OLA additions happen inside
    the conv's f32 accumulator on the MXU, so the (..., n_frames, n_fft)
    windowed-frame tensor (178 MB at the v4 epilogue shape) is never
    materialized. in_bins < n//2+1 drops top bins whose input would be
    zero-padded anyway (the Demucs 2049th bin).

    raw_rows/offset fold a bin-axis slice [offset : offset+in_bins] into
    the kernel: input row g maps to bin g-offset, rows outside are zero
    — so a producer's un-trimmed bin axis feeds the conv directly.
    """
    vr, vi = _dft_inv_mats(n)
    ratio = n // hop

    def mk(v: np.ndarray) -> np.ndarray:
        blocks = v[:in_bins].reshape(in_bins, ratio, hop)
        k = np.ascontiguousarray(
            np.transpose(blocks[:, ::-1, :], (2, 0, 1)))
        if raw_rows is not None:
            kr = np.zeros((hop, raw_rows, ratio), np.float32)
            kr[:, offset:offset + in_bins] = k
            k = kr
        return k

    return mk(vr), mk(vi)


def _conv_pe32(x: jnp.ndarray, k_np: np.ndarray, dtype, **kw) -> jnp.ndarray:
    """conv_general_dilated with preferred_element_type=f32 that stays
    differentiable with bf16 operands. JAX's conv transpose rule feeds
    the (f32, because of the preferred type) cotangent straight into a
    conv against the bf16 kernel and trips the same-dtype check
    (jax 0.9 lax/convolution.py:545 — dot_general handles this, conv
    does not), which breaks bf16-compute TRAINING through the inverse
    DFT convs. The VJP here evaluates the transposed conv with the
    kernel upcast to f32 — the same linear map (the kernel values are
    the rounded bf16 ones), in f32 math — and casts the input cotangent
    back. k_np is a host-side DFT constant (converted per-trace so no
    tracer escapes the remat scope); no kernel gradient exists."""
    kw = dict(kw, preferred_element_type=jnp.float32)
    shape, dt = x.shape, x.dtype  # static at trace time

    @jax.custom_vjp
    def run(x):
        return jax.lax.conv_general_dilated(x, jnp.asarray(k_np, dtype), **kw)

    def fwd(x):
        return run(x), None

    def bwd(_, ct):
        # transposed conv in the operand dtype (MXU still accumulates
        # f32 internally): on the bf16 fast path the f32 version cost
        # ~2x the bytes AND ran the MXU at half rate (profile_hlo r4:
        # the ispec-bwd fusions were among the top ops); rounding the
        # cotangent to bf16 is the same precision story as the rest of
        # bf16-compute training. The inner conv's OUTPUT dtype matches
        # its operands (no preferred-type upcast), so its own transpose
        # is a legal same-dtype conv.
        kw_b = {k_: v_ for k_, v_ in kw.items()
                if k_ != "preferred_element_type"}
        _, vjp = jax.vjp(
            lambda v: jax.lax.conv_general_dilated(
                v, jnp.asarray(k_np, dtype), **kw_b),
            jnp.zeros(shape, dtype))
        (xbar,) = vjp(ct.astype(dtype))
        return (xbar.astype(dt),)

    run.defvjp(fwd, bwd)
    return run(x)


def _inv_dft_ola_conv(re: jnp.ndarray, im: jnp.ndarray, n_fft: int,
                      hop: int, pad_t: int, fast: bool) -> jnp.ndarray:
    """re/im: (..., F_bins, T) spectra -> (..., hop*(T + 2*pad_t + ratio - 1))
    un-normalized OLA waveform. pad_t extra zero frames each side are
    folded into the conv padding (the Demucs ispec re-pad)."""
    in_bins, T = re.shape[-2:]
    lead = re.shape[:-2]
    B = int(np.prod(lead)) if lead else 1
    ratio = n_fft // hop
    kr, ki = _dft_inv_conv_kernels(n_fft, hop, in_bins)
    dtype = jnp.bfloat16 if fast else jnp.float32

    def conv(x: jnp.ndarray, k: np.ndarray) -> jnp.ndarray:
        return _conv_pe32(
            x.reshape(B, in_bins, T).astype(dtype),
            k, dtype,
            window_strides=(1,),
            padding=[(pad_t + ratio - 1, pad_t + ratio - 1)],
            dimension_numbers=("NCH", "OIH", "NHC"),
            precision=None if fast else jax.lax.Precision.HIGH)

    y = conv(re, kr) + conv(im, ki)        # (B, chunks, hop), f32
    if fast:
        y = y.astype(jnp.bfloat16)
    chunks = y.shape[1]
    return y.reshape(lead + (chunks * hop,))


# --- radix-64 factorized DFT ----------------------------------------------
#
# The dense windowed DFT is O(n^2) per frame; splitting n=4096 into two
# 64-point stages (Cooley-Tukey, t = t1*64 + t2, k = k1*64 + k2) cuts
# the MXU FLOPs ~10x. The Hann window and 1/sqrt(n) fold into the
# stage-1 matrices (per-t2 batch of 64x64 GEMMs), the bin scale into a
# broadcast; twiddles are elementwise and fuse into the matmul
# epilogues. Only the model's F-major path (n=4096, 2048 bins) uses
# this; the generic stft/istft (2049 bins) stay dense.

_RADIX = 64
# separate gates: the factorized forward and inverse win/lose
# independently on hardware (the inverse materializes frame-sized
# intermediates the conv-OLA path avoids). True/False force; None=auto.
USE_RADIX_FWD: bool | None = None
USE_RADIX_INV: bool | None = None
_RADIX_FWD_DEFAULT = True
_RADIX_INV_DEFAULT = False


def _radix_ok(n: int, bins: int, hop: int) -> bool:
    return n == 4096 and bins == 2048 and hop == 1024


def _radix_fwd_on(n: int, bins: int, hop: int) -> bool:
    on = _RADIX_FWD_DEFAULT if USE_RADIX_FWD is None else USE_RADIX_FWD
    return on and _radix_ok(n, bins, hop)


def _radix_inv_on(n: int, bins: int, hop: int) -> bool:
    on = _RADIX_INV_DEFAULT if USE_RADIX_INV is None else USE_RADIX_INV
    return on and _radix_ok(n, bins, hop)


# Parity-folded inverse (see _parity_inv_consts): cos/sin rows repeat
# across the two half-frames up to a (-1)^k sign, so the inverse GEMM
# contracts each bin-parity class over only HALF the frame — half the
# MXU FLOPs of the fused conv-OLA kernel, at the cost of materializing
# the two (.., T, n/2) parity tensors that a 4-tap windowed
# shifted-slice pass then combines. True/False force; None=auto.
USE_PARITY_INV: bool | None = None
_PARITY_INV_DEFAULT = False


def _parity_inv_on(n: int, bins: int, hop: int) -> bool:
    on = _PARITY_INV_DEFAULT if USE_PARITY_INV is None else USE_PARITY_INV
    return on and _radix_ok(n, bins, hop) and not _radix_inv_on(n, bins, hop)


@functools.lru_cache(maxsize=None)
def _parity_inv_consts(n: int, in_bins: int):
    """Unwindowed half-frame inverse rDFT matrices per bin parity.

    U[t, k] = s_k cos/-sin(2*pi*k*t/n)/sqrt(n) for t in [0, n/2) and
    U[t + n/2, k] = (-1)^k U[t, k], so even(odd)-bin contributions to
    the second half-frame equal (negate) the first. Returns
    (Uer, Uei, Uor, Uoi) each (n/2, in_bins/2) and the Hann window."""
    t = np.arange(n // 2, dtype=np.float64)
    s = np.full(in_bins, 2.0)
    s[0] = 1.0  # bins [0, n/2): DC unmirrored, Nyquist already dropped
    mats = []
    for par in (0, 1):
        k = np.arange(par, in_bins, 2, dtype=np.float64)
        ang = 2.0 * np.pi * np.outer(t, k) / n
        sc = (s[par::2] / math.sqrt(n))[None, :]
        mats.append((np.cos(ang) * sc).astype(np.float32))
        mats.append((-np.sin(ang) * sc).astype(np.float32))
    win = hann_window(n).astype(np.float32)
    return mats[0], mats[1], mats[2], mats[3], win


@functools.lru_cache(maxsize=None)
def _radix_fwd_consts(n: int, bins: int):
    r = _RADIX
    m = n // r
    k1n = bins // m
    t1 = np.arange(r)
    t2 = np.arange(m)
    k2 = np.arange(m)
    k1 = np.arange(k1n)
    w = (hann_window(n).astype(np.float64) / math.sqrt(n)).reshape(r, m)
    e1 = np.exp(-2j * np.pi * np.outer(t1, k2) / r)      # (t1, k2)
    e1w = e1[:, None, :] * w[:, :, None]                 # (t1, t2, k2)
    tw = np.exp(-2j * np.pi * np.outer(k2, t2) / n)      # (k2, t2)
    e2 = np.exp(-2j * np.pi * np.outer(t2, k1) / r)      # (t2, k1)
    f32 = lambda a: np.ascontiguousarray(a, np.float32)
    return (f32(e1w.real), f32(e1w.imag), f32(tw.real), f32(tw.imag),
            f32(e2.real), f32(e2.imag))


def _radix_dft_fwd(frames: jnp.ndarray, n: int, bins: int
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Windowed forward rDFT, two 64-point stages. frames (..., n) f32
    -> re/im (..., bins) f32. Matches `frames @ _dft_fwd_mats(n)[:, :bins]`
    to ~1e-6 (stage GEMMs at HIGH precision)."""
    e1r, e1i, twr, twi, e2r, e2i = _radix_fwd_consts(n, bins)
    kw = dict(precision=jax.lax.Precision.HIGH,
              preferred_element_type=jnp.float32)
    x2 = frames.reshape(frames.shape[:-1] + (_RADIX, n // _RADIX))
    ar = jnp.einsum("...xt,xtk->...kt", x2, jnp.asarray(e1r), **kw)
    ai = jnp.einsum("...xt,xtk->...kt", x2, jnp.asarray(e1i), **kw)
    br = ar * twr - ai * twi                             # twiddle (k2, t2)
    bi = ar * twi + ai * twr
    xr = (jnp.einsum("...kt,ty->...yk", br, jnp.asarray(e2r), **kw)
          - jnp.einsum("...kt,ty->...yk", bi, jnp.asarray(e2i), **kw))
    xi = (jnp.einsum("...kt,ty->...yk", br, jnp.asarray(e2i), **kw)
          + jnp.einsum("...kt,ty->...yk", bi, jnp.asarray(e2r), **kw))
    sh = frames.shape[:-1] + (bins,)
    return xr.reshape(sh), xi.reshape(sh)


@functools.lru_cache(maxsize=None)
def _radix_inv_consts(n: int, bins: int):
    r = _RADIX
    m = n // r
    k1n = bins // m
    t1 = np.arange(r)
    t2 = np.arange(m)
    k2 = np.arange(m)
    k1 = np.arange(k1n)
    s = np.full(bins, 2.0)
    s[0] = 1.0
    sc = (s / n * math.sqrt(n)).reshape(k1n, m)          # (k1, k2)
    e1 = np.exp(2j * np.pi * np.outer(k1, t1) / r)       # (k1, t1)
    tw = np.exp(2j * np.pi * np.outer(t1, k2) / n)       # (t1, k2)
    w = hann_window(n).astype(np.float64).reshape(m, r)  # (t2, t1)
    e2 = np.exp(2j * np.pi * np.outer(k2, t2) / r)       # (k2, t2)
    e2w = e2[:, :, None] * w[None, :, :]                 # (k2, t2, t1)
    f32 = lambda a: np.ascontiguousarray(a, np.float32)
    return (f32(sc), f32(e1.real), f32(e1.imag), f32(tw.real), f32(tw.imag),
            f32(e2w.real), f32(e2w.imag))


def _radix_idft_frames(re: jnp.ndarray, im: jnp.ndarray, n: int,
                       fast: bool) -> jnp.ndarray:
    """Inverse of the model spectrum to windowed time frames, two
    64-point stages. re/im: (B, bins, S, T) F-major -> (B, S, T, n) f32
    windowed frames (incl. the sqrt(n) de-normalization and the 2x
    non-DC bin fold). Matches the dense `_dft_inv_mats` path."""
    bins = re.shape[1]
    sc, e1r, e1i, twr, twi, e2wr, e2wi = _radix_inv_consts(n, bins)
    k1n, m = sc.shape
    kw = dict(precision=None if fast else jax.lax.Precision.HIGH,
              preferred_element_type=jnp.float32)
    # CPU's dot thunk can't do bf16 x bf16 = f32; the bf16 operand trick
    # is a TPU-only bandwidth optimization anyway
    dt = (jnp.bfloat16 if fast and jax.default_backend() == "tpu"
          else jnp.float32)

    def split(v):
        v = v.reshape(v.shape[0], k1n, m, *v.shape[2:])  # (B, k1, k2, S, T)
        return (v * sc[None, :, :, None, None]).astype(dt)

    xr, xi = split(re.astype(dt)), split(im.astype(dt))
    # stage 1 (contract k1): P[b, t1, k2, s, t]
    e1rj, e1ij = jnp.asarray(e1r, dt), jnp.asarray(e1i, dt)
    pr = (jnp.einsum("bckst,cx->bxkst", xr, e1rj, **kw)
          - jnp.einsum("bckst,cx->bxkst", xi, e1ij, **kw))
    pi = (jnp.einsum("bckst,cx->bxkst", xr, e1ij, **kw)
          + jnp.einsum("bckst,cx->bxkst", xi, e1rj, **kw))
    # twiddle (t1, k2), broadcast over (b, s, t)
    qr = (pr * twr[None, :, :, None, None]
          - pi * twi[None, :, :, None, None]).astype(dt)
    qi = (pr * twi[None, :, :, None, None]
          + pi * twr[None, :, :, None, None]).astype(dt)
    # stage 2 (contract k2, window folded): y[b, s, t, t2, t1], real part
    y = (jnp.einsum("bxkst,kyx->bstyx", qr, jnp.asarray(e2wr, dt), **kw)
         - jnp.einsum("bxkst,kyx->bstyx", qi, jnp.asarray(e2wi, dt), **kw))
    b, s, t = y.shape[:3]
    return y.reshape(b, s, t, n)


def _matmul(a: jnp.ndarray, b: np.ndarray,
            fast: bool = False) -> jnp.ndarray:
    """f32-accumulated DFT matmul. fast=True runs the operands in bf16
    (single MXU pass, ~0.4% relative error) — only safe when the data is
    already bf16-precision, i.e. the inverse DFT of a bf16 network's
    output; adds ~-48 dB noise, invisible next to ~10 dB separation SDR."""
    if fast:
        return jnp.dot(a.astype(jnp.bfloat16),
                       jnp.asarray(b).astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    # HIGH = 3-pass bf16 on TPU (~1e-6 relative — far below the fp16
    # weight noise the SDR targets tolerate); exact f32 on CPU.
    return jnp.dot(a.astype(jnp.float32), jnp.asarray(b),
                   precision=jax.lax.Precision.HIGH,
                   preferred_element_type=jnp.float32)


def stft(x: jnp.ndarray, n_fft: int = FFT_WINDOW_SIZE,
         hop: int = FFT_HOP_SIZE) -> jnp.ndarray:
    """torch.stft(..., normalized=True, center=True, pad_mode='reflect').

    x: (..., L) real. Returns (..., n_fft//2+1, n_frames) complex64 with
    n_frames = L//hop + 1. L must be a multiple of hop.
    """
    L = x.shape[-1]
    assert L % hop == 0, f"stft input length {L} must be a multiple of hop"
    pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
    xp = jnp.pad(x, pad, mode="reflect")
    frames = _frame(xp, n_fft, hop)
    if _use_matmul():
        wr, wi = _dft_fwd_mats(n_fft)
        spec = jax.lax.complex(_matmul(frames, wr), _matmul(frames, wi))
    else:
        w = jnp.asarray(hann_window(n_fft))
        spec = jnp.fft.rfft(frames * w, n=n_fft, axis=-1)
        spec = spec * (1.0 / math.sqrt(n_fft))
    # (..., n_frames, F) -> (..., F, n_frames)
    return jnp.swapaxes(spec, -1, -2).astype(jnp.complex64)


def _istft_epilogue(y: jnp.ndarray, n_frames: int, length: int,
                    n_fft: int, hop: int) -> jnp.ndarray:
    wss = jnp.asarray(_window_sumsquare(n_frames, n_fft, hop))
    y = y / jnp.maximum(wss, 1e-11)
    # center=True trim
    y = y[..., n_fft // 2: n_fft // 2 + length]
    return y.astype(jnp.float32)


def istft(z: jnp.ndarray, length: int, n_fft: int = FFT_WINDOW_SIZE,
          hop: int = FFT_HOP_SIZE, fast: bool = False) -> jnp.ndarray:
    """torch.istft(..., normalized=True, center=True, length=length).

    z: (..., F, n_frames) complex. Returns (..., length) float32.
    fast=True: bf16 inverse-DFT matmuls (see _matmul).

    hop must divide n_fft (true of every Demucs config; the framing,
    overlap-add and conv-OLA forms all build on hop-aligned chunks).
    """
    assert n_fft % hop == 0, f"istft requires hop | n_fft ({hop}, {n_fft})"
    n_frames = z.shape[-1]
    if _use_matmul():
        y = _inv_dft_ola_conv(jnp.real(z), jnp.imag(z), n_fft, hop,
                              pad_t=0, fast=fast)
    else:
        zt = jnp.swapaxes(z, -1, -2) * math.sqrt(n_fft)  # undo normalized=True
        frames = jnp.fft.irfft(zt, n=n_fft, axis=-1)
        w = jnp.asarray(hann_window(n_fft))
        y = _overlap_add(frames * w, hop)
    return _istft_epilogue(y, n_frames, length, n_fft, hop)


def spec(x: jnp.ndarray, n_fft: int = FFT_WINDOW_SIZE,
         hop: int = FFT_HOP_SIZE) -> jnp.ndarray:
    """Demucs `_spec`: (..., L) -> (..., n_fft//2, ceil(L/hop)) complex.

    Reflect-pads by hop//2*3 on the left and enough on the right that the
    kept frame count equals ceil(L/hop); drops 2 frames on each side and
    the top frequency bin (reference src/model_inference.cpp:64-99).
    """
    L = x.shape[-1]
    le = -(-L // hop)  # ceil
    pad = hop // 2 * 3
    pad_right = pad + le * hop - L
    padw = [(0, 0)] * (x.ndim - 1) + [(pad, pad_right)]
    xp = jnp.pad(x, padw, mode="reflect")
    z = stft(xp, n_fft, hop)  # (..., F=2049, le+4+1)? -> le+4... see below
    # padded length = L + pad + pad_right = (le+3)*hop => frames = le+4
    z = z[..., :-1, 2:2 + le]  # drop last bin, trim 2 frames each side
    return z


def ispec(z: jnp.ndarray, length: int, n_fft: int = FFT_WINDOW_SIZE,
          hop: int = FFT_HOP_SIZE, fast: bool = False) -> jnp.ndarray:
    """Demucs `_ispec`: inverse of `spec`, producing exactly `length` samples.

    Zero-pads the dropped top bin and the 2+2 trimmed frames back, runs
    ISTFT over the padded span and crops the hop//2*3 pre-pad
    (reference src/model_inference.cpp:432-455).
    """
    pad = hop // 2 * 3
    le = hop * (-(-length // hop)) + 2 * pad
    zp = jnp.pad(z, [(0, 0)] * (z.ndim - 2) + [(0, 1), (2, 2)])
    x = istft(zp, le, n_fft, hop, fast)
    return x[..., pad:pad + length]


def ispec_cac(x: jnp.ndarray, length: int, n_fft: int = FFT_WINDOW_SIZE,
              hop: int = FFT_HOP_SIZE, fast: bool = False) -> jnp.ndarray:
    """Fused cac_unpack + ispec on the matmul-DFT path.

    x: (..., 2C, F, T) real CaC ([re0, im0, re1, im1] channel order) —
    goes straight to re/im inverse-DFT matmuls without ever building a
    complex array, skipping three full-size materializations of the
    decoded spectrum. Falls back to cac_unpack+ispec off the matmul path.
    """
    if not _use_matmul():
        return ispec(cac_unpack(x.astype(jnp.float32)), length, n_fft, hop, fast)
    shape = x.shape[:-3] + (x.shape[-3] // 2, 2) + x.shape[-2:]
    xs = x.reshape(shape)                         # (..., C, 2, F, T)
    re, im = xs[..., 0, :, :], xs[..., 1, :, :]   # (..., C, F, T)

    pad = hop // 2 * 3
    le = hop * (-(-length // hop)) + 2 * pad
    # the dropped top bin stays dropped (the conv kernel simply has no
    # rows for it — its input would be zero); the 2+2 trimmed frames are
    # folded into the conv padding
    n_frames = re.shape[-1] + 4
    y = _inv_dft_ola_conv(re, im, n_fft, hop, pad_t=2, fast=fast)
    y = _istft_epilogue(y, n_frames, le, n_fft, hop)
    return y[..., pad:pad + length]


def spec_cac_fmajor(x: jnp.ndarray, n_fft: int = FFT_WINDOW_SIZE,
                    hop: int = FFT_HOP_SIZE,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Fused Demucs `_spec` + CaC pack, frequency-major: (B, C, L) f32
    -> (B, n_fft//2, 2C, ceil(L/hop)) real in `dtype`.

    On the matmul path the frame trim [2:2+le] happens BEFORE the DFT
    (4 frames of compute never done) and the dropped top bin is simply
    absent from the DFT matrix. dtype=bfloat16 halves the spectrum
    write; the matmul operands stay f32 at HIGH precision either way —
    unlike the inverse's fast path, the forward input is clean audio
    whose precision we must not round away before windowing.
    """
    if not _use_matmul():
        return cac_pack_fmajor(spec(x, n_fft, hop)).astype(dtype)
    L = x.shape[-1]
    le = -(-L // hop)
    pad = hop // 2 * 3
    pad_right = pad + le * hop - L
    padw = [(0, 0)] * (x.ndim - 1) + [(pad, pad_right)]
    xp = jnp.pad(x, padw, mode="reflect")
    padw2 = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
    frames = _frame(jnp.pad(xp, padw2, mode="reflect"), n_fft, hop)
    frames = jax.lax.slice_in_dim(frames, 2, 2 + le, axis=-2)  # (B,C,le,n)
    bins = n_fft // 2
    if _radix_fwd_on(n_fft, bins, hop):
        re, im = _radix_dft_fwd(frames, n_fft, bins)
        re, im = re.astype(dtype), im.astype(dtype)    # (B, C, le, F)
    else:
        wr, wi = _dft_fwd_mats(n_fft)
        re = _matmul(frames, wr[:, :bins]).astype(dtype)
        im = _matmul(frames, wi[:, :bins]).astype(dtype)
    re = jnp.transpose(re, (0, 3, 1, 2))               # (B, F, C, le)
    im = jnp.transpose(im, (0, 3, 1, 2))
    stacked = jnp.stack([re, im], axis=3)              # (B, F, C, 2, le)
    B, F, C = stacked.shape[:3]
    return stacked.reshape(B, F, 2 * C, le)


def cac_pack_fmajor(z: jnp.ndarray) -> jnp.ndarray:
    """Complex-as-channels, frequency-major: (B, C, F, T) complex ->
    (B, F, 2C, T) real with channel order [re_c0, im_c0, re_c1, im_c1]
    (reference src/model_inference.cpp:88-99). The htdemucs frequency
    branch flows in this layout (see models/htdemucs.py)."""
    B, C, F, T = z.shape
    re = jnp.real(z)
    im = jnp.imag(z)
    stacked = jnp.stack([re, im], axis=2)            # (B, C, 2, F, T)
    return jnp.transpose(stacked, (0, 3, 1, 2, 4)).reshape(B, F, 2 * C, T)


def ispec_cac_fmajor(x: jnp.ndarray, sources: int, length: int,
                     n_fft: int = FFT_WINDOW_SIZE, hop: int = FFT_HOP_SIZE,
                     fast: bool = False, bin_offset: int = 0) -> jnp.ndarray:
    """Fused un-CaC + ispec for F-major spectra: (B, F, S*2C, T) ->
    (B, S, C, length).

    The inverse-DFT-plus-OLA conv consumes F directly as its feature
    axis (channels ride along as an extra kernel-1 spatial dim), so no
    transpose of the full-size spectrum is ever needed — the conv's
    output (B, S*C, chunks, hop) is sample-contiguous by construction.

    bin_offset > 0 means the bin axis is UNTRIMMED producer output whose
    real bins are rows [bin_offset : bin_offset + n_fft//2] (the Demucs
    decoder's transposed-conv trim, src/encdec.cpp:166-256): the slice
    is folded into the inverse-DFT kernel as zero rows, so the sliced
    spectrum never materializes.
    """
    if not _use_matmul():
        if bin_offset:
            x = jax.lax.slice_in_dim(x, bin_offset, bin_offset + n_fft // 2,
                                     axis=1)
        xs = jnp.swapaxes(x, 1, 2)                   # (B, S*2C, F, T)
        xs = xs.reshape(xs.shape[0], sources, -1, *xs.shape[-2:])
        return ispec(cac_unpack(xs.astype(jnp.float32)), length, n_fft, hop,
                     fast)
    B, F, SC2, T = x.shape
    C = SC2 // sources // 2
    xs = x.reshape(B, F, sources * C, 2, T)
    re, im = xs[..., 0, :], xs[..., 1, :]            # (B, F, S*C, T)

    pad = hop // 2 * 3
    le = hop * (-(-length // hop)) + 2 * pad
    if bin_offset:
        in_bins = n_fft // 2
        if F < bin_offset + in_bins:
            raise ValueError(
                f"bin_offset={bin_offset} needs >= {bin_offset + in_bins} "
                f"untrimmed rows, got {F} — pass the producer's UNTRIMMED "
                "bin axis, not an already-sliced spectrum")
        kr, ki = _dft_inv_conv_kernels(n_fft, hop, in_bins,
                                       raw_rows=F, offset=bin_offset)
        return _ispec_cac_conv(re, im, kr, ki, B, sources, C, T,
                               length, le, pad, n_fft, hop, fast)
    if _radix_inv_on(n_fft, F, hop):
        # factorized inverse: frames materialize once (bf16 on the fast
        # path), OLA is the shifted-chunk add of _overlap_add. The 2+2
        # zero frames of the Demucs re-pad contribute nothing, and with
        # hop = n/4 the center trim exactly cancels their 2-hop offset,
        # so y[...,:le] is the whole OLA output.
        frames = _radix_idft_frames(re, im, n_fft, fast)  # (B,SC,T,n) f32
        if fast:
            frames = frames.astype(jnp.bfloat16)
        y = _overlap_add(frames, hop)                # (B, SC, (T+3)*hop)
        wss = _window_sumsquare(T + 4, n_fft, hop)
        off = 2 * hop                                # dropped zero frames
        y = y / jnp.maximum(jnp.asarray(wss[off:off + y.shape[-1]]), 1e-11)
        y = y[..., :le]  # (T+3)*hop may exceed le when T > ceil(len/hop)
        y = y.astype(jnp.float32).reshape(B, sources, C, le)
        return y[..., pad:pad + length]
    if _parity_inv_on(n_fft, F, hop):
        uer, uei, uor, uoi, win = _parity_inv_consts(n_fft, F)
        dtype = jnp.bfloat16 if fast else jnp.float32
        dnp = jax.lax.ConvDimensionNumbers(
            lhs_spec=(0, 1, 2, 3),   # (batch, feature=F/2, SC, T)
            rhs_spec=(0, 1, 2, 3),   # (out=n/2, in=F/2, 1, 1)
            out_spec=(0, 3, 1, 2))   # (batch, SC, T, n/2)

        def g(v, kmat):
            return _conv_pe32(
                v.astype(dtype), np.asarray(kmat)[:, :, None, None], dtype,
                window_strides=(1, 1), padding=[(0, 0), (0, 0)],
                dimension_numbers=dnp,
                precision=None if fast else jax.lax.Precision.HIGH)

        e = g(re[:, 0::2], uer) + g(im[:, 0::2], uei)
        o = g(re[:, 1::2], uor) + g(im[:, 1::2], uoi)
        if fast:
            e, o = e.astype(jnp.bfloat16), o.astype(jnp.bfloat16)
        ch = T + 7                       # matches the conv-OLA chunk count
        ep = jnp.pad(e, [(0, 0), (0, 0), (5, 5), (0, 0)])
        op = jnp.pad(o, [(0, 0), (0, 0), (5, 5), (0, 0)])
        wb = [jnp.asarray(win[j * hop:(j + 1) * hop], e.dtype)
              for j in range(4)]

        def blk(a, off, lo):
            sl = jax.lax.slice_in_dim(a, off, off + ch, axis=2)
            return sl[..., lo * hop:(lo + 1) * hop]

        # OLA chunk m reads frame m-2-j at half-frame offset j*hop:
        # j=0,1 use e+o (first/second half of the first half-frame pair),
        # j=2,3 use e-o (the (-1)^k fold of the second pair)
        y = (wb[0] * (blk(ep, 3, 0) + blk(op, 3, 0))
             + wb[1] * (blk(ep, 2, 1) + blk(op, 2, 1))
             + wb[2] * (blk(ep, 1, 0) - blk(op, 1, 0))
             + wb[3] * (blk(ep, 0, 1) - blk(op, 0, 1)))
        y = y.reshape(B, sources, C, ch * hop)
        y = _istft_epilogue(y, T + 4, le, n_fft, hop)
        return y[..., pad:pad + length]
    kr, ki = _dft_inv_conv_kernels(n_fft, hop, F)
    return _ispec_cac_conv(re, im, kr, ki, B, sources, C, T,
                           length, le, pad, n_fft, hop, fast)


def _ispec_cac_conv(re, im, kr, ki, B, sources, C, T, length, le, pad,
                    n_fft, hop, fast):
    """Shared conv-OLA tail of ispec_cac_fmajor: re/im (B, F, S*C, T)
    spectra through the inverse-DFT conv kernels to (B, S, C, length)."""
    ratio = n_fft // hop
    dtype = jnp.bfloat16 if fast else jnp.float32
    dn = jax.lax.ConvDimensionNumbers(
        lhs_spec=(0, 1, 2, 3),   # (batch, feature=F, spatial SC, T)
        rhs_spec=(0, 1, 2, 3),   # (out=hop, in=F, 1, ratio)
        out_spec=(0, 3, 1, 2))   # (batch, SC, chunks, feature=hop)

    def conv(v, k):
        return _conv_pe32(
            v.astype(dtype), np.asarray(k)[:, :, None, :], dtype,
            window_strides=(1, 1),
            padding=[(0, 0), (2 + ratio - 1, 2 + ratio - 1)],
            dimension_numbers=dn,
            precision=None if fast else jax.lax.Precision.HIGH)

    y = conv(re, kr) + conv(im, ki)                  # (B, S*C, chunks, hop)
    if fast:
        y = y.astype(jnp.bfloat16)
    chunks = y.shape[2]
    y = y.reshape(B, sources, C, chunks * hop)
    n_frames = T + 4
    y = _istft_epilogue(y, n_frames, le, n_fft, hop)
    return y[..., pad:pad + length]


def cac_pack(z: jnp.ndarray) -> jnp.ndarray:
    """Complex-as-channels: (..., C, F, T) complex -> (..., 2C, F, T) real.

    Channel order [re_c0, im_c0, re_c1, im_c1] per reference
    src/model_inference.cpp:88-99.
    """
    re = jnp.real(z)
    im = jnp.imag(z)
    stacked = jnp.stack([re, im], axis=-3)  # (..., C, 2, F, T)
    shape = z.shape[:-3] + (z.shape[-3] * 2,) + z.shape[-2:]
    return stacked.reshape(shape)


def cac_unpack(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of cac_pack: (..., 2C, F, T) real -> (..., C, F, T) complex."""
    shape = x.shape[:-3] + (x.shape[-3] // 2, 2) + x.shape[-2:]
    xs = x.reshape(shape)
    return jax.lax.complex(xs[..., 0, :, :], xs[..., 1, :, :])
