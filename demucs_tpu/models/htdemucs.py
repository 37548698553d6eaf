"""Demucs v4 Hybrid Transformer (htdemucs 4s/6s) as a pure JAX function.

TPU-first re-design of the reference segment graph
(reference src/model_inference.cpp:48-475, src/encdec.cpp:8-361,
src/crosstransformer.cpp:205-339):

  * explicit leading batch dimension everywhere — the reference's
    per-segment loop becomes one batched call;
  * the frequency branch folds the frequency axis into the batch for
    the time-wise DConv residuals (the torch/demucs `(b f) c t`
    rearrange), keeping every conv a large MXU-friendly batch;
  * length-generic at trace time: all intermediate lengths are derived
    from the input shape, so any segment length works (the reference
    hard-codes 7.8 s, src/model.hpp:19-24).

Weight pytrees follow PyTorch state-dict naming (see params/schema.py).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .. import dsp, ops
from ..config import HTDemucsConfig
from ..utils.progress import report_stage


# Layout flags, adjudicated on-chip round 3 (docs/PROFILE_r3.md): both
# ON by default — each non-negative in every sample, +2.0% combined
# (741.4 vs ~726.5 audio-s/s mean baseline over 3 baseline runs).
# Env DT_FOLD_ISPEC_TRIM=0 / DT_GLU_BIAS_FOLD=0 restore the old path.
# Fold the last freq decoder's [2:2050] bin trim into the inverse-DFT
# kernel (the sliced spectrum never materializes — slice.78 at ~0.6 ms;
# measured alone: 730.3/733.3 vs 724.8/728.3 baseline)
FOLD_ISPEC_TRIM = os.environ.get("DT_FOLD_ISPEC_TRIM", "1") == "1"
# fold the 3x3 rewrite conv's bias into the GLU pass (the bias otherwise
# runs as its own full read+write when a layout copy splits the fusion;
# measured alone: 738.8/735.4/737.0)
GLU_BIAS_FOLD = os.environ.get("DT_GLU_BIAS_FOLD", "1") == "1"

# Store encoder skip tensors as int8 (per-channel dynamic scales,
# dequant fused into the decoder's skip-add). The skips are ~0.74 GB of
# the ~60 GB a batch-8 step moves, so the ceiling is ~0.5% — and the
# dynamic amax costs an extra full read of each skip, so the predicted
# sign is NEGATIVE; kept as a flag to carry the measured number
# (VERDICT r2 #3). Env DT_INT8_SKIPS=1 enables.
INT8_SKIPS = os.environ.get("DT_INT8_SKIPS", "0") == "1"


def _quantize_skip(x: jnp.ndarray, ch_axis: int):
    """(tensor) -> (int8 q, f32 per-channel scale) when INT8_SKIPS."""
    if not INT8_SKIPS:
        return x
    axes = tuple(a for a in range(x.ndim) if a != ch_axis % x.ndim)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _dequant_skip(s, dtype):
    if not INT8_SKIPS:
        return s
    q, scale = s
    return (q.astype(jnp.float32) * scale).astype(dtype)


# The frequency branch flows in F-major (B, F, C, T) layout end to end
# (see ops/conv.py F-major helpers): the `(b f) c t` DConv fold becomes
# a pure reshape instead of a transpose, and every freq-axis conv works
# on the major F axis, so the minor (C, T) tile layout never changes.
# (Round-1 channel-major design paid ~1 ms of tiled-copy per fold/unfold
# at the level-0 shape, ~10+ ms per step total; the earlier negative
# result — unfolded (1, k) conv2d 16% slower — was about conv lowering,
# not about which axis is major.)


def _fold_freq(x):
    """(B, F, C, T) -> (B*F, C, T): pure reshape in F-major layout."""
    B, F, C, T = x.shape
    return x.reshape(B * F, C, T), (B, F)


def _unfold_freq(y, bf):
    B, F = bf
    BF, C, T = y.shape
    return y.reshape(B, F, C, T)


def dconv_tail(y: jnp.ndarray, norm_p: dict, scale_p: dict,
               x: jnp.ndarray) -> jnp.ndarray:
    """GroupNorm(1) -> GLU -> LayerScale -> residual (the DConv expand
    tail). XLA's 3-pass lowering measured FASTER than the single-pass
    pallas fusion (ops/pallas/norms.py — 3.88 vs 4.31 ms at the freq
    level-0 shape, VPU-bound), so the unfused chain stays."""
    y = ops.group_norm(y, norm_p["weight"], norm_p["bias"], 1)
    y = ops.glu(y, 1)
    y = ops.layer_scale(y, scale_p["scale"])
    return x + y


def dconv(x: jnp.ndarray, blocks: list) -> jnp.ndarray:
    """DConv residual branch on (B, C, T) (reference src/layers.cpp:152-375).

    Per sub-block: compress conv (k=3, dilation 2^j) -> GroupNorm(1)+GELU
    -> expand 1x1 conv -> GroupNorm(1) -> GLU -> LayerScale -> residual.
    """
    for j, blk in enumerate(blocks):
        dil = 2 ** j
        y = ops.conv1d(x, blk["0"]["weight"], blk["0"]["bias"],
                       stride=1, padding=dil, dilation=dil)
        y = ops.group_norm(y, blk["1"]["weight"], blk["1"]["bias"], 1)
        y = ops.gelu(y)
        y = ops.conv1d(y, blk["3"]["weight"], blk["3"]["bias"])
        x = dconv_tail(y, blk["4"], blk["6"], x)
    return x


def dconv_freq(x: jnp.ndarray, blocks: list) -> jnp.ndarray:
    """dconv on the freq branch via the `(b f) c t` fold (torch/demucs
    rearrange; see _fold_freq note on why the fold wins on TPU)."""
    yf, bf = _fold_freq(x)
    yf = dconv(yf, blocks)
    return _unfold_freq(yf, bf)


def _henc_layer(x: jnp.ndarray, p: dict, padding: int = 2) -> jnp.ndarray:
    """Freq encoder layer on (B, F, C, T): conv(8,1)/(4,1) + GELU ->
    DConv -> 1x1 rewrite -> GLU (reference src/encdec.cpp:8-80)."""
    y = ops.freq_conv_fmajor(x, p["conv"]["weight"], p["conv"]["bias"],
                             stride=4, padding=padding)
    y = ops.gelu(y)
    y = dconv_freq(y, p["dconv"]["layers"])
    y = ops.freq_conv1x1_fmajor(y, p["rewrite"]["weight"], p["rewrite"]["bias"])
    return ops.glu(y, 2)


def _tenc_layer(xt: jnp.ndarray, p: dict) -> jnp.ndarray:
    """Time encoder layer (reference src/encdec.cpp:82-164). Pads the
    input to a stride multiple first (demucs convention; the reference
    gets the same effect from its ceil-mode conv, src/conv.hpp:86-89)."""
    pad = (-xt.shape[-1]) % 4
    if pad:
        xt = jnp.pad(xt, [(0, 0), (0, 0), (0, pad)])
    y = ops.conv1d(xt, p["conv"]["weight"], p["conv"]["bias"],
                   stride=4, padding=2)
    y = ops.gelu(y)
    y = dconv(y, p["dconv"]["layers"])
    y = ops.conv1d(y, p["rewrite"]["weight"], p["rewrite"]["bias"])
    return ops.glu(y, 1)


def _rewrite_glu(y: jnp.ndarray, p: dict) -> jnp.ndarray:
    """3x3 rewrite conv + GLU on (B, F, C, T); GLU_BIAS_FOLD moves the
    conv bias into the GLU pass (see ops.glu)."""
    if GLU_BIAS_FOLD:
        y = ops.freq_conv3x3_fmajor(y, p["rewrite"]["weight"])
        return ops.glu(y, 2, bias=p["rewrite"]["bias"])
    y = ops.freq_conv3x3_fmajor(y, p["rewrite"]["weight"],
                                p["rewrite"]["bias"])
    return ops.glu(y, 2)


def _hdec_layer(x: jnp.ndarray, skip: jnp.ndarray, p: dict, last: bool) -> jnp.ndarray:
    """Freq decoder layer on (B, F, C, T): +skip -> 3x3 rewrite -> GLU
    -> DConv -> transposed conv(8,1)/(4,1) [+GELU unless last] -> trim
    2+2 freq rows, folded into the conv_tr padding
    (reference src/encdec.cpp:166-256)."""
    y = _rewrite_glu(x + skip, p)
    y = dconv_freq(y, p["dconv"]["layers"])
    # last + FOLD_ISPEC_TRIM: emit the untrimmed 2052-row bin axis; the
    # [2:2050] trim folds into the epilogue's inverse-DFT kernel
    pad_tr = 0 if (last and FOLD_ISPEC_TRIM) else 2
    y = ops.freq_convtr_fmajor(y, p["conv_tr"]["weight"], p["conv_tr"]["bias"],
                               stride=4, padding=pad_tr)
    if not last:
        y = ops.gelu(y)
    return y


def _hdec_layer_v3_common(x: jnp.ndarray, skip: jnp.ndarray, p: dict,
                          last: bool) -> jnp.ndarray:
    """v3 common freq decoder on (B, F, C, T): like _hdec_layer but
    without DConv (reference src/encdec.cpp:728-863)."""
    y = _rewrite_glu(x + skip, p)
    pad_tr = 0 if (last and FOLD_ISPEC_TRIM) else 2
    y = ops.freq_convtr_fmajor(y, p["conv_tr"]["weight"], p["conv_tr"]["bias"],
                               stride=4, padding=pad_tr)
    if not last:
        y = ops.gelu(y)
    return y


def tdec_convtr_trim(y: jnp.ndarray, p: dict, out_length: int) -> jnp.ndarray:
    """Fused transposed conv + [2:2+out_length] trim for time decoders.

    On TPU the blocked-GEMM form writes the output t-contiguous (the
    phase-interleave relayout costs ~4 ms at the last-tdecoder shape).
    Its dense-GEMM FLOP waste scales with C*O, so only the thin epilogue
    layers take it (measured: C=384 layers pay ~4 ms of wasted MXU time
    each); wide layers and non-TPU backends keep the phase path + slice.
    GELU (elementwise) commutes with the trim, so callers apply it after.
    """
    w = p["weight"]
    if jax.default_backend() == "tpu" and w.shape[0] * w.shape[1] <= 1024:
        return ops.conv_transpose1d_blocked(y, w, p["bias"], 4, 2, out_length)
    y = ops.conv_transpose1d(y, p["weight"], p["bias"], stride=4)
    return y[:, :, 2:2 + out_length]


def _tdec_layer(xt: jnp.ndarray, skip: jnp.ndarray, p: dict, out_length: int,
                last: bool) -> jnp.ndarray:
    """Time decoder layer (reference src/encdec.cpp:258-361)."""
    y = xt + skip
    y = ops.conv1d(y, p["rewrite"]["weight"], p["rewrite"]["bias"], padding=1)
    y = ops.glu(y, 1)
    y = dconv(y, p["dconv"]["layers"])
    y = tdec_convtr_trim(y, p["conv_tr"], out_length)
    if not last:
        y = ops.gelu(y)
    return y


def crosstransformer(x: jnp.ndarray, xt: jnp.ndarray, p: dict,
                     cfg: HTDemucsConfig, mark=lambda msg: None):
    """5-layer cross-domain transformer (reference src/crosstransformer.cpp).

    Freq tokens are `b c fr t -> b (t fr) c` with a 2-D sincos embedding;
    time tokens get a 1-D embedding. Layers 0/2/4 are per-branch
    self-attention; layers 1/3 cross-attend (freq queries current time
    tokens, time queries the *pre-update* freq tokens,
    src/crosstransformer.cpp:285-296). x arrives F-major (B, Fr, C, T).
    """
    B, Fr, C, T1 = x.shape
    T2 = xt.shape[-1]

    pe2d = ops.create_2d_sin_embedding(C, Fr, T1)  # (C, Fr, T1)
    pos2d = jnp.asarray(pe2d.transpose(2, 1, 0).reshape(1, T1 * Fr, C), x.dtype)
    xtok = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, T1 * Fr, C)
    xtok = ops.layer_norm(xtok, p["norm_in"]["weight"], p["norm_in"]["bias"]) + pos2d

    pos1d = jnp.asarray(ops.create_sin_embedding(T2, C), xt.dtype)
    ttok = jnp.swapaxes(xt, 1, 2)
    ttok = ops.layer_norm(ttok, p["norm_in_t"]["weight"], p["norm_in_t"]["bias"]) + pos1d

    for li in range(cfg.t_layers):
        if li % 2 == 0:
            xtok = ops.transformer_layer(xtok, None, p["layers"][li], cfg.t_heads)
            ttok = ops.transformer_layer(ttok, None, p["layers_t"][li], cfg.t_heads)
        else:
            old_x = xtok
            xtok = ops.transformer_layer(xtok, ttok, p["layers"][li], cfg.t_heads)
            ttok = ops.transformer_layer(ttok, old_x, p["layers_t"][li], cfg.t_heads)
        mark(f"transformer layer {li}")

    x = jnp.transpose(xtok.reshape(B, T1, Fr, C), (0, 2, 3, 1))  # F-major
    xt = jnp.swapaxes(ttok, 1, 2)
    return x, xt


def _mean_std_unbiased(x, axes):
    """(mean, torch.Tensor.std) over axes in ONE pass over x, keepdims.
    Unbiased variance via (E[x^2] - mean^2) * n/(n-1); audio/spectrum
    inputs are near zero-mean so the cancellation is benign, and the
    two-pass form costs a second HBM read of the f32 spectrum."""
    n = 1
    for a in axes:
        n *= x.shape[a]
    mean = x.mean(axes, keepdims=True)
    mean2 = jnp.square(x).mean(axes, keepdims=True)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0) * (n / (n - 1))
    return mean, jnp.sqrt(var)


def htdemucs_segment(params: dict, mix: jnp.ndarray,
                     cfg: HTDemucsConfig) -> jnp.ndarray:
    """Separate one batch of segments: (B, 2, L) -> (B, S, 2, L).

    Full re-design of reference src/model_inference.cpp:48-475.
    """
    B, _, L = mix.shape
    S = cfg.num_sources
    # network compute dtype follows the weights (bf16 weights -> bf16
    # branches); DSP + normalization statistics stay f32
    wdtype = jnp.asarray(params["encoder"][0]["conv"]["weight"]).dtype

    # --- spectral front-end + CaC (F-major: (B, F, 2C, T)); bf16
    # networks take the spectrum at bf16 (stats still accumulate f32)
    x = dsp.spec_cac_fmajor(mix.astype(jnp.float32), cfg.nfft, dtype=wdtype)

    xs = x.astype(jnp.float32)
    mean, std = _mean_std_unbiased(xs, (1, 2, 3))
    x = ((xs - mean) / (std + 1e-5)).astype(wdtype)

    xt = mix.astype(jnp.float32)
    meant, stdt = _mean_std_unbiased(xt, (1, 2))
    xt = ((xt - meant) / (stdt + 1e-5)).astype(wdtype)

    # --- encoders (interleaved, skips saved). Stage accounting mirrors
    # the reference's 26 intra-segment steps (model_inference.cpp:156-346):
    # 1 spec + 8 encoder + 1 up + 5 transformer + 1 down + 8 decoder +
    # 2 epilogue = 26.
    n_stages = 2 * 2 * cfg.depth + cfg.t_layers + 5
    stage = iter(range(1, n_stages + 1))

    def mark(msg):
        report_stage(next(stage) / n_stages, msg)

    mark("spec + normalize")
    saved, savedt, lengths = [], [], []
    for i in range(cfg.depth):
        lengths.append(xt.shape[-1])
        xt = _tenc_layer(xt, params["tencoder"][i])
        mark(f"tencoder {i}")
        x = _henc_layer(x, params["encoder"][i])
        if i == 0:
            emb = params["freq_emb"]["embedding"]["weight"]  # (F/4, C0)
            x = x + cfg.freq_emb_scale * jnp.asarray(emb)[None, :, :, None]
        mark(f"encoder {i}")
        saved.append(_quantize_skip(x, ch_axis=2))    # (B, F, C, T)
        savedt.append(_quantize_skip(xt, ch_axis=1))  # (B, C, T)

    # --- bottleneck transformer (with 4s channel up/downsampling).
    # the 1x1 channel resampler commutes with the (F*T) flatten the
    # reference does (src/model_inference.cpp:220-252), so it runs
    # directly on the F-major tensor
    if cfg.bottom_channels:
        x = ops.freq_conv1x1_fmajor(x, params["channel_upsampler"]["weight"],
                                    params["channel_upsampler"]["bias"])
        xt = ops.conv1d(xt, params["channel_upsampler_t"]["weight"],
                        params["channel_upsampler_t"]["bias"])
    mark("channel upsample")

    x, xt = crosstransformer(x, xt, params["crosstransformer"], cfg, mark)

    if cfg.bottom_channels:
        x = ops.freq_conv1x1_fmajor(x, params["channel_downsampler"]["weight"],
                                    params["channel_downsampler"]["bias"])
        xt = ops.conv1d(xt, params["channel_downsampler_t"]["weight"],
                        params["channel_downsampler_t"]["bias"])
    mark("channel downsample")

    # --- decoders (skips consumed innermost-first)
    for i in range(cfg.depth):
        last = i == cfg.depth - 1
        x = _hdec_layer(x, _dequant_skip(saved[cfg.depth - 1 - i], x.dtype),
                        params["decoder"][i], last)
        mark(f"decoder {i}")
        xt = _tdec_layer(xt, _dequant_skip(savedt[cfg.depth - 1 - i], xt.dtype),
                         params["tdecoder"][i],
                         lengths[cfg.depth - 1 - i], last)
        mark(f"tdecoder {i}")

    # --- epilogue: denorm, un-CaC, ISTFT, sum with time branch
    fast = wdtype == jnp.bfloat16
    x = x.astype(jnp.float32) * std + mean          # (B, 2048, S*4, Tf)
    if fast:
        # bf16 networks: the spectrum already carries bf16 noise, so the
        # inverse DFT runs single-pass bf16 (~-48 dB, dsp._matmul) and the
        # spectra materialize at half the bytes
        x = x.astype(jnp.bfloat16)
    wave_spec = dsp.ispec_cac_fmajor(
        x, S, L, cfg.nfft, fast=fast,
        bin_offset=2 if FOLD_ISPEC_TRIM else 0)     # (B, S, 2, L)
    mark("istft")

    xt = xt.astype(jnp.float32) * stdt + meant      # (B, S*2, L)
    xt = xt.reshape(B, S, cfg.audio_channels, L)
    out = wave_spec + xt
    mark("sum branches")
    return out
