"""Demucs v3 Hybrid (hdemucs_mmi) as a pure JAX function.

TPU-first re-design of reference src/model_inference.cpp:477-856 and
src/encdec.cpp:363-863. Encoders 0-3 reuse the v4 layer shapes (with a
dconv compression of 4); the unique parts are:

  * tencoder 4: plain strided Conv1d 384->768 (src/encdec.cpp:519-530)
  * freq encoder 4 with time-branch injection, whose DConv carries a
    2-layer BiLSTM + LocalAttention (src/encdec.cpp:532-573,
    src/layers.cpp:896-1113)
  * shared encoder 5 on the merged branch (src/encdec.cpp:575-615)
  * shared decoder 0 / freq decoder 1 / time decoder 0 with GroupNorm(4)
    norms (src/encdec.cpp:617-726)
  * common decoders without DConv (src/encdec.cpp:728-863)

The BiLSTM runs the full sequence length (336/168 steps) like the
reference, not the original training-time max_steps=200 framing; the
reference validated <=0.1 dB SDR deviation for this choice
(.github/SDR_scores.md:67-87).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import dsp, ops
from ..config import HDemucsV3Config
from ..utils.progress import report_stage
from .htdemucs import (
    _hdec_layer_v3_common,
    _henc_layer,
    _mean_std_unbiased,
    _tenc_layer,
    dconv_tail,
    tdec_convtr_trim,
)


def _lstm_params(p3: dict) -> list[dict]:
    """Map torch LSTM state-dict keys to ops.bilstm layer structure."""
    layers = []
    for i in range(2):
        layers.append({
            "forward": {
                "weight_ih": p3["lstm"][f"weight_ih_l{i}"],
                "weight_hh": p3["lstm"][f"weight_hh_l{i}"],
                "bias_ih": p3["lstm"][f"bias_ih_l{i}"],
                "bias_hh": p3["lstm"][f"bias_hh_l{i}"],
            },
            "reverse": {
                "weight_ih": p3["lstm"][f"weight_ih_l{i}_reverse"],
                "weight_hh": p3["lstm"][f"weight_hh_l{i}_reverse"],
                "bias_ih": p3["lstm"][f"bias_ih_l{i}_reverse"],
                "bias_hh": p3["lstm"][f"bias_hh_l{i}_reverse"],
            },
        })
    return layers


def dconv_lstm_attn(x: jnp.ndarray, blocks: list) -> jnp.ndarray:
    """v3 encoder-4/5 DConv with BiLSTM + LocalAttention mid-section.

    x: (B, C, T). Reference src/layers.cpp:896-1113.
    """
    for j, blk in enumerate(blocks):
        dil = 2 ** j
        y = ops.conv1d(x, blk["0"]["weight"], blk["0"]["bias"],
                       stride=1, padding=dil, dilation=dil)
        y = ops.group_norm(y, blk["1"]["weight"], blk["1"]["bias"], 1)
        y = ops.gelu(y)

        # BiLSTM over time with linear + skip (src/layers.cpp:928-955)
        seq = jnp.swapaxes(y, 1, 2)  # (B, T, C)
        h = ops.bilstm(seq, _lstm_params(blk["3"]))
        h = ops.attention.linear(h, blk["3"]["linear"]["weight"],
                                 blk["3"]["linear"]["bias"])
        seq = h + seq
        y = jnp.swapaxes(seq, 1, 2)

        y = ops.local_attention(y, blk["4"])

        y = ops.conv1d(y, blk["5"]["weight"], blk["5"]["bias"])
        x = dconv_tail(y, blk["6"], blk["8"], x)
    return x


def hdemucs_v3_segment(params: dict, mix: jnp.ndarray,
                       cfg: HDemucsV3Config) -> jnp.ndarray:
    """Separate one batch of segments: (B, 2, L) -> (B, S, 2, L)."""
    B, _, L = mix.shape
    S = cfg.num_sources
    # network compute dtype follows the weights; DSP + stats stay f32
    wdtype = jnp.asarray(params["encoder"][0]["conv"]["weight"]).dtype

    x = dsp.spec_cac_fmajor(mix.astype(jnp.float32), cfg.nfft, dtype=wdtype)

    xs = x.astype(jnp.float32)
    mean, std = _mean_std_unbiased(xs, (1, 2, 3))
    x = ((xs - mean) / (std + 1e-5)).astype(wdtype)

    xt = mix.astype(jnp.float32)
    meant, stdt = _mean_std_unbiased(xt, (1, 2))
    xt = ((xt - meant) / (stdt + 1e-5)).astype(wdtype)

    # stage accounting mirrors the reference's 22 v3 intra-segment steps
    # (model_inference.cpp:584-736): spec + 8 encoder + tenc4 + fenc4 +
    # enc5 + shared dec0 + dec1 + tdec0 + 8 common decoder... reported
    # here as 22 marks
    stage = iter(range(1, 23))

    def mark(msg):
        report_stage(next(stage) / 22, msg)

    mark("spec + normalize")
    # --- encoders 0-3 (shared structure with v4)
    saved, savedt, lengths = [], [], []
    for i in range(4):
        lengths.append(xt.shape[-1])
        xt = _tenc_layer(xt, params["tencoder"][i])
        mark(f"tencoder {i}")
        x = _henc_layer(x, params["encoder"][i])
        if i == 0:
            emb = params["freq_emb"]["embedding"]["weight"]
            x = x + cfg.freq_emb_scale * jnp.asarray(emb)[None, :, :, None]
        mark(f"encoder {i}")
        saved.append(x)
        savedt.append(xt)

    # --- tencoder 4: plain conv (time 1344 -> 336)
    pad = (-xt.shape[-1]) % 4
    xt4_len = xt.shape[-1]
    if pad:
        xt = jnp.pad(xt, [(0, 0), (0, 0), (0, pad)])
    xt4 = ops.conv1d(xt, params["tencoder"][4]["conv"]["weight"],
                     params["tencoder"][4]["conv"]["bias"], stride=4, padding=2)

    # --- freq encoder 4 with time injection (freq 8 -> 1, merged branch)
    e4 = params["encoder"][4]
    y = ops.freq_conv_fmajor(x, e4["conv"]["weight"], e4["conv"]["bias"],
                             stride=4, padding=0)        # (B, 1, 768, T)
    y = y[:, 0] + xt4                                    # inject time branch
    y = ops.group_norm(y, e4["norm1"]["weight"], e4["norm1"]["bias"], 4)
    y = ops.gelu(y)
    y = dconv_lstm_attn(y, e4["dconv"]["layers"])
    rw = jnp.asarray(e4["rewrite"]["weight"])[:, :, :, 0]  # (1536,768,1,1)->1d
    y = ops.conv1d(y, rw, e4["rewrite"]["bias"])
    y = ops.group_norm(y, e4["norm2"]["weight"], e4["norm2"]["bias"], 4)
    x4 = ops.glu(y, 1)                                   # (B, 768, T)
    mark("tencoder 4 + freq encoder 4")

    # --- shared encoder 5 (time T -> T/2)
    e5 = params["encoder"][5]
    y = ops.conv1d(x4, e5["conv"]["weight"], e5["conv"]["bias"],
                   stride=2, padding=1)
    y = ops.group_norm(y, e5["norm1"]["weight"], e5["norm1"]["bias"], 4)
    y = ops.gelu(y)
    y = dconv_lstm_attn(y, e5["dconv"]["layers"])
    y = ops.conv1d(y, e5["rewrite"]["weight"], e5["rewrite"]["bias"])
    y = ops.group_norm(y, e5["norm2"]["weight"], e5["norm2"]["bias"], 4)
    x5 = ops.glu(y, 1)                                   # (B, 1536, T/2)
    mark("shared encoder 5")

    # --- shared decoder 0 (input: zeros + skip x5) -> seeds both branches
    d0 = params["decoder"][0]
    y = ops.conv1d(x5, d0["rewrite"]["weight"], d0["rewrite"]["bias"], padding=1)
    y = ops.group_norm(y, d0["norm1"]["weight"], d0["norm1"]["bias"], 4)
    y = ops.glu(y, 1)
    y = ops.conv_transpose1d(y, d0["conv_tr"]["weight"], d0["conv_tr"]["bias"],
                             stride=2)
    y = ops.group_norm(y, d0["norm2"]["weight"], d0["norm2"]["bias"], 4)
    y = ops.gelu(y)
    T4 = x4.shape[-1]
    xshared = y[:, :, 1:1 + T4]                          # (B, 768, T)
    mark("shared decoder 0")

    # --- freq decoder 1: skip = x4, produces freq x_3 and the time seed
    # (F-major: the F axis is size 1 here, reinstated for the 2-D convs)
    d1 = params["decoder"][1]
    y = (xshared + x4)[:, None, :, :]                    # (B, 1, 768, T)
    y = ops.freq_conv3x3_fmajor(y, d1["rewrite"]["weight"],
                                d1["rewrite"]["bias"])
    y = ops.group_norm_fmajor(y, d1["norm1"]["weight"], d1["norm1"]["bias"], 4)
    y = ops.glu(y, 2)
    pre = y                                              # (B, 1, 768, T)
    y = ops.freq_convtr_fmajor(y, d1["conv_tr"]["weight"],
                               d1["conv_tr"]["bias"], stride=4)
    y = ops.group_norm_fmajor(y, d1["norm2"]["weight"], d1["norm2"]["bias"], 4)
    x = ops.gelu(y)                                      # (B, 8, 384, T)
    mark("freq decoder 1")

    # --- time decoder 0: seeded by `pre` (src/encdec.cpp:700-726)
    td0 = params["tdecoder"][0]
    y = pre[:, 0]
    y = ops.conv_transpose1d(y, td0["conv_tr"]["weight"], td0["conv_tr"]["bias"],
                             stride=4)
    y = ops.group_norm(y, td0["norm2"]["weight"], td0["norm2"]["bias"], 4)
    y = ops.gelu(y)
    xt = y[:, :, 2:2 + xt4_len]                          # (B, 384, 1344)
    mark("time decoder 0")

    # --- common decoders (no DConv, no norms)
    for k in range(4):
        last = k == 3
        x = _hdec_layer_v3_common(x, saved[3 - k], params["decoder"][k + 2], last)
        mark(f"decoder {k + 2}")
        skipt = savedt[3 - k]
        dt = params["tdecoder"][k + 1]
        y = xt + skipt
        y = ops.conv1d(y, dt["rewrite"]["weight"], dt["rewrite"]["bias"], padding=1)
        y = ops.glu(y, 1)
        # tdecoder0 above can't use the blocked form (its GroupNorm runs
        # pre-trim), but the common layers' GELU commutes with the trim
        y = tdec_convtr_trim(y, dt["conv_tr"], lengths[3 - k])
        if not last:
            y = ops.gelu(y)
        xt = y
        mark(f"tdecoder {k + 1}")

    # --- epilogue (same as v4; x is F-major (B, 2048, S*4, T))
    fast = wdtype == jnp.bfloat16
    x = x.astype(jnp.float32) * std + mean
    if fast:
        x = x.astype(jnp.bfloat16)
    # module-attribute read at TRACE time (not a top-level `from` import,
    # which would freeze the experiment flag at import time)
    from . import htdemucs as _ht
    wave_spec = dsp.ispec_cac_fmajor(
        x, S, L, cfg.nfft, fast=fast,
        bin_offset=2 if _ht.FOLD_ISPEC_TRIM else 0)

    xt = xt.astype(jnp.float32) * stdt + meant
    xt = xt.reshape(B, S, cfg.audio_channels, L)
    return wave_spec + xt
