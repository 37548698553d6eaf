"""Independent checks against the C++ reference's hard-coded contract.

The golden tests in test_model_v4/v3 compare the JAX graphs against
torch oracles written by the same authors — a common-mode transcription
error would pass them. The assertions here come from a different
source: the shape/constant tables hard-coded in the C++ reference
(src/model.hpp:19-24,633-647,673-693, src/model_load.cpp record
shapes), so a topology mistake shared by the oracle and the JAX graph
but absent from the C++ fails here.

Plus: slow-marked FULL-SEGMENT (343980-sample) golden runs — the real
segment length exercises the 336-frame spec trim, the 85995->1344 time
chain and the odd `le` bookkeeping that hop-aligned short segments
(32768) cannot reach.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from demucs_tpu import dsp
from demucs_tpu import params as P
from demucs_tpu.config import HDEMUCS_V3, HTDEMUCS_4S, SEGMENT_SAMPLES
from demucs_tpu.models import hdemucs_v3_segment, htdemucs_segment
from demucs_tpu.models.htdemucs import _henc_layer, _tenc_layer

# reference src/model.hpp:19-24 (and :673-681 for the v3 copy)
TIME_BRANCH_LENS = [343980, 85995, 21499, 5375, 1344]
FREQ_BRANCH_LEN = 336  # src/model.hpp:19
# reference src/model.hpp:633-641: (channels, freq_bins) per level
FREQ_SHAPES = [(48, 512), (96, 128), (192, 32), (384, 8)]
TIME_CHANNELS = [48, 96, 192, 384]


def _abstract_params(cfg, schema_fn):
    sch = schema_fn(cfg)
    flat = {k: jax.ShapeDtypeStruct(v, jnp.float32) for k, v in sch.items()}
    return P.unflatten_tree(flat)


def test_segment_samples_constant():
    # SEGMENT_LEN_SECS=7.8 at 44100 Hz (src/model.hpp:652, src/dsp.hpp:15)
    assert SEGMENT_SAMPLES == 343980 == TIME_BRANCH_LENS[0]


def test_v4_intermediate_shapes_match_cpp_buffers():
    """Walk the real-segment encoder chain with jax.eval_shape and
    assert every activation against demucs_segment_buffers
    (src/model.hpp:633-647) — no numerics, pure topology."""
    cfg = HTDEMUCS_4S
    params = _abstract_params(cfg, P.htdemucs_schema)

    # spec: (B, 2, 343980) -> (B, 2, 2048, 336) (src/model_inference.cpp:64-99)
    z = jax.eval_shape(lambda m: dsp.spec(m, cfg.nfft),
                       jax.ShapeDtypeStruct((1, 2, SEGMENT_SAMPLES),
                                            jnp.float32))
    assert z.shape == (1, 2, cfg.nfft // 2, FREQ_BRANCH_LEN)

    # the freq branch flows F-major (B, F, C, T); the C++ buffers are
    # channel-major (C, F, T) — same contents, axes 1/2 swapped
    x = jax.ShapeDtypeStruct((1, cfg.nfft // 2, 4, FREQ_BRANCH_LEN),
                             jnp.float32)
    xt = jax.ShapeDtypeStruct((1, 2, SEGMENT_SAMPLES), jnp.float32)
    for i in range(cfg.depth):
        x = jax.eval_shape(_henc_layer, x, params["encoder"][i])
        xt = jax.eval_shape(_tenc_layer, xt, params["tencoder"][i])
        ch, fr = FREQ_SHAPES[i]
        assert x.shape == (1, fr, ch, FREQ_BRANCH_LEN), (i, x.shape)
        assert xt.shape == (1, TIME_CHANNELS[i], TIME_BRANCH_LENS[i + 1]), \
            (i, xt.shape)

    # full forward output (x_out: nb_sources*2*nb_channels wide before
    # the un-CaC, src/model.hpp:632; final (S, 2, L))
    out = jax.eval_shape(
        lambda p, m: htdemucs_segment(p, m, cfg), params,
        jax.ShapeDtypeStruct((1, 2, SEGMENT_SAMPLES), jnp.float32))
    assert out.shape == (1, 4, 2, SEGMENT_SAMPLES)


def test_v3_intermediate_shapes_match_cpp_buffers():
    """v3 uniques: x4 (768, 336), shared x5 (1536, 168), LSTM hidden
    sizes (src/model.hpp:673-693, :1300-1303)."""
    cfg = HDEMUCS_V3
    params = _abstract_params(cfg, P.hdemucs_v3_schema)

    # encoder-4/5 weight shapes imply the branch widths
    assert np.prod(params["encoder"][4]["conv"]["weight"].shape[:1]) == 768
    assert np.prod(params["encoder"][5]["conv"]["weight"].shape[:1]) == 1536
    # LSTM_HIDDEN_SIZE_0=192 / _1=384 (src/model.hpp:686-688): torch
    # weight_ih_l0 is (4*hidden, input)
    lstm4 = params["encoder"][4]["dconv"]["layers"][0]["3"]["lstm"]
    lstm5 = params["encoder"][5]["dconv"]["layers"][0]["3"]["lstm"]
    assert lstm4["weight_ih_l0"].shape[0] == 4 * 192
    assert lstm5["weight_ih_l0"].shape[0] == 4 * 384

    out = jax.eval_shape(
        lambda p, m: hdemucs_v3_segment(p, m, cfg), params,
        jax.ShapeDtypeStruct((1, 2, SEGMENT_SAMPLES), jnp.float32))
    assert out.shape == (1, 4, 2, SEGMENT_SAMPLES)


# --- constants audit: schema shapes vs the C++ weight structs ----------
# (squeezed trailing 1-dims match the ggml writer's convention,
# scripts/convert-pth-to-ggml.py:110-140)
CPP_WEIGHT_SHAPES = {
    # src/model.hpp:290-294 (encoder convs, k=8 on the freq axis)
    "encoder.0.conv.weight": (48, 4, 8),
    "encoder.1.conv.weight": (96, 48, 8),
    "encoder.2.conv.weight": (192, 96, 8),
    "encoder.3.conv.weight": (384, 192, 8),
    # src/model.hpp:304-308 (1x1 rewrites, 2x out for GLU)
    "encoder.0.rewrite.weight": (96, 48, 1),
    "encoder.3.rewrite.weight": (768, 384, 1),
    # src/model.hpp:319-321
    "tencoder.0.conv.weight": (48, 2, 8),
    "tencoder.3.conv.weight": (384, 192, 8),
    # src/model.hpp:336-338 (transposed convs, (in, out, k))
    "decoder.0.conv_tr.weight": (384, 192, 8),
    "decoder.3.conv_tr.weight": (48, 16, 8),
    # src/model.hpp:344-346 (3x3 freq rewrites)
    "decoder.0.rewrite.weight": (768, 384, 3, 3),
    "decoder.3.rewrite.weight": (96, 48, 3, 3),
    # src/model.hpp:353-355
    "tdecoder.0.conv_tr.weight": (384, 192, 8),
    "tdecoder.3.conv_tr.weight": (48, 8, 8),
    # src/model.hpp:374-393: dconv compress convs (k=3, C/8 hidden)
    "encoder.0.dconv.layers.0.0.weight": (6, 48, 3),
    "encoder.3.dconv.layers.1.0.weight": (48, 384, 3),
    # src/model.hpp:450-457: dconv expand 1x1 (2x hidden*8 for GLU)
    "encoder.0.dconv.layers.0.3.weight": (96, 6, 1),
    "encoder.3.dconv.layers.1.3.weight": (768, 48, 1),
    # src/model.hpp:264-276 (4s channel up/downsamplers)
    "channel_upsampler.weight": (512, 384, 1),
    "channel_downsampler.weight": (384, 512, 1),
    "channel_upsampler_t.weight": (512, 384, 1),
    "channel_downsampler_t.weight": (384, 512, 1),
    # src/model.hpp:551: freq_emb (512 bins x 48 ch)
    "freq_emb.embedding.weight": (512, 48),
}


def test_v4_schema_shapes_match_cpp_structs():
    sch = {k: tuple(int(d) for d in v if d != 1) or (1,)
           for k, v in P.htdemucs_schema(HTDEMUCS_4S).items()}
    for name, cpp_shape in CPP_WEIGHT_SHAPES.items():
        squeezed = tuple(d for d in cpp_shape if d != 1) or (1,)
        assert name in sch, name
        assert sch[name] == squeezed, (name, sch[name], cpp_shape)


# --- v3 constants audit (src/model.hpp:695-1211) ----------------------
# Transcribed from the demucs_v3_model struct so the schema is checked
# against the C++ independently of the torch oracle's strict load.
CPP_V3_WEIGHT_SHAPES = {
    # model.hpp:698-729 (encoders 0-3 + tencoders, k=8)
    "encoder.0.conv.weight": (48, 4, 8),
    "encoder.3.conv.weight": (384, 192, 8),
    "encoder.3.rewrite.weight": (768, 384, 1),
    "tencoder.0.conv.weight": (48, 2, 8),
    "tencoder.3.rewrite.weight": (768, 384, 1),
    # model.hpp:738-776 (v3 dconv compress: C/4 hidden, k=3)
    "encoder.0.dconv.layers.0.0.weight": (12, 48, 3),
    "encoder.3.dconv.layers.1.0.weight": (96, 384, 3),
    # model.hpp:778-800 (dconv expand 1x1, 2x for GLU)
    "encoder.0.dconv.layers.0.3.weight": (96, 12, 1),
    "encoder.3.dconv.layers.1.3.weight": (768, 96, 1),
    # model.hpp:829-831 (tencoder 4: plain conv 384 -> 768)
    "tencoder.4.conv.weight": (768, 384, 8),
    # model.hpp:836-858 (freq encoder 4 / shared encoder 5)
    "encoder.4.conv.weight": (768, 384, 8, 1),
    "encoder.5.conv.weight": (1536, 768, 4),
    "encoder.4.rewrite.weight": (1536, 768, 1),
    "encoder.5.rewrite.weight": (3072, 1536, 1),
    # model.hpp:860-877 (enc4/5 dconv compress, hidden = LSTM sizes)
    "encoder.4.dconv.layers.0.0.weight": (192, 768, 3),
    "encoder.5.dconv.layers.1.0.weight": (384, 1536, 3),
    # model.hpp:879-1024 + :686-688: 2-layer BiLSTM, hidden 192 (enc4)
    # / 384 (enc5); ih_l0 in = hidden, ih_l1 in = 2*hidden (bidir cat),
    # hh in = hidden; gates rows = 4*hidden
    "encoder.4.dconv.layers.0.3.lstm.weight_ih_l0": (768, 192),
    "encoder.4.dconv.layers.0.3.lstm.weight_ih_l1": (768, 384),
    "encoder.4.dconv.layers.0.3.lstm.weight_ih_l1_reverse": (768, 384),
    "encoder.4.dconv.layers.1.3.lstm.weight_hh_l0": (768, 192),
    "encoder.4.dconv.layers.1.3.lstm.weight_hh_l1_reverse": (768, 192),
    "encoder.5.dconv.layers.0.3.lstm.weight_ih_l0": (1536, 384),
    "encoder.5.dconv.layers.0.3.lstm.weight_ih_l1": (1536, 768),
    "encoder.5.dconv.layers.1.3.lstm.weight_hh_l1": (1536, 384),
    # model.hpp:1026-1032 (BLSTM skip-linear: 2*hidden -> hidden)
    "encoder.4.dconv.layers.0.3.linear.weight": (192, 384),
    "encoder.5.dconv.layers.1.3.linear.weight": (384, 768),
    # model.hpp:1034-1072 (LocalState: square content/query/key/proj,
    # query_decay 16 = 4 heads x 4 decays)
    "encoder.4.dconv.layers.0.4.content.weight": (192, 192, 1),
    "encoder.4.dconv.layers.0.4.query_decay.weight": (16, 192, 1),
    "encoder.5.dconv.layers.1.4.query_decay.weight": (16, 384, 1),
    "encoder.5.dconv.layers.0.4.proj.weight": (384, 384, 1),
    # model.hpp:1074-1080 (dconv expand conv)
    "encoder.4.dconv.layers.0.5.weight": (1536, 192, 1),
    "encoder.5.dconv.layers.1.5.weight": (3072, 384, 1),
    # model.hpp:1082-1096 (GN after expand + LayerScale)
    "encoder.4.dconv.layers.0.6.weight": (1536,),
    "encoder.4.dconv.layers.0.8.scale": (768,),
    "encoder.5.dconv.layers.1.8.scale": (1536,),
    # model.hpp:1099-1134 (frequency decoders 2-5)
    "decoder.2.conv_tr.weight": (384, 192, 8, 1),
    "decoder.5.conv_tr.weight": (48, 16, 8),
    "decoder.2.rewrite.weight": (768, 384, 3, 3),
    "decoder.5.rewrite.weight": (96, 48, 3, 3),
    # model.hpp:1106-1152 (time decoders 1-4)
    "tdecoder.1.conv_tr.weight": (384, 192, 8),
    "tdecoder.4.conv_tr.weight": (48, 8, 8),
    "tdecoder.1.rewrite.weight": (768, 384, 3),
    # model.hpp:1156-1206 (unique decoder 0/1 + tdecoder 0)
    "decoder.0.conv_tr.weight": (1536, 768, 4),
    "decoder.0.rewrite.weight": (3072, 1536, 3),
    "decoder.0.norm2.weight": (768,),
    "decoder.1.conv_tr.weight": (768, 384, 8, 1),
    "decoder.1.rewrite.weight": (1536, 768, 3, 3),
    "decoder.1.norm1.weight": (1536,),
    "tdecoder.0.conv_tr.weight": (768, 384, 8),
    "tdecoder.0.norm2.weight": (384,),
    # model.hpp:1210 (freq_emb 512 bins x 48 ch)
    "freq_emb.embedding.weight": (512, 48),
}


def test_v3_schema_shapes_match_cpp_structs():
    from demucs_tpu.config import HDEMUCS_V3

    sch = {k: tuple(int(d) for d in v if d != 1) or (1,)
           for k, v in P.hdemucs_v3_schema(HDEMUCS_V3).items()}
    for name, cpp_shape in CPP_V3_WEIGHT_SHAPES.items():
        squeezed = tuple(d for d in cpp_shape if d != 1) or (1,)
        assert name in sch, name
        assert sch[name] == squeezed, (name, sch[name], cpp_shape)


def _cpp_transformer_shapes(size1: int, size2: int, size3: int) -> dict:
    """crosstransformer_base member shapes (src/model.hpp:26-257):
    in_proj (size2, size1), out_proj (size1, size1), linear1
    (size3, size1), linear2 (size1, size3), norms/gammas (size1,).
    my_layers (self-attn) are indices 0/2/4, cross_layers 1/3, and
    both exist for freq ('' suffix) and time ('_t')."""
    s = {}
    for suffix in ("", "_t"):
        s[f"crosstransformer.norm_in{suffix}.weight"] = (size1,)
        s[f"crosstransformer.norm_in{suffix}.bias"] = (size1,)
        for li in range(5):
            p = f"crosstransformer.layers{suffix}.{li}"
            attn = "cross_attn" if li % 2 else "self_attn"
            s[f"{p}.{attn}.in_proj_weight"] = (size2, size1)
            s[f"{p}.{attn}.in_proj_bias"] = (size2,)
            s[f"{p}.{attn}.out_proj.weight"] = (size1, size1)
            s[f"{p}.{attn}.out_proj.bias"] = (size1,)
            s[f"{p}.linear1.weight"] = (size3, size1)
            s[f"{p}.linear2.weight"] = (size1, size3)
            s[f"{p}.norm1.weight"] = (size1,)
            s[f"{p}.norm2.weight"] = (size1,)
            s[f"{p}.norm_out.weight"] = (size1,)
            s[f"{p}.gamma_1.scale"] = (size1,)
            s[f"{p}.gamma_2.scale"] = (size1,)
            if li % 2:
                s[f"{p}.norm3.weight"] = (size1,)
    return s


@pytest.mark.parametrize("which,sizes", [
    # src/model.hpp:261: demucs_crosstransformer_4s(512, 1536, 2048)
    ("4s", (512, 1536, 2048)),
    # src/model.hpp:282: demucs_crosstransformer_6s(384, 1152, 1536)
    ("6s", (384, 1152, 1536)),
])
def test_transformer_schema_shapes_match_cpp_structs(which, sizes):
    from demucs_tpu.config import HTDEMUCS_6S

    cfg = HTDEMUCS_4S if which == "4s" else HTDEMUCS_6S
    sch = P.htdemucs_schema(cfg)
    for name, cpp_shape in _cpp_transformer_shapes(*sizes).items():
        assert name in sch, name
        assert tuple(sch[name]) == cpp_shape, (name, sch[name], cpp_shape)
    # 4s-only channel up/downsamplers (model.hpp:264-277)
    if which == "4s":
        assert tuple(sch["channel_upsampler.weight"]) == (512, 384, 1)
        assert tuple(sch["channel_downsampler_t.weight"]) == (384, 512, 1)
    else:
        assert "channel_upsampler.weight" not in sch


def test_v4_graph_constants_match_cpp():
    """Scalar constants from the C++ that the oracle could silently get
    wrong: emb scale 10*0.2 (model_inference.cpp:162-179), GroupNorm
    eps 1e-5 and 8 transformer heads (crosstransformer.cpp:133,201)."""
    cfg = HTDEMUCS_4S
    assert cfg.freq_emb_scale == pytest.approx(2.0)
    assert cfg.t_heads == 8
    assert cfg.t_layers == 5
    assert cfg.nfft == 4096 and dsp.FFT_HOP_SIZE == 1024
    assert dsp.SAMPLE_RATE == 44100


@pytest.mark.slow
@pytest.mark.parametrize("which", ["v4", "v3"])
def test_full_segment_golden(which):
    """Full 343980-sample segment vs the torch oracle on CPU.

    Shape-dependent bugs in spec/ispec padding hide at hop-aligned
    short segments; the real length (NOT a hop multiple: 343980 =
    335.9*1024) exercises the exact reference bookkeeping."""
    if which == "v4":
        from demucs_tpu.tools import torch_ref
        cfg = HTDEMUCS_4S
        schema = P.htdemucs_schema(cfg)
        flat = P.init_flat(schema, seed=3)
        model = torch_ref.HTDemucsRef(cfg)
        seg_fn = htdemucs_segment
    else:
        from demucs_tpu.tools import torch_ref_v3
        cfg = HDEMUCS_V3
        schema = P.hdemucs_v3_schema(cfg)
        flat = P.init_flat(schema, seed=4)
        model = torch_ref_v3.HDemucsV3Ref(cfg)
        seg_fn = torch_ref_v3 and hdemucs_v3_segment
    model.load_state_dict({k: torch.from_numpy(v) for k, v in flat.items()},
                          strict=True)
    model.eval()
    params = P.unflatten_tree(flat)

    rng = np.random.default_rng(11)
    mix = (rng.standard_normal((1, 2, SEGMENT_SAMPLES)) * 0.1
           ).astype(np.float32)
    with torch.no_grad():
        theirs = model(torch.from_numpy(mix)).numpy()
    ours = np.asarray(jax.jit(lambda p, m: seg_fn(p, m, cfg))(
        params, jnp.asarray(mix)))
    assert ours.shape == theirs.shape == (1, 4, 2, SEGMENT_SAMPLES)
    diff = np.abs(ours - theirs).max()
    scale = np.abs(theirs).max()
    assert diff < 3e-4 * max(scale, 1.0), (diff, scale)
