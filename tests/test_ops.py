"""Op-level parity tests against PyTorch primitives.

These are the automated equivalent of the reference's tier-2/3 layer
tests (reference test/test_layers.cpp, scripts/demucs_pytorch_layer_test.py):
every op is driven with random tensors and asserted against the torch
op it must reproduce.
"""

import numpy as np
import torch

import jax.numpy as jnp

from demucs_tpu import ops

ATOL = 2e-5


def _np(x):
    return np.asarray(x)


def test_conv1d():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 6, 50)).astype(np.float32)
    w = rng.standard_normal((10, 6, 8)).astype(np.float32)
    b = rng.standard_normal(10).astype(np.float32)
    for stride, pad, dil in [(1, 0, 1), (4, 2, 1), (1, 2, 2), (2, 3, 2)]:
        ours = _np(ops.conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                              stride, pad, dil))
        theirs = torch.nn.functional.conv1d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=stride, padding=pad, dilation=dil).numpy()
        np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_conv1d_large_batch_emitter_branch():
    """conv1d routes K<=3 stride-1 convs through the conv emitter when
    the leading dim is >= 64 (the folded-freq shapes) — exercise that
    branch against torch (the small-batch tests only hit the tap path)."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((96, 12, 40)).astype(np.float32)
    w = rng.standard_normal((5, 12, 3)).astype(np.float32)
    b = rng.standard_normal(5).astype(np.float32)
    for pad, dil in [(1, 1), (2, 2)]:
        ours = _np(ops.conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                              1, pad, dil))
        theirs = torch.nn.functional.conv1d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=1, padding=pad, dilation=dil).numpy()
        np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_conv2d():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 32, 12)).astype(np.float32)
    w = rng.standard_normal((9, 4, 8, 1)).astype(np.float32)
    b = rng.standard_normal(9).astype(np.float32)
    for stride, pad in [((4, 1), (2, 0)), ((1, 1), (1, 1))]:
        w2 = w if pad != (1, 1) else rng.standard_normal((9, 4, 3, 3)).astype(np.float32)
        ours = _np(ops.conv2d(jnp.asarray(x), jnp.asarray(w2), jnp.asarray(b),
                              stride, pad))
        theirs = torch.nn.functional.conv2d(
            torch.from_numpy(x), torch.from_numpy(w2), torch.from_numpy(b),
            stride=stride, padding=pad).numpy()
        np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_conv_transpose1d():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 6, 21)).astype(np.float32)
    w = rng.standard_normal((6, 4, 8)).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    for stride, pad in [(4, 0), (2, 1), (2, 0)]:
        ours = _np(ops.conv_transpose1d(jnp.asarray(x), jnp.asarray(w),
                                        jnp.asarray(b), stride, pad))
        theirs = torch.nn.functional.conv_transpose1d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=stride, padding=pad).numpy()
        np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_conv_transpose2d():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 6, 8, 13)).astype(np.float32)
    w = rng.standard_normal((6, 4, 8, 1)).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    ours = _np(ops.conv_transpose2d(jnp.asarray(x), jnp.asarray(w),
                                    jnp.asarray(b), (4, 1), (0, 0)))
    theirs = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=(4, 1), padding=(0, 0)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_layer_norm():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 7, 32)).astype(np.float32)
    w = rng.standard_normal(32).astype(np.float32)
    b = rng.standard_normal(32).astype(np.float32)
    ours = _np(ops.layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    theirs = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (32,), torch.from_numpy(w), torch.from_numpy(b),
        eps=1e-5).numpy()
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_group_norm():
    rng = np.random.default_rng(5)
    for shape, groups in [((3, 16, 40), 4), ((3, 16, 40), 1),
                          ((2, 12, 8, 9), 4)]:
        C = shape[1]
        x = rng.standard_normal(shape).astype(np.float32)
        w = rng.standard_normal(C).astype(np.float32)
        b = rng.standard_normal(C).astype(np.float32)
        ours = _np(ops.group_norm(jnp.asarray(x), jnp.asarray(w),
                                  jnp.asarray(b), groups))
        theirs = torch.nn.functional.group_norm(
            torch.from_numpy(x), groups, torch.from_numpy(w),
            torch.from_numpy(b), eps=1e-5).numpy()
        np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_group_norm_one_pass_variance_offset_robust():
    """The one-pass E[x^2]-mean^2 variance (norms._mean_var) must stay
    accurate against torch's two-pass form for shifted inputs. Demucs
    activations keep |mean|/std small, but conv biases shift it — guard
    the cancellation behavior up to mean/std = 100 in f32."""
    rng = np.random.default_rng(9)
    C = 16
    w = np.ones(C, np.float32)
    b = np.zeros(C, np.float32)
    for offset in (0.0, 3.0, 100.0):
        x = (rng.standard_normal((4, C, 512)) + offset).astype(np.float32)
        ours = _np(ops.group_norm(jnp.asarray(x), jnp.asarray(w),
                                  jnp.asarray(b), 1))
        theirs = torch.nn.functional.group_norm(
            torch.from_numpy(x), 1, torch.from_numpy(w),
            torch.from_numpy(b), eps=1e-5).numpy()
        # tolerance widens with the cancellation term (mean^2/var)*eps_f32
        tol = max(ATOL, 3e-7 * offset * offset * 30)
        np.testing.assert_allclose(ours, theirs, atol=tol)


def test_glu_gelu():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 8, 10)).astype(np.float32)
    for axis in [1, 2]:
        ours = _np(ops.glu(jnp.asarray(x), axis))
        theirs = torch.nn.functional.glu(torch.from_numpy(x), dim=axis).numpy()
        np.testing.assert_allclose(ours, theirs, atol=ATOL)
    ours = _np(ops.gelu(jnp.asarray(x)))
    theirs = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_multihead_attention_self_and_cross():
    rng = np.random.default_rng(7)
    B, T, S, C, H = 2, 12, 9, 32, 8
    mha = torch.nn.MultiheadAttention(C, H, batch_first=True)
    mha.eval()
    q = rng.standard_normal((B, T, C)).astype(np.float32)
    kv = rng.standard_normal((B, S, C)).astype(np.float32)
    with torch.no_grad():
        theirs, _ = mha(torch.from_numpy(q), torch.from_numpy(kv),
                        torch.from_numpy(kv), need_weights=False)
    ours = _np(ops.multihead_attention(
        jnp.asarray(q), jnp.asarray(kv),
        jnp.asarray(mha.in_proj_weight.detach().numpy()),
        jnp.asarray(mha.in_proj_bias.detach().numpy()),
        jnp.asarray(mha.out_proj.weight.detach().numpy()),
        jnp.asarray(mha.out_proj.bias.detach().numpy()),
        H))
    np.testing.assert_allclose(ours, theirs.numpy(), atol=ATOL)


def test_transformer_layer_matches_torch_oracle():
    """Full self-attention transformer layer (incl. the staged-reduction
    norm_out GroupNorm(1)) against the torch oracle's TLayer — the unit
    that pins the optimization_barrier form to torch numerics directly
    (golden segment tests cover it only in aggregate)."""
    from demucs_tpu.tools.torch_ref import TLayer
    rng = np.random.default_rng(11)
    B, T, C, H = 2, 14, 32, 8
    layer = TLayer(C, hidden=4 * C, heads=H)
    with torch.no_grad():
        for p in layer.parameters():
            p.copy_(torch.from_numpy(
                rng.standard_normal(p.shape).astype(np.float32) * 0.3))
    layer.eval()
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    with torch.no_grad():
        theirs = layer(torch.from_numpy(x)).numpy()
    sd = {k: jnp.asarray(v.detach().numpy())
          for k, v in layer.state_dict().items()}
    params = {
        "self_attn": {"in_proj_weight": sd["self_attn.in_proj_weight"],
                      "in_proj_bias": sd["self_attn.in_proj_bias"],
                      "out_proj": {"weight": sd["self_attn.out_proj.weight"],
                                   "bias": sd["self_attn.out_proj.bias"]}},
        "norm1": {"weight": sd["norm1.weight"], "bias": sd["norm1.bias"]},
        "norm2": {"weight": sd["norm2.weight"], "bias": sd["norm2.bias"]},
        "norm_out": {"weight": sd["norm_out.weight"],
                     "bias": sd["norm_out.bias"]},
        "gamma_1": {"scale": sd["gamma_1.scale"]},
        "gamma_2": {"scale": sd["gamma_2.scale"]},
        "linear1": {"weight": sd["linear1.weight"],
                    "bias": sd["linear1.bias"]},
        "linear2": {"weight": sd["linear2.weight"],
                    "bias": sd["linear2.bias"]},
    }
    ours = _np(ops.transformer_layer(jnp.asarray(x), None, params, H))
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_cross_transformer_layer_matches_torch_oracle():
    """Cross-attention variant of the layer test (distinct kv path and
    norm1/norm2/norm3 wiring, reference src/crosstransformer.cpp:79-203)."""
    from demucs_tpu.tools.torch_ref import TCrossLayer
    rng = np.random.default_rng(12)
    B, T, S, C, H = 2, 10, 13, 32, 8
    layer = TCrossLayer(C, hidden=4 * C, heads=H)
    with torch.no_grad():
        for p in layer.parameters():
            p.copy_(torch.from_numpy(
                rng.standard_normal(p.shape).astype(np.float32) * 0.3))
    layer.eval()
    q = rng.standard_normal((B, T, C)).astype(np.float32)
    kv = rng.standard_normal((B, S, C)).astype(np.float32)
    with torch.no_grad():
        theirs = layer(torch.from_numpy(q), torch.from_numpy(kv)).numpy()
    sd = {k: jnp.asarray(v.detach().numpy())
          for k, v in layer.state_dict().items()}
    params = {
        "cross_attn": {"in_proj_weight": sd["cross_attn.in_proj_weight"],
                       "in_proj_bias": sd["cross_attn.in_proj_bias"],
                       "out_proj": {"weight": sd["cross_attn.out_proj.weight"],
                                    "bias": sd["cross_attn.out_proj.bias"]}},
        "norm1": {"weight": sd["norm1.weight"], "bias": sd["norm1.bias"]},
        "norm2": {"weight": sd["norm2.weight"], "bias": sd["norm2.bias"]},
        "norm3": {"weight": sd["norm3.weight"], "bias": sd["norm3.bias"]},
        "norm_out": {"weight": sd["norm_out.weight"],
                     "bias": sd["norm_out.bias"]},
        "gamma_1": {"scale": sd["gamma_1.scale"]},
        "gamma_2": {"scale": sd["gamma_2.scale"]},
        "linear1": {"weight": sd["linear1.weight"],
                    "bias": sd["linear1.bias"]},
        "linear2": {"weight": sd["linear2.weight"],
                    "bias": sd["linear2.bias"]},
    }
    ours = _np(ops.transformer_layer(jnp.asarray(q), jnp.asarray(kv),
                                     params, H))
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_bilstm_matches_torch():
    rng = np.random.default_rng(8)
    B, T, C, Hid = 2, 17, 12, 10
    torch.manual_seed(0)
    lstm = torch.nn.LSTM(C, Hid, num_layers=2, bidirectional=True,
                         batch_first=True)
    lstm.eval()
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    with torch.no_grad():
        theirs, _ = lstm(torch.from_numpy(x))

    layers = []
    for i in range(2):
        layer = {}
        for direction, suffix in [("forward", ""), ("reverse", "_reverse")]:
            layer[direction] = {
                "weight_ih": jnp.asarray(getattr(lstm, f"weight_ih_l{i}{suffix}").detach().numpy()),
                "weight_hh": jnp.asarray(getattr(lstm, f"weight_hh_l{i}{suffix}").detach().numpy()),
                "bias_ih": jnp.asarray(getattr(lstm, f"bias_ih_l{i}{suffix}").detach().numpy()),
                "bias_hh": jnp.asarray(getattr(lstm, f"bias_hh_l{i}{suffix}").detach().numpy()),
            }
        layers.append(layer)
    ours = _np(ops.bilstm(jnp.asarray(x), layers))
    np.testing.assert_allclose(ours, theirs.numpy(), atol=1e-5)


def _torch_local_attention(x, p, heads=4, ndecay=4):
    """Torch transcription of reference src/layers.cpp:533-721 (test oracle)."""
    B, C, T = x.shape
    D = C // heads
    conv = torch.nn.functional.conv1d
    queries = conv(x, p["query.weight"], p["query.bias"])
    keys = conv(x, p["key.weight"], p["key.bias"])
    content = conv(x, p["content.weight"], p["content.bias"])
    decay_q = torch.sigmoid(conv(x, p["query_decay.weight"], p["query_decay.bias"])) / 2

    q = queries.reshape(B, heads, D, T)
    k = keys.reshape(B, heads, D, T)
    c = content.reshape(B, heads, D, T)
    dq = decay_q.reshape(B, heads, ndecay, T)

    dots = torch.einsum("bhdt,bhds->bhts", k, q) / (D ** 0.5)
    idx = torch.arange(T, dtype=torch.float32)
    delta = (idx[:, None] - idx[None, :]).abs()
    decays = torch.arange(1, ndecay + 1, dtype=torch.float32)
    kernel = -decays[:, None, None] * delta[None] / (ndecay ** 0.5)
    dots = dots + torch.einsum("bhns,nts->bhts", dq, kernel)
    dots.masked_fill_(torch.eye(T, dtype=torch.bool)[None, None], -100.0)
    weights = torch.softmax(dots, dim=2)
    out = torch.einsum("bhts,bhdt->bhds", weights, c).reshape(B, C, T)
    out = conv(out, p["proj.weight"], p["proj.bias"])
    return x + out


def test_local_attention():
    rng = np.random.default_rng(9)
    B, C, T = 2, 16, 20
    x = rng.standard_normal((B, C, T)).astype(np.float32)
    names = {
        "query": C, "key": C, "content": C, "proj": C, "query_decay": 16,
    }
    tp, jp = {}, {}
    for name, out_ch in names.items():
        w = (rng.standard_normal((out_ch, C, 1)) * 0.3).astype(np.float32)
        b = (rng.standard_normal(out_ch) * 0.1).astype(np.float32)
        tp[f"{name}.weight"] = torch.from_numpy(w)
        tp[f"{name}.bias"] = torch.from_numpy(b)
        jp[name] = {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}
    theirs = _torch_local_attention(torch.from_numpy(x), tp).numpy()
    ours = _np(ops.local_attention(jnp.asarray(x), jp))
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def _torch_sin_embedding(length, dim, shift=0, max_period=10000.0):
    pos = shift + torch.arange(length, dtype=torch.float32).view(-1, 1, 1)
    half = dim // 2
    adim = torch.arange(half, dtype=torch.float32).view(1, 1, -1)
    phase = pos / (max_period ** (adim / (half - 1)))
    return torch.cat([torch.cos(phase), torch.sin(phase)], dim=-1).permute(1, 0, 2)


def test_sin_embedding_1d():
    ours = ops.create_sin_embedding(13, 16)
    theirs = _torch_sin_embedding(13, 16).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def _torch_2d_sin_embedding(d_model, height, width, max_period=10000.0):
    pe = torch.zeros(d_model, height, width)
    d_model //= 2
    div_term = torch.exp(
        torch.arange(0., d_model, 2) * -(np.log(max_period) / d_model))
    pos_w = torch.arange(0., width).unsqueeze(1)
    pos_h = torch.arange(0., height).unsqueeze(1)
    pe[0:d_model:2] = torch.sin(pos_w * div_term).transpose(0, 1).unsqueeze(1).repeat(1, height, 1)
    pe[1:d_model:2] = torch.cos(pos_w * div_term).transpose(0, 1).unsqueeze(1).repeat(1, height, 1)
    pe[d_model::2] = torch.sin(pos_h * div_term).transpose(0, 1).unsqueeze(2).repeat(1, 1, width)
    pe[d_model + 1::2] = torch.cos(pos_h * div_term).transpose(0, 1).unsqueeze(2).repeat(1, 1, width)
    return pe


def test_sin_embedding_2d():
    ours = ops.create_2d_sin_embedding(32, 8, 5)
    theirs = _torch_2d_sin_embedding(32, 8, 5).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_conv_transpose_phase_paths_match_torch():
    """Phase-decomposed (stride | K) and dilated fallback must both be
    torch-exact, including nonzero output padding trim."""
    import torch
    rng = np.random.default_rng(21)
    # 1d: K=8 s=4 (phase), K=4 s=2 p=1 (phase, v3 dec0), K=3 s=2 (fallback)
    for k, s, p in ((8, 4, 0), (4, 2, 1), (3, 2, 1), (8, 4, 2)):
        x = rng.standard_normal((2, 6, 19)).astype(np.float32)
        w = rng.standard_normal((6, 5, k)).astype(np.float32) * 0.3
        b = rng.standard_normal(5).astype(np.float32)
        ref = torch.conv_transpose1d(torch.from_numpy(x), torch.from_numpy(w),
                                     torch.from_numpy(b), stride=s,
                                     padding=p).numpy()
        got = np.asarray(ops.conv_transpose1d(jnp.asarray(x), jnp.asarray(w),
                                              jnp.asarray(b), stride=s,
                                              padding=p))
        np.testing.assert_allclose(got, ref, atol=2e-5, err_msg=str((k, s, p)))
    # 2d freq-axis: (8,1) stride (4,1) phase; (3,3) stride (2,2) fallback
    x = rng.standard_normal((2, 6, 10, 7)).astype(np.float32)
    for kh, kw, sh, sw, p in ((8, 1, 4, 1, 0), (8, 1, 4, 1, 2),
                              (3, 3, 2, 2, 1)):
        w = rng.standard_normal((6, 5, kh, kw)).astype(np.float32) * 0.3
        b = rng.standard_normal(5).astype(np.float32)
        ref = torch.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                                     torch.from_numpy(b), stride=(sh, sw),
                                     padding=(p, p if kw > 1 else 0)).numpy()
        got = np.asarray(ops.conv_transpose2d(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=(sh, sw),
            padding=(p, p if kw > 1 else 0)))
        np.testing.assert_allclose(got, ref, atol=2e-5, err_msg=str((kh, sh)))


def test_strided_conv_chunked_path_matches_torch():
    """The chunked-einsum strided conv (stride | K) must be torch-exact
    for every Demucs front-end shape, incl. non-multiple lengths."""
    import torch
    rng = np.random.default_rng(31)
    for cin, cout, k, s, p, L in ((2, 8, 8, 4, 2, 101), (4, 8, 8, 4, 2, 64),
                                  (8, 6, 4, 2, 1, 37), (3, 5, 6, 3, 0, 30),
                                  (4, 8, 8, 4, 0, 40)):
        x = rng.standard_normal((2, cin, L)).astype(np.float32)
        w = rng.standard_normal((cout, cin, k)).astype(np.float32) * 0.3
        b = rng.standard_normal(cout).astype(np.float32)
        ref = torch.conv1d(torch.from_numpy(x), torch.from_numpy(w),
                           torch.from_numpy(b), stride=s, padding=p).numpy()
        got = np.asarray(ops.conv1d(jnp.asarray(x), jnp.asarray(w),
                                    jnp.asarray(b), stride=s, padding=p))
        np.testing.assert_allclose(got, ref, atol=2e-5,
                                   err_msg=str((cin, k, s, p, L)))
    # 2d freq-axis variant
    for kh, sh, ph, H in ((8, 4, 2, 33), (8, 4, 0, 32), (4, 2, 1, 9)):
        x = rng.standard_normal((2, 4, H, 5)).astype(np.float32)
        w = rng.standard_normal((7, 4, kh, 1)).astype(np.float32) * 0.3
        b = rng.standard_normal(7).astype(np.float32)
        ref = torch.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                           torch.from_numpy(b), stride=(sh, 1),
                           padding=(ph, 0)).numpy()
        got = np.asarray(ops.conv2d(jnp.asarray(x), jnp.asarray(w),
                                    jnp.asarray(b), stride=(sh, 1),
                                    padding=(ph, 0)))
        np.testing.assert_allclose(got, ref, atol=2e-5,
                                   err_msg=str((kh, sh, ph, H)))


def test_conv_transpose1d_blocked_matches_torch():
    """The blocked-GEMM ConvTranspose1d+trim (the TPU epilogue path,
    ops/conv.py:conv_transpose1d_blocked) must equal torch's
    ConvTranspose1d followed by the [trim : trim+out_len] slice."""
    rng = np.random.default_rng(11)
    for (cin, cout, k, s, trim, Q) in (
            (16, 8, 8, 4, 2, 1000),   # htdemucs last tdecoder shape family
            (96, 8, 8, 4, 2, 700),    # v3 last tdecoder
            (8, 4, 4, 2, 1, 333),
            (8, 4, 8, 4, 0, 257),
            (8, 4, 8, 4, 3, 129)):
        x = rng.standard_normal((2, cin, Q)).astype(np.float32) * 0.3
        w = rng.standard_normal((cin, cout, k)).astype(np.float32) * 0.2
        b = rng.standard_normal(cout).astype(np.float32)
        full = torch.conv_transpose1d(torch.from_numpy(x), torch.from_numpy(w),
                                      torch.from_numpy(b), stride=s).numpy()
        out_len = full.shape[-1] - trim - 1
        ref = full[:, :, trim:trim + out_len]
        got = np.asarray(ops.conv_transpose1d_blocked(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), s, trim, out_len))
        np.testing.assert_allclose(got, ref, atol=3e-5,
                                   err_msg=str((cin, cout, k, s, trim)))
