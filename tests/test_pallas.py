"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from demucs_tpu.ops.pallas.attention import flash_mha


def _ref_attention(q, k, v):
    d = q.shape[-1]
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k) / np.sqrt(d)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", w, v.astype(jnp.float32))


@pytest.mark.parametrize("t,s", [(256, 256), (336, 168), (2688 // 4, 1344 // 4)])
def test_flash_mha_matches_reference(t, s):
    rng = np.random.default_rng(0)
    B, H, D = 1, 2, 64
    q = jnp.asarray(rng.standard_normal((B, H, t, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, s, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, s, D)), jnp.float32)
    ref = np.asarray(_ref_attention(q, k, v))
    out = np.asarray(flash_mha(q, k, v, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_flash_mha_extreme_logits_stable():
    """Online softmax must survive large logit magnitudes."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 1, 64, 64)) * 30, jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1, 64, 64)) * 30, jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 1, 64, 64)), jnp.float32)
    ref = np.asarray(_ref_attention(q, k, v))
    out = np.asarray(flash_mha(q, k, v, interpret=True))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=1e-3)


def test_mha_flash_flag_in_model_op():
    """ops.multihead_attention flash path == XLA path."""
    from demucs_tpu.ops import attention as A
    rng = np.random.default_rng(2)
    B, T, S, C, Hh = 2, 96, 64, 128, 8
    q = jnp.asarray(rng.standard_normal((B, T, C)) * 0.5, jnp.float32)
    kv = jnp.asarray(rng.standard_normal((B, S, C)) * 0.5, jnp.float32)
    ipw = jnp.asarray(rng.standard_normal((3 * C, C)) * 0.05, jnp.float32)
    ipb = jnp.asarray(rng.standard_normal(3 * C) * 0.05, jnp.float32)
    opw = jnp.asarray(rng.standard_normal((C, C)) * 0.05, jnp.float32)
    opb = jnp.asarray(rng.standard_normal(C) * 0.05, jnp.float32)
    try:
        A.USE_FLASH = False
        ref = np.asarray(A.multihead_attention(q, kv, ipw, ipb, opw, opb, Hh))
    finally:
        A.USE_FLASH = None
    # interpret-mode flash on CPU via the kernel directly
    wq, wk, wv = jnp.split(ipw, 3, axis=0)
    bq, bk, bv = jnp.split(ipb, 3, axis=0)
    Q = A.linear(q, wq, bq).reshape(B, T, Hh, C // Hh).transpose(0, 2, 1, 3)
    K = A.linear(kv, wk, bk).reshape(B, S, Hh, C // Hh).transpose(0, 2, 1, 3)
    V = A.linear(kv, wv, bv).reshape(B, S, Hh, C // Hh).transpose(0, 2, 1, 3)
    out = flash_mha(Q, K, V, interpret=True).transpose(0, 2, 1, 3).reshape(B, T, C)
    out = np.asarray(A.linear(out, opw, opb))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_flash_supported_gate():
    from demucs_tpu.ops.pallas.attention import flash_supported
    assert flash_supported(2688, 1344)
    assert flash_supported(336, 168)
    assert not flash_supported(7, 2688)   # no mult-of-8 divisor


def test_int8_matmul_matches_dequant_reference():
    from demucs_tpu.ops.pallas.quant_matmul import int8_linear, int8_matmul
    rng = np.random.default_rng(3)
    M, K, N = 64, 128, 96
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.5, jnp.float32)
    w = rng.standard_normal((N, K)).astype(np.float32) * 0.1
    amax = np.abs(w).max(1, keepdims=True)
    scale = np.maximum(amax / 127.0, 1e-12)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)

    ref = np.asarray(x) @ (q.astype(np.float32) * scale).T
    out = np.asarray(int8_matmul(x, jnp.asarray(q),
                                 jnp.asarray(scale.reshape(-1)),
                                 interpret=True))
    # bf16 operands inside the kernel: ~0.4% relative
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)

    bias = rng.standard_normal(N).astype(np.float32)
    y = np.asarray(int8_linear(x.reshape(4, 16, K),
                               {"q": jnp.asarray(q), "scale": jnp.asarray(scale)},
                               bias, interpret=True))
    np.testing.assert_allclose(y, (ref + bias).reshape(4, 16, N),
                               rtol=2e-2, atol=2e-2)


def test_dconv_fused_matches_model_dconv():
    from demucs_tpu.models.htdemucs import dconv
    from demucs_tpu.ops.pallas.dconv import dconv_fused
    rng = np.random.default_rng(4)
    N, C, T, h = 64, 16, 96, 2
    def blk(seed):
        r = np.random.default_rng(seed)
        mk = lambda *s: jnp.asarray(r.standard_normal(s) * .2, jnp.float32)
        return {"0": {"weight": mk(h, C, 3), "bias": mk(h)},
                "1": {"weight": mk(h) + 1, "bias": mk(h)},
                "3": {"weight": mk(2 * C, h, 1), "bias": mk(2 * C)},
                "4": {"weight": mk(2 * C) + 1, "bias": mk(2 * C)},
                "6": {"scale": mk(C)}}
    blocks = [blk(1), blk(2)]
    x = jnp.asarray(rng.standard_normal((N, C, T)) * 0.3, jnp.float32)
    ref = np.asarray(dconv(x, blocks))
    out = np.asarray(dconv_fused(x, blocks, interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-6)


def test_gn_glu_scale_res_matches_ops_chain():
    """The fused GroupNorm(1)->GLU->LayerScale->residual kernel (the TPU
    DConv tail, ops/pallas/norms.py) must match the unfused ops chain."""
    from demucs_tpu import ops
    from demucs_tpu.ops.pallas.norms import gn_glu_scale_res
    rng = np.random.default_rng(7)
    for (R, C, T) in ((64, 48, 336), (16, 96, 336), (8, 192, 84), (3, 8, 128)):
        x = jnp.asarray(rng.standard_normal((R, 2 * C, T)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((2 * C,)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((2 * C,)), jnp.float32)
        ls = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
        res = jnp.asarray(rng.standard_normal((R, C, T)), jnp.float32)
        ref = np.asarray(res + ops.layer_scale(
            ops.glu(ops.group_norm(x, g, b, 1), 1), ls))
        got = np.asarray(gn_glu_scale_res(x, g, b, ls, res, interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-5,
                                   err_msg=str((R, C, T)))


def test_flash_fwd_lse_matches_reference():
    """flash_mha_fwd (the training forward) must reproduce flash_mha's
    output and emit the correct logsumexp of the scaled logits."""
    import math
    from demucs_tpu.ops.pallas.attention import flash_mha_fwd

    rng = np.random.default_rng(3)
    B, H, T, S, D = 2, 2, 128, 96, 64
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    out, lse = flash_mha_fwd(q, k, v, interpret=True)
    ref = _ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    logits = np.einsum("bhtd,bhsd->bhts", np.asarray(q),
                       np.asarray(k)) / math.sqrt(D)
    m = logits.max(-1)
    ref_lse = m + np.log(np.exp(logits - m[..., None]).sum(-1))
    np.testing.assert_allclose(np.asarray(lse).reshape(B, H, T),
                               ref_lse, atol=2e-5)


def test_flash_bwd_matches_einsum_vjp():
    """flash_mha_bwd must match autodiff through the einsum attention —
    the training path swaps it in for the (B*H, T, S)-materializing
    VJP (ops/attention.py:_sdpa_bwd)."""
    from demucs_tpu.ops.pallas.attention import flash_mha_bwd, flash_mha_fwd

    rng = np.random.default_rng(4)
    B, H, T, S, D = 1, 3, 128, 96, 64
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)

    ref, vjp = jax.vjp(_ref_attention, q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)
    out, lse = flash_mha_fwd(q, k, v, interpret=True)
    dq, dk, dv = flash_mha_bwd(q, k, v, out, lse, g, interpret=True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), atol=3e-5)


def test_sdpa_flash_vjp_matches_einsum_vjp():
    """End-to-end: grads through ops.attention._sdpa with the flash path
    forced on (interpret pallas) equal grads through the einsum path."""
    from demucs_tpu.ops import attention as A

    rng = np.random.default_rng(5)
    B, T, S, H, D = 2, 128, 96, 2, 64
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)

    def loss(q, k, v):
        return jnp.sum(jnp.abs(A._sdpa(q, k, v)))

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    import demucs_tpu.ops.pallas.attention as PA
    old = A.USE_FLASH
    A.USE_FLASH = True
    PA.INTERPRET = True
    try:
        g_fl = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    finally:
        A.USE_FLASH = old
        PA.INTERPRET = False
    for a, b in zip(g_ref, g_fl):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-5)


def test_pallas_bilstm_matches_scan():
    """The VMEM-resident recurrence kernel == the lax.scan reference,
    values and (via the custom_vjp's scan recompute) gradients."""
    import demucs_tpu.ops.lstm as L
    import demucs_tpu.ops.pallas.attention as PA

    rng = np.random.default_rng(11)
    B, T, C, H = 2, 37, 24, 16
    layer = {
        d: {
            "weight_ih": jnp.asarray(
                rng.standard_normal((4 * H, C)) * 0.2, jnp.float32),
            "weight_hh": jnp.asarray(
                rng.standard_normal((4 * H, H)) * 0.2, jnp.float32),
            "bias_ih": jnp.asarray(rng.standard_normal(4 * H) * 0.1,
                                   jnp.float32),
            "bias_hh": jnp.asarray(rng.standard_normal(4 * H) * 0.1,
                                   jnp.float32),
        }
        for d in ("forward", "reverse")
    }
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)

    old = L.USE_PALLAS
    L.USE_PALLAS = False
    try:
        ref = np.asarray(L.bilstm(x, [layer]))
        g_ref = jax.grad(lambda a: jnp.sum(jnp.abs(L.bilstm(a, [layer])))
                         )(x)
        L.USE_PALLAS = True
        PA.INTERPRET = True
        got = np.asarray(L.bilstm(x, [layer]))
        g_got = jax.grad(lambda a: jnp.sum(jnp.abs(L.bilstm(a, [layer])))
                         )(x)
    finally:
        L.USE_PALLAS = old
        PA.INTERPRET = False
    np.testing.assert_allclose(got, ref, atol=2e-6)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=2e-5)
