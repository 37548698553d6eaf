"""Hand-written conv VJPs == autodiff of the plain lowerings.

The r5 flags (ops/conv.py DT_*_BWD) swap in backwards that keep the
forward's slice-einsum layouts; this file pins the math: primal AND
cotangents must match jax.vjp through the unwrapped forms exactly
(same linear maps, f32 on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import demucs_tpu.ops.conv as CV


def _check(fn_plain, fn_hand, args, wkey=1, atol=2e-5):
    """Compare primal + (dx, dw) between plain autodiff and hand VJP."""
    x, w = args[0], args[wkey]

    def run(f):
        prim, vjp = jax.vjp(f, x, w)
        g = jnp.asarray(
            np.random.default_rng(9).standard_normal(prim.shape),
            prim.dtype)
        dx, dw = vjp(g)
        return np.asarray(prim), np.asarray(dx), np.asarray(dw)

    p0, dx0, dw0 = run(fn_plain)
    p1, dx1, dw1 = run(fn_hand)
    np.testing.assert_allclose(p1, p0, atol=atol, err_msg="primal")
    np.testing.assert_allclose(dx1, dx0, atol=atol, err_msg="dx")
    np.testing.assert_allclose(dw1, dw0, atol=atol, err_msg="dw")


@pytest.mark.parametrize("K,d,p,T", [(3, 1, 1, 61), (3, 2, 2, 61),
                                     (2, 1, 1, 40)])
def test_tap_conv_hand_vjp(K, d, p, T):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, T)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 5, K)), jnp.float32)
    _check(lambda x, w: CV._tap_conv(x, w, p, d),
           lambda x, w: CV._tap_conv_hand(x, w, p, d), (x, w))


@pytest.mark.parametrize("K,s,p,L", [(8, 4, 2, 100), (8, 4, 2, 101),
                                     (4, 2, 1, 33), (4, 4, 0, 64)])
def test_chunked_strided_conv_hand_vjp(K, s, p, L):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 6, L)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((10, 6, K)), jnp.float32)
    _check(lambda x, w: CV._chunked_strided_conv(x, w, s, p),
           lambda x, w: CV._chunked_strided_conv_hand(x, w, s, p), (x, w))


@pytest.mark.parametrize("K,s,p,Q", [(8, 4, 2, 25), (8, 4, 0, 16),
                                     (4, 2, 1, 30)])
def test_convtr_phase_hand_vjp(K, s, p, Q):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 6, Q)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((6, 9, K)), jnp.float32)
    _check(lambda x, w: CV._convtr_phase_fwd(x, w, s, p),
           lambda x, w: CV._convtr_phase_hand(x, w, s, p), (x, w))


@pytest.mark.parametrize("kh,s,p,F", [(8, 4, 2, 32), (8, 4, 2, 33),
                                      (4, 4, 0, 16)])
def test_freq_conv_fmajor_hand_vjp(kh, s, p, F):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, F, 5, 13)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 5, kh, 1)), jnp.float32)
    _check(lambda x, w: CV._freq_conv_fmajor_body(x, w, s, p),
           lambda x, w: CV._freq_conv_fmajor_hand(x, w, s, p), (x, w))


@pytest.mark.parametrize("kh,s,p,F", [(8, 4, 0, 8), (8, 4, 2, 8),
                                      (4, 2, 1, 11)])
def test_freq_convtr_fmajor_hand_vjp(kh, s, p, F):
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, F, 6, 13)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((6, 9, kh, 1)), jnp.float32)
    _check(lambda x, w: CV._freq_convtr_fmajor_body(x, w, s, p),
           lambda x, w: CV._freq_convtr_fmajor_hand(x, w, s, p), (x, w))


def test_flags_train_grads_match(monkeypatch):
    """All five flags ON: grads of a tiny htdemucs train loss equal the
    plain-autodiff grads (the whole-graph integration check)."""
    import dataclasses

    from demucs_tpu import params as P
    from demucs_tpu.config import HTDEMUCS_4S
    from demucs_tpu.train import l1_loss

    cfg = dataclasses.replace(HTDEMUCS_4S, channels=8, bottom_channels=32,
                              t_layers=3)
    params = P.unflatten_tree(P.init_flat(P.htdemucs_schema(cfg), seed=0))
    rng = np.random.default_rng(5)
    seg = 8192
    mix = jnp.asarray((rng.standard_normal((1, 2, seg)) * 0.1)
                      .astype(np.float32))
    refs = jnp.asarray((rng.standard_normal((1, cfg.num_sources, 2, seg))
                        * 0.05).astype(np.float32))

    g0 = jax.grad(lambda p: l1_loss(p, mix, refs, cfg))(params)
    for flag in ("TAP_BWD", "CHUNK_BWD", "CONVTR_BWD", "FMAJOR_BWD",
                 "FCONVTR_BWD"):
        monkeypatch.setattr(CV, flag, True)
    g1 = jax.grad(lambda p: l1_loss(p, mix, refs, cfg))(params)
    f0, f1 = P.flatten_tree(g0), P.flatten_tree(g1)
    for k in f0:
        np.testing.assert_allclose(np.asarray(f1[k]), np.asarray(f0[k]),
                                   rtol=2e-4, atol=2e-6, err_msg=k)
