"""Mesh-native flash attention (custom_partitioning) tests.

A bare pallas call is an opaque custom call that GSPMD/Shardy can only
FULLY REPLICATE on a >1-device mesh (measured: 15 all-gathers around
one flash call, every device computing the whole attention). The
flash_*_p wrappers (ops/pallas/attention.py) register the partitioning
rule the kernel implies — batch/head shard, T/S/D replicate — so the
dp×tp-sharded separator and the sharded train step keep flash.
Reference anchor: the attention hot loop src/layers.cpp:454-482.

All tests force USE_FLASH=True with the pallas kernels in interpret
mode (PA.INTERPRET) so the partitioned path traces AND executes on the
virtual 8-device CPU mesh.
"""

import dataclasses
import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import demucs_tpu.ops.pallas.attention as PA
from demucs_tpu import params as PR
from demucs_tpu.config import HTDEMUCS_4S
from demucs_tpu.models import htdemucs_segment
from demucs_tpu.ops import attention as A
from demucs_tpu.parallel import make_bag_fn, make_mesh, make_sharded_fn

SEG = 8192


@pytest.fixture
def flash_interpret():
    """Force the flash path with interpret-mode pallas kernels."""
    old = A.USE_FLASH
    A.USE_FLASH = True
    PA.INTERPRET = True
    try:
        yield
    finally:
        A.USE_FLASH = old
        PA.INTERPRET = False


def _params(cfg, seed=0):
    return PR.unflatten_tree(PR.init_flat(PR.htdemucs_schema(cfg), seed=seed))


def _ref_sdpa(q, k, v):
    D = q.shape[-1]
    logits = np.einsum("bhtd,bhsd->bhts", q, k) / np.sqrt(D)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    return np.einsum("bhts,bhsd->bhtd", w, v)


def test_flash_p_dp_tp_sharded_no_allgather(flash_interpret):
    """flash_mha_p on a dp×tp mesh: zero all-gathers (the op is
    actually partitioned over batch+heads) and exact attention math."""
    mesh = make_mesh(tp=2)  # dp=4, tp=2
    B, H, T, S, D = 8, 4, 128, 96, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    sh = NamedSharding(mesh, P("dp", "tp", None, None))
    fn = jax.jit(PA.flash_mha_p, in_shardings=(sh,) * 3, out_shardings=sh)
    hlo = fn.lower(q, k, v).compile().as_text()
    assert not re.findall(r"all-gather", hlo), "flash op was replicated"
    out = np.asarray(fn(jax.device_put(q, sh), jax.device_put(k, sh),
                        jax.device_put(v, sh)))
    ref = _ref_sdpa(np.asarray(q), np.asarray(k), np.asarray(v))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_flash_grad_sharded_no_allgather(flash_interpret):
    """grad through _sdpa (flash fwd+bwd custom_vjp) on the mesh:
    fwd/bwd wrappers both partition; grads match the einsum VJP."""
    mesh = make_mesh(tp=2)
    B, T, S, H, D = 8, 128, 96, 4, 64
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    sh = NamedSharding(mesh, P("dp", None, "tp", None))

    def loss(a, b, c):
        return jnp.sum(jnp.abs(A._sdpa(a, b, c)))

    gfn = jax.jit(jax.grad(loss, argnums=(0, 1, 2)),
                  in_shardings=(sh,) * 3)
    hlo = gfn.lower(q, k, v).compile().as_text()
    assert not re.findall(r"all-gather", hlo)
    g = gfn(jax.device_put(q, sh), jax.device_put(k, sh),
            jax.device_put(v, sh))

    A.USE_FLASH = False
    g_ref = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    A.USE_FLASH = True
    for got, ref in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-5)


def test_sharded_inference_keeps_flash(flash_interpret):
    """The dp×tp sharded separator path (make_sharded_fn) traces WITH
    flash on a >1-device mesh — the r4 latent multi-chip failure — and
    matches the unsharded einsum graph."""
    cfg = HTDEMUCS_4S
    params = _params(cfg, seed=3)
    rng = np.random.default_rng(2)
    mix = (rng.standard_normal((4, 2, SEG)) * 0.1).astype(np.float32)

    calls = {"n": 0}
    orig = PA.flash_mha_p

    def counted(*args):
        calls["n"] += 1
        return orig(*args)

    PA.flash_mha_p = counted
    try:
        mesh = make_mesh(tp=2)  # dp=4, tp=2
        fn, placed, in_sh = make_sharded_fn(
            lambda p, m: htdemucs_segment(p, m, cfg), mesh, params)
        sharded = np.asarray(fn(placed, jax.device_put(mix, in_sh)))
    finally:
        PA.flash_mha_p = orig
    assert calls["n"] > 0, "flash path never engaged"

    A.USE_FLASH = False
    base = np.asarray(jax.jit(
        lambda p, m: htdemucs_segment(p, m, cfg))(params, jnp.asarray(mix)))
    A.USE_FLASH = True
    np.testing.assert_allclose(sharded, base, atol=2e-4)


@pytest.mark.slow
def test_sharded_train_step_keeps_flash(flash_interpret):
    """The sharded train step keeps the fused flash backward on a
    >1-device mesh (no einsum downgrade — the deleted _flash_safe);
    loss and updated params match the einsum-attention sharded step."""
    import optax

    from demucs_tpu.train import make_sharded_train_step

    cfg = dataclasses.replace(HTDEMUCS_4S, channels=8, bottom_channels=32,
                              t_layers=3)
    params = _params(cfg)
    rng = np.random.default_rng(4)
    mix = (rng.standard_normal((4, 2, SEG)) * 0.1).astype(np.float32)
    refs = (rng.standard_normal((4, cfg.num_sources, 2, SEG)) * 0.05
            ).astype(np.float32)
    mesh = make_mesh(tp=2)
    opt = optax.adam(1e-3)

    def run():
        place_fn, step_fn, place_batch = make_sharded_train_step(
            mesh, cfg, opt)
        p, s = place_fn(params)
        m, r = place_batch(mix, refs)
        p, s, loss = step_fn(p, s, m, r)
        return float(loss), jax.tree.map(np.asarray, p)

    calls = {"fwd": 0, "bwd": 0}
    of, ob = PA.flash_mha_fwd_p, PA.flash_mha_bwd_p

    def cf(*a):
        calls["fwd"] += 1
        return of(*a)

    def cb(*a):
        calls["bwd"] += 1
        return ob(*a)

    PA.flash_mha_fwd_p, PA.flash_mha_bwd_p = cf, cb
    try:
        l_flash, p_flash = run()
    finally:
        PA.flash_mha_fwd_p, PA.flash_mha_bwd_p = of, ob
    assert calls["fwd"] > 0 and calls["bwd"] > 0, calls

    A.USE_FLASH = False
    l_ein, p_ein = run()
    A.USE_FLASH = True

    assert np.isfinite(l_flash)
    # forward parity is tight; post-Adam params only loosely — the
    # update is g/sqrt(v), so fp-level grad differences between the
    # flash and einsum backwards are amplified to O(lr) on leaves whose
    # gradient is near zero
    np.testing.assert_allclose(l_flash, l_ein, rtol=1e-5)
    flat_f = PR.flatten_tree(p_flash)
    flat_e = PR.flatten_tree(p_ein)
    for k in list(flat_f)[::17]:
        np.testing.assert_allclose(flat_f[k], flat_e[k], rtol=0.05,
                                   atol=1e-3, err_msg=k)


@pytest.mark.slow
def test_flash_grads_under_remat(flash_interpret):
    """jax.checkpoint over the segment graph with the flash custom_vjp
    (partition-aware wrappers) inside: grads must equal the plain
    no-remat einsum grads — the remat+flash combo the TPU train sweep
    uses but CPU tests otherwise never trace."""
    from demucs_tpu.train import l1_loss

    cfg = dataclasses.replace(HTDEMUCS_4S, channels=8, bottom_channels=32,
                              t_layers=3)
    params = _params(cfg)
    rng = np.random.default_rng(6)
    mix = jnp.asarray((rng.standard_normal((1, 2, SEG)) * 0.1)
                      .astype(np.float32))
    refs = jnp.asarray((rng.standard_normal((1, cfg.num_sources, 2, SEG))
                        * 0.05).astype(np.float32))

    g_flash = jax.grad(
        lambda p: l1_loss(p, mix, refs, cfg, remat=True))(params)
    A.USE_FLASH = False
    g_ref = jax.grad(
        lambda p: l1_loss(p, mix, refs, cfg, remat=False))(params)
    A.USE_FLASH = True
    f1, f0 = PR.flatten_tree(g_flash), PR.flatten_tree(g_ref)
    for k in f0:
        np.testing.assert_allclose(np.asarray(f1[k]), np.asarray(f0[k]),
                                   rtol=2e-4, atol=3e-6, err_msg=k)


def test_bag_shard_map_keeps_flash(flash_interpret):
    """flash inside the bag shard_map local body (the single-process
    ensemble path) still traces and matches the einsum bag."""
    from demucs_tpu.models.bag import bag_segment, stack_bag_params

    cfg = HTDEMUCS_4S
    stacked = stack_bag_params([_params(cfg, seed=s) for s in range(4)])
    rng = np.random.default_rng(5)
    mix = (rng.standard_normal((2, 2, SEG)) * 0.1).astype(np.float32)

    mesh = make_mesh(bag=4)  # bag=4, dp=2
    fn, placed, in_sh = make_bag_fn(
        lambda p, m: htdemucs_segment(p, m, cfg), mesh, stacked)
    sharded = np.asarray(fn(placed, jax.device_put(mix, in_sh)))

    A.USE_FLASH = False
    base = np.asarray(jax.jit(
        lambda p, m: bag_segment(p, m, cfg))(stacked, jnp.asarray(mix)))
    A.USE_FLASH = True
    np.testing.assert_allclose(sharded, base, atol=2e-4)
