"""Golden tests: htdemucs v4 JAX graph vs the torch oracle.

The schema-generated random state dict loads into the torch oracle with
strict=True (validating every name and shape against real torch
modules), then both frameworks separate the same random mix.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from demucs_tpu import params as P
from demucs_tpu.config import HTDEMUCS_4S, HTDEMUCS_6S
from demucs_tpu.models import htdemucs_segment

from demucs_tpu.tools import torch_ref


SEG = 1024 * 32  # short segment for CPU-speed golden tests


def _setup(cfg, seed=0):
    schema = P.htdemucs_schema(cfg)
    flat = P.init_flat(schema, seed=seed)
    model = torch_ref.HTDemucsRef(cfg)
    model.load_state_dict({k: torch.from_numpy(v) for k, v in flat.items()},
                          strict=True)
    model.eval()
    return P.unflatten_tree(flat), model


def test_schema_tensor_count_4s():
    # the reference's htdemucs-4s ggml holds exactly 533 tensors
    # (reference README.md:100)
    assert len(P.htdemucs_schema(HTDEMUCS_4S)) == 533


@pytest.mark.parametrize("cfg", [HTDEMUCS_4S, HTDEMUCS_6S],
                         ids=["4s", "6s"])
def test_htdemucs_matches_torch_oracle(cfg):
    params, model = _setup(cfg)
    rng = np.random.default_rng(42)
    mix = (rng.standard_normal((1, 2, SEG)) * 0.1).astype(np.float32)

    with torch.no_grad():
        theirs = model(torch.from_numpy(mix)).numpy()

    ours = np.asarray(
        jax.jit(lambda p, m: htdemucs_segment(p, m, cfg))(params, jnp.asarray(mix)))

    assert ours.shape == theirs.shape == (1, cfg.num_sources, 2, SEG)
    diff = np.abs(ours - theirs).max()
    scale = np.abs(theirs).max()
    assert diff < 3e-4 * max(scale, 1.0), (diff, scale)


def test_htdemucs_batched_consistency():
    """Batch dim must not change per-item results (continuous batching)."""
    cfg = HTDEMUCS_4S
    params, _ = _setup(cfg, seed=1)
    rng = np.random.default_rng(7)
    mix = (rng.standard_normal((3, 2, SEG)) * 0.1).astype(np.float32)
    fn = jax.jit(lambda p, m: htdemucs_segment(p, m, cfg))
    batched = np.asarray(fn(params, jnp.asarray(mix)))
    single = np.asarray(fn(params, jnp.asarray(mix[1:2])))
    np.testing.assert_allclose(batched[1:2], single, atol=2e-5)


def test_htdemucs_bf16_close_to_fp32():
    """bf16 weights must run the whole network in bf16 and stay within a
    few percent of the fp32 output (DSP + stats remain f32)."""
    cfg = HTDEMUCS_4S
    params, _ = _setup(cfg, seed=5)
    rng = np.random.default_rng(9)
    mix = (rng.standard_normal((1, 2, SEG)) * 0.1).astype(np.float32)
    fn = jax.jit(lambda p, m: htdemucs_segment(p, m, cfg))
    ref = np.asarray(fn(params, jnp.asarray(mix)))
    p16 = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    out = np.asarray(fn(p16, jnp.asarray(mix)))
    assert out.dtype == np.float32  # epilogue promotes back
    err = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert err < 0.08, err


def test_htdemucs_layout_experiment_flags_equivalent():
    """The hardware-layout experiment flags (split-phase chunk conv,
    ispec trim fold, GLU bias fold) must not change the math — only how
    XLA lays it out. Asserted at fp32 against the default path."""
    from demucs_tpu.models import htdemucs as M

    cfg = HTDEMUCS_4S
    params, _ = _setup(cfg, seed=3)
    rng = np.random.default_rng(11)
    mix = jnp.asarray((rng.standard_normal((1, 2, SEG)) * 0.1)
                      .astype(np.float32))
    fn = jax.jit(lambda p, m: htdemucs_segment(p, m, cfg))
    ref = np.asarray(fn(params, mix))  # defaults: both folds ON
    old = (M.FOLD_ISPEC_TRIM, M.GLU_BIAS_FOLD)
    try:
        M.FOLD_ISPEC_TRIM = False
        M.GLU_BIAS_FOLD = False
        out = np.asarray(jax.jit(
            lambda p, m: htdemucs_segment(p, m, cfg))(params, mix))
    finally:
        M.FOLD_ISPEC_TRIM, M.GLU_BIAS_FOLD = old
    np.testing.assert_allclose(out, ref, atol=2e-6)
