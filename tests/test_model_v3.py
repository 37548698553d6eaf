"""Golden tests: hdemucs_mmi v3 JAX graph vs the torch oracle."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from demucs_tpu import params as P
from demucs_tpu.config import HDEMUCS_V3
from demucs_tpu.models import hdemucs_v3_segment

from demucs_tpu.tools import torch_ref_v3


SEG = 1024 * 32


def _setup(seed=0):
    cfg = HDEMUCS_V3
    schema = P.hdemucs_v3_schema(cfg)
    flat = P.init_flat(schema, seed=seed)
    model = torch_ref_v3.HDemucsV3Ref(cfg)
    model.load_state_dict({k: torch.from_numpy(v) for k, v in flat.items()},
                          strict=True)
    model.eval()
    return cfg, P.unflatten_tree(flat), model


def test_hdemucs_v3_matches_torch_oracle():
    cfg, params, model = _setup()
    rng = np.random.default_rng(11)
    mix = (rng.standard_normal((1, 2, SEG)) * 0.1).astype(np.float32)

    with torch.no_grad():
        theirs = model(torch.from_numpy(mix)).numpy()

    ours = np.asarray(
        jax.jit(lambda p, m: hdemucs_v3_segment(p, m, cfg))(params, jnp.asarray(mix)))

    assert ours.shape == theirs.shape == (1, 4, 2, SEG)
    diff = np.abs(ours - theirs).max()
    scale = np.abs(theirs).max()
    assert diff < 3e-4 * max(scale, 1.0), (diff, scale)


def test_v3_layout_experiment_flags_equivalent():
    """v3 shares the experiment flags through _hdec_layer_v3_common and
    the shared epilogue; they must not change the math."""
    from demucs_tpu.models import htdemucs as M

    cfg, params, _ = _setup(seed=2)
    rng = np.random.default_rng(13)
    mix = jnp.asarray((rng.standard_normal((1, 2, SEG)) * 0.1)
                      .astype(np.float32))
    fn = jax.jit(lambda p, m: hdemucs_v3_segment(p, m, cfg))
    ref = np.asarray(fn(params, mix))  # defaults: both folds ON
    old = (M.FOLD_ISPEC_TRIM, M.GLU_BIAS_FOLD)
    try:
        M.FOLD_ISPEC_TRIM = False
        M.GLU_BIAS_FOLD = False
        out = np.asarray(jax.jit(
            lambda p, m: hdemucs_v3_segment(p, m, cfg))(params, mix))
    finally:
        M.FOLD_ISPEC_TRIM, M.GLU_BIAS_FOLD = old
    np.testing.assert_allclose(out, ref, atol=2e-6)
