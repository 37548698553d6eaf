"""Parameter handling tests: ggml roundtrip, tree flatten/unflatten."""

import numpy as np

import jax

from demucs_tpu import params as P
from demucs_tpu.config import HDEMUCS_V3, HTDEMUCS_4S, HTDEMUCS_6S


def test_unflatten_dense_lists_and_sparse_dicts():
    flat = {
        "encoder.0.conv.weight": np.zeros(1),
        "encoder.1.conv.weight": np.ones(1),
        "dconv.layers.0.0.weight": np.zeros(2),
        "dconv.layers.0.3.weight": np.ones(2),
    }
    tree = P.unflatten_tree(flat)
    assert isinstance(tree["encoder"], list) and len(tree["encoder"]) == 2
    assert isinstance(tree["dconv"]["layers"], list)
    blk = tree["dconv"]["layers"][0]
    assert set(blk.keys()) == {"0", "3"}  # sparse Sequential indices stay dict
    back = P.flatten_tree(tree)
    assert set(back) == set(flat)


def test_ggml_roundtrip(tmp_path):
    cfg = HTDEMUCS_6S  # smallest real schema
    schema = P.htdemucs_schema(cfg)
    flat = P.init_flat(schema, seed=3)
    path = tmp_path / "ggml-model-htdemucs-6s-f16.bin"
    P.write_ggml(path, "htdemucs_6s", flat)

    kind, raw = P.load_ggml(path)
    assert kind == "htdemucs_6s"
    assert len(raw) == len(schema)
    # squeezed on disk, fp16 precision
    for name in ("encoder.0.conv.weight", "crosstransformer.norm_in.weight"):
        np.testing.assert_allclose(
            raw[name].reshape(schema[name]).astype(np.float32),
            flat[name], atol=2e-3, rtol=2e-3)

    cfg2, tree = P.load_model_params(path)
    assert cfg2 == cfg
    flat2 = P.flatten_tree(tree)
    assert set(flat2) == set(schema)
    for name, shape in schema.items():
        assert flat2[name].shape == tuple(shape)


def test_schema_counts():
    assert len(P.htdemucs_schema(HTDEMUCS_4S)) == 533
    # 6s drops the 8 up/downsampler tensors and shrinks dims only
    assert len(P.htdemucs_schema(HTDEMUCS_6S)) == 525
    v3 = P.hdemucs_v3_schema(HDEMUCS_V3)
    # every tensor name unique and shaped
    assert all(isinstance(v, tuple) for v in v3.values())


def test_from_state_dict_validates():
    cfg = HTDEMUCS_6S
    schema = P.htdemucs_schema(cfg)
    flat = P.init_flat(schema, seed=4)
    bad = dict(flat)
    bad.pop("freq_emb.embedding.weight")
    try:
        P.from_state_dict(bad, schema)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "missing" in str(e)


def test_truncated_ggml_clean_errors(tmp_path):
    import pytest
    from demucs_tpu.params import ggml as G
    p = tmp_path / "m.bin"
    G.write_ggml(p, "htdemucs_4s", {"a.w": np.ones((4, 4), np.float16)})
    data = p.read_bytes()
    for cut in (2, 7, 15, len(data) - 3):
        with pytest.raises(ValueError, match="ggml"):
            G._load_ggml_numpy(data[:cut])
    # native parser rejects the same inputs
    from demucs_tpu.params import native_ggml
    for cut in (7, 15, len(data) - 3):
        with pytest.raises(ValueError, match="magic|ggml"):
            native_ggml.load(data[:cut])


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax save/load must round-trip the schema tree bit-exactly and
    support the bf16 cast-on-restore serving path."""
    import jax.numpy as jnp

    from demucs_tpu.params.orbax_io import load_checkpoint, save_checkpoint

    cfg = HTDEMUCS_4S
    flat = P.init_flat(P.htdemucs_schema(cfg), seed=7)
    tree = P.unflatten_tree(flat)
    path = tmp_path / "ckpt"
    save_checkpoint(path, tree)

    back = P.flatten_tree(load_checkpoint(path))
    assert set(back) == set(flat)
    for k, v in flat.items():
        np.testing.assert_array_equal(back[k], v)

    b16 = P.flatten_tree(load_checkpoint(path, dtype=jnp.bfloat16))
    w = b16["encoder.0.conv.weight"]
    assert w.dtype == jnp.bfloat16


def test_load_model_params_from_orbax_dir(tmp_path):
    """load_model_params dispatches directory paths to the Orbax loader
    and infers the model kind without a ggml magic."""
    from demucs_tpu.params.ggml import load_model_params
    from demucs_tpu.params.orbax_io import save_checkpoint

    cfg = HTDEMUCS_4S
    flat = P.init_flat(P.htdemucs_schema(cfg), seed=4)
    path = tmp_path / "ckpt4s"
    save_checkpoint(path, flat)

    got_cfg, tree = load_model_params(path)
    assert got_cfg is cfg
    back = P.flatten_tree(tree)
    # load_model_params casts to f32 (same as the ggml path)
    np.testing.assert_array_equal(
        back["encoder.0.conv.weight"],
        flat["encoder.0.conv.weight"].astype(np.float32))
