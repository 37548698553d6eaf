"""Weight-only quantization as a param-pytree transform.

The reference stores fp16 and computes fp32 (src/model_load.cpp fp16->
fp32 on load). On TPU the bottleneck is HBM bandwidth, so weights can
be held at int8 with per-output-channel scales and widened on the fly —
XLA fuses the dequant multiply into the consuming conv/matmul, so HBM
reads shrink 2-4x while the MXU still sees bf16/fp32 operands.

A quantized leaf is a dict {"q": int8[out, ...], "scale": f32[out]}.
`dequantize_tree` restores a dense pytree inside jit; models stay
quantization-agnostic. Norm/bias/embedding/LSTM leaves are kept dense:
norm statistics and gate biases are precision-critical (SURVEY.md §7.3
— the 0.1 dB SDR budget needs norms and softmax in fp32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# leaves worth quantizing: big matmul/conv kernels. Everything else
# (biases, norm affine params, layer scales, embeddings, LSTM gates)
# stays dense.
_QUANT_SUFFIXES = ("weight",)
_SKIP_SUBSTRINGS = ("norm", "embedding", "lstm", "bias")
_MIN_SIZE = 4096  # don't bother with tiny tensors


def _leaf_path_strings(tree):
    flat, treedef = jax.tree.flatten_with_path(tree)
    paths = ["/".join(str(getattr(k, "key", k)) for k in p) for p, _ in flat]
    return flat, treedef, paths


def should_quantize(path: str, leaf) -> bool:
    arr = np.asarray(leaf)
    if arr.ndim < 2 or arr.size < _MIN_SIZE:
        return False
    if not path.endswith(_QUANT_SUFFIXES):
        return False
    return not any(s in path.lower() for s in _SKIP_SUBSTRINGS)


def quantize_int8(params):
    """Dense pytree -> pytree with {"q", "scale"} int8 leaves.

    Symmetric per-output-channel (dim 0) scales: q = round(w / s),
    s = max|w| / 127 per out-channel.
    """
    flat, treedef, paths = _leaf_path_strings(params)

    def q(leaf):
        w = np.asarray(leaf, np.float32)
        amax = np.abs(w).max(axis=tuple(range(1, w.ndim)), keepdims=True)
        scale = np.maximum(amax / 127.0, 1e-12)
        qw = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        return {"q": qw, "scale": scale.astype(np.float32)}

    out = [q(leaf) if should_quantize(p, leaf) else np.asarray(leaf)
           for (_, leaf), p in zip(flat, paths)]
    return jax.tree.unflatten(treedef, out)


def quantize_fp8(params):
    """Dense pytree -> {"q": float8_e4m3, "scale"} leaves.

    Per-output-channel scales map the channel amax to the e4m3 max
    (448), keeping the format's relative precision (~2^-3..2^-4 near
    amax, better below) — no clipping, unlike int8's uniform grid.
    """
    import ml_dtypes  # baked in with jax

    flat, treedef, paths = _leaf_path_strings(params)
    E4M3_MAX = 448.0

    def q(leaf):
        w = np.asarray(leaf, np.float32)
        amax = np.abs(w).max(axis=tuple(range(1, w.ndim)), keepdims=True)
        scale = np.maximum(amax / E4M3_MAX, 1e-12)
        qw = (w / scale).astype(ml_dtypes.float8_e4m3fn)
        return {"q": qw, "scale": scale.astype(np.float32)}

    out = [q(leaf) if should_quantize(p, leaf) else np.asarray(leaf)
           for (_, leaf), p in zip(flat, paths)]
    return jax.tree.unflatten(treedef, out)


def fp8_compute_supported(device=None) -> bool:
    """Best-effort: does this device execute fp8 matmuls natively?

    TPU v4/v5 (incl. v5e/v5p) have no fp8 MXU mode — XLA widens the
    e4m3 operand to bf16 with standalone converts, so fp8 storage costs
    compute instead of saving bandwidth (measured round 2: 101 vs 724
    audio-s/s e2e on v5e, a 7x regression). v6e (Trillium) and later
    advertise fp8; GPUs from Hopper/Ada do.
    """
    import re

    d = device if device is not None else jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    if d.platform == "tpu":
        # word-boundary generation match: "tpu v6e" yes, but a kind
        # that merely CONTAINS v6..v9 as a substring of a longer token
        # (e.g. a driver revision) must not pass
        return re.search(r"\bv[6-9][a-z]?\b", kind) is not None
    if d.platform == "gpu":
        # Hopper/Blackwell/Ada have fp8 tensor cores; Ampere and older
        # (A100/V100/T4) emulate — warn there too. Consumer Ada is
        # "rtx 40xx" specifically: plain "rtx 40\d*" would also match
        # Turing workstation cards like "quadro rtx 4000" (no fp8), so
        # require exactly four digits and no "quadro" prefix.
        if "quadro" in kind:
            return False
        if re.search(r"\brtx [45]0\d\d\b", kind):
            return True
        return any(re.search(rf"\b{t}\b", kind)
                   for t in ("h100", "h200", "h800", "gh200",
                             "b100", "b200", "gb200", "l4", "l40",
                             "l40s", "ada"))
    return False


def _is_qleaf(x) -> bool:
    return isinstance(x, dict) and set(x) == {"q", "scale"}


def dequantize_tree(qparams, dtype=jnp.float32):
    """Widen quantized leaves on device (jit-traceable; XLA fuses the
    multiply into consumers so int8 is what crosses HBM)."""

    def dq(x):
        if _is_qleaf(x):
            return (x["q"].astype(dtype) * x["scale"].astype(dtype))
        return x

    return jax.tree.map(dq, qparams, is_leaf=_is_qleaf)


def quantized_model_fn(model_fn, dtype=jnp.float32):
    """Wrap model_fn(params, mix) to accept a quantized pytree."""

    def fn(qparams, mix):
        return model_fn(dequantize_tree(qparams, dtype), mix)

    return fn


def quantized_bytes(qparams) -> int:
    """Total parameter bytes as stored (int8 + scales + dense leaves)."""
    total = 0
    for leaf in jax.tree.leaves(qparams):
        total += np.asarray(leaf).nbytes
    return total
