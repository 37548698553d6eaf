"""Bidirectional multi-layer LSTM as lax.scan (PyTorch-exact gates).

TPU-first re-design of reference src/lstm.cpp:36-147: the input
projection for the whole sequence is hoisted out of the recurrence as
one big MXU matmul; the scan body only carries the (B, H) recurrent
matmul and the fused gate pointwise ops. Gate order i, f, g, o matches
torch.nn.LSTM (reference src/lstm.cpp:27-34).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

# Pallas recurrence kernel gate (ops/pallas/lstm.py: the whole
# sequence + W_hh stay VMEM-resident for the recurrence). Measured
# r5 on-chip: v3 batch-1 e2e 1157.3 vs 1145.3 audio-s/s — only +1.0%;
# the XLA while loop was already near its floor (~0.46 us/step), so
# the hypothesized per-step W_hh HBM re-read was NOT the dominant
# cost. Default OFF: the custom_vjp backward recomputes through the
# scan, so v3 TRAINING would pay an extra scan forward for a ~1%
# inference win. DT_PALLAS_LSTM=1 opts in. Kernel findings kept for
# the record: Mosaic requires f32 matmul accumulators, and its bf16
# transcendental lowering is broken (vector.broadcast element-type
# mismatch) — the cell runs in f32 inside the kernel.
USE_PALLAS: bool | None = (
    None if "DT_PALLAS_LSTM" not in os.environ
    else os.environ["DT_PALLAS_LSTM"] == "1")
# VMEM gate: (T, 2, B, 4H) xs + (2, H, 4H) W + (T, 2, B, H) ys must fit
# the ~16 MB scoped budget (batch 8 at the enc4 shape is ~11 MB)
_PALLAS_VMEM_BYTES = 13 * 1024 * 1024


def _use_pallas() -> bool:
    if USE_PALLAS is not None:
        return USE_PALLAS
    return False  # adjudicated-marginal; see the gate comment above


def _scan_recurrence(xs: jnp.ndarray, w_hh: jnp.ndarray) -> jnp.ndarray:
    """Reference recurrence: xs (T, 2, B, 4H) projected inputs (dir 1
    time-flipped), w_hh (2, H, 4H) -> ys (T, 2, B, H)."""

    def step(carry, xt):
        h, c = carry                                       # (2, B, H)
        gates = xt + jnp.einsum("dbh,dhg->dbg", h, w_hh)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    T, _, B, H4 = xs.shape
    H = H4 // 4
    init = (jnp.zeros((2, B, H), xs.dtype), jnp.zeros((2, B, H), xs.dtype))
    _, ys = lax.scan(step, init, xs)
    return ys


@jax.custom_vjp
def _recurrence(xs, w_hh):
    """Dispatch: pallas kernel when gated on and VMEM-sized, else the
    XLA scan. custom_vjp because the pallas custom call has no autodiff
    rule — the backward recomputes through the scan (the training path
    keeps its adjudicated perf; the kernel is the inference win)."""
    T, _, B, H4 = xs.shape
    H = H4 // 4
    nbytes = xs.dtype.itemsize * (xs.size + w_hh.size + T * 2 * B * H)
    if _use_pallas() and nbytes <= _PALLAS_VMEM_BYTES:
        from .pallas.lstm import bilstm_recurrence

        return bilstm_recurrence(xs, w_hh, interpret=_INTERPRET())
    return _scan_recurrence(xs, w_hh)


def _INTERPRET() -> bool:
    from .pallas import attention as PA

    return PA.INTERPRET  # tests force interpret-mode kernels off-TPU


def _rec_fwd(xs, w_hh):
    return _recurrence(xs, w_hh), (xs, w_hh)


def _rec_bwd(res, g):
    xs, w_hh = res
    _, vjp = jax.vjp(_scan_recurrence, xs, w_hh)
    return vjp(g)


_recurrence.defvjp(_rec_fwd, _rec_bwd)


def _bilstm_layer_fused(x: jnp.ndarray, layer: dict) -> jnp.ndarray:
    """Both directions in ONE recurrence: the backward direction
    consumes the time-flipped sequence, so a (2, B, H) carried state
    runs fwd and bwd in lockstep — half the sequential-step overhead of
    two scans (the recurrence is the latency bottleneck: ~µs of FLOPs
    per step). The input projection for the whole sequence is hoisted
    out as one big MXU matmul; the recurrence itself runs as the
    VMEM-resident pallas kernel on TPU (see _recurrence)."""
    B, T, _ = x.shape
    H = layer["forward"]["weight_hh"].shape[-1]
    dt = x.dtype

    def proj(d):
        p = layer[d]
        xp = jnp.einsum("bti,gi->btg", x, p["weight_ih"].astype(dt))
        return xp + (p["bias_ih"] + p["bias_hh"]).astype(dt)

    xp_f = jnp.swapaxes(proj("forward"), 0, 1)             # (T, B, 4H)
    xp_b = jnp.swapaxes(proj("reverse"), 0, 1)[::-1]       # flipped
    xs = jnp.stack([xp_f, xp_b], axis=1)                   # (T, 2, B, 4H)
    w_hh = jnp.stack([layer["forward"]["weight_hh"].T,
                      layer["reverse"]["weight_hh"].T]).astype(dt)  # (2, H, 4H)

    ys = _recurrence(xs, w_hh)                             # (T, 2, B, H)
    fwd = jnp.transpose(ys[:, 0], (1, 0, 2))               # (B, T, H)
    bwd = jnp.transpose(ys[::-1, 1], (1, 0, 2))            # un-flip
    return jnp.concatenate([fwd, bwd], axis=-1)


def bilstm(x: jnp.ndarray, layers: list[dict]) -> jnp.ndarray:
    """x: (B, T, C); layers[i] has keys weight_ih_l{i}/weight_hh_l{i}/
    bias_* plus *_reverse variants (torch.nn.LSTM state-dict layout,
    already split per layer as {'forward': {...}, 'reverse': {...}}).

    Returns (B, T, 2H): per-timestep concat of both directions, each
    subsequent layer consuming the previous concat — torch.nn.LSTM
    (bidirectional=True, num_layers=len(layers)) semantics.
    """
    h = x
    for layer in layers:
        h = _bilstm_layer_fused(h, layer)
    return h
