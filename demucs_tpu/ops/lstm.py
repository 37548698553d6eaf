"""Bidirectional multi-layer LSTM as lax.scan (PyTorch-exact gates).

TPU-first re-design of reference src/lstm.cpp:36-147: the input
projection for the whole sequence is hoisted out of the recurrence as
one big MXU matmul; the scan body only carries the (B, H) recurrent
matmul and the fused gate pointwise ops. Gate order i, f, g, o matches
torch.nn.LSTM (reference src/lstm.cpp:27-34).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _lstm_direction(x: jnp.ndarray, w_ih: jnp.ndarray, w_hh: jnp.ndarray,
                    b_ih: jnp.ndarray, b_hh: jnp.ndarray,
                    reverse: bool) -> jnp.ndarray:
    """x: (B, T, IN) -> (B, T, H) for one direction."""
    B = x.shape[0]
    H = w_hh.shape[-1]
    # hoisted input projection: (B, T, 4H)
    xp = jnp.einsum("bti,gi->btg", x, w_ih.astype(x.dtype))
    xp = xp + (b_ih + b_hh).astype(x.dtype)
    xs = jnp.swapaxes(xp, 0, 1)  # (T, B, 4H)
    w_hh_t = w_hh.T.astype(x.dtype)  # (H, 4H)

    def step(carry, xt):
        h, c = carry
        gates = xt + h @ w_hh_t
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    h0 = jnp.zeros((B, H), x.dtype)
    c0 = jnp.zeros((B, H), x.dtype)
    _, ys = lax.scan(step, (h0, c0), xs, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)  # (B, T, H)


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
        fwd = _lstm_direction(
            h, layer["forward"]["weight_ih"], layer["forward"]["weight_hh"],
            layer["forward"]["bias_ih"], layer["forward"]["bias_hh"],
            reverse=False,
        )
        bwd = _lstm_direction(
            h, layer["reverse"]["weight_ih"], layer["reverse"]["weight_hh"],
            layer["reverse"]["bias_ih"], layer["reverse"]["bias_hh"],
            reverse=True,
        )
        h = jnp.concatenate([fwd, bwd], axis=-1)
    return h
