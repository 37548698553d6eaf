"""Demucs v3 LocalState: local attention with learned decay penalties.

TPU-first re-design of reference src/layers.cpp:533-721: the
quintuple C++ loops become three einsums plus a masked fp32 softmax.
Semantics (verified against the reference):

    dots[b,h,t,s] = <key[:,t], query[:,s]> / sqrt(D)
                    + sum_n decay_q[b,h,n,s] * decay_kernel[n, |t-s|]
    dots[t==s]    = -100
    weights       = softmax over t (the key axis)
    out[:, s]     = proj( sum_t weights[t,s] * content[:, t] ) + x[:, s]

with decay_q = sigmoid(query_decay(x)) / 2 and
decay_kernel[n, d] = -(n+1) * d / sqrt(ndecay)
(reference src/model.hpp:1363-1393).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .conv import conv1d

N_HEADS = 4
N_DECAY = 4


@functools.lru_cache(maxsize=None)
def decay_kernel(length: int, ndecay: int = N_DECAY) -> np.ndarray:
    """(ndecay, T, T) additive decay basis, a static constant per length."""
    idx = np.arange(length, dtype=np.float64)
    delta = np.abs(idx[:, None] - idx[None, :])  # (T, T) = |t - s|
    decays = np.arange(1, ndecay + 1, dtype=np.float64)
    kernel = -decays[:, None, None] * delta[None] / np.sqrt(ndecay)
    return kernel.astype(np.float32)


def local_attention(x: jnp.ndarray, p: dict, num_heads: int = N_HEADS,
                    ndecay: int = N_DECAY) -> jnp.ndarray:
    """x: (B, C, T) -> (B, C, T) with residual add."""
    B, C, T = x.shape
    H = num_heads
    D = C // H

    queries = conv1d(x, p["query"]["weight"], p["query"]["bias"])
    keys = conv1d(x, p["key"]["weight"], p["key"]["bias"])
    content = conv1d(x, p["content"]["weight"], p["content"]["bias"])
    decay_q = conv1d(x, p["query_decay"]["weight"], p["query_decay"]["bias"])

    q = queries.reshape(B, H, D, T)
    k = keys.reshape(B, H, D, T)
    c = content.reshape(B, H, D, T)
    dq = (jax.nn.sigmoid(decay_q) * 0.5).reshape(B, H, ndecay, T)

    scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32)).astype(x.dtype)
    dots = jnp.einsum("bhdt,bhds->bhts", k, q) * scale  # t = key, s = query
    kernel = jnp.asarray(decay_kernel(T, ndecay), x.dtype)
    dots = dots + jnp.einsum("bhns,nts->bhts", dq, kernel)

    eye = jnp.eye(T, dtype=bool)
    dots = jnp.where(eye[None, None], jnp.asarray(-100.0, dots.dtype), dots)

    weights = jax.nn.softmax(dots.astype(jnp.float32), axis=2).astype(x.dtype)
    out = jnp.einsum("bhts,bhdt->bhds", weights, c).reshape(B, C, T)
    out = conv1d(out, p["proj"]["weight"], p["proj"]["bias"])
    return x + out
