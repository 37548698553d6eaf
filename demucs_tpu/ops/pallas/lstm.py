"""Fused BiLSTM recurrence kernel: the whole scan in one VMEM-resident
pallas program.

The XLA lax.scan form (ops/lstm.py) is latency-bound at ~0.46 us per
sequential step — and the per-HLO profile shows each step re-reading
the loop-invariant W_hh (~0.6-2.4 MB bf16) from HBM (the r5 v3 profile:
8 while-loops totaling 1.15 ms of a 7.66 ms step,
docs/profile_r5_v3_b1.json). Here the precomputed input projections
(the big hoisted GEMM stays in XLA), both directions' W_hh, and the
output sequence ALL live in VMEM for the whole recurrence: at Demucs
shapes (T=336, H=192 / T=168, H=384, B<=8) everything fits the 16 MB
budget, so the loop touches HBM exactly twice (load xs/W, store ys).

Forward-only custom call; ops/lstm.py wraps it in a custom_vjp whose
backward recomputes through the XLA scan (training keeps its current
path; the kernel is an inference-side win).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _bilstm_kernel(xs_ref, whh_ref, ys_ref, *, T: int):
    """xs_ref: (T, 2, B, 4H) projected inputs (+biases) — forward dir at
    [:, 0], time-flipped reverse dir at [:, 1]; whh_ref: (2, H, 4H);
    ys_ref: (T, 2, B, H)."""
    _, _, B, H4 = xs_ref.shape
    H = H4 // 4
    w_f = whh_ref[0]                                  # (H, 4H)
    w_b = whh_ref[1]

    def step(t, carry):
        # h is carried in the input dtype (it feeds the MXU matmul);
        # the gate pointwise math and the cell state run in f32 —
        # Mosaic requires a 32-bit matmul accumulator anyway, and its
        # bf16 transcendental lowering is broken (vector.broadcast
        # element-type mismatch), so f32 here is both required and
        # numerically kinder than the scan's bf16 pointwise chain.
        h_f, c_f, h_b, c_b = carry
        xt = xs_ref[t]                                # (2, B, 4H)
        g_f = xt[0].astype(jnp.float32) + jax.lax.dot_general(
            h_f, w_f, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        g_b = xt[1].astype(jnp.float32) + jax.lax.dot_general(
            h_b, w_b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        def cell(gates, c):
            i = jax.nn.sigmoid(gates[:, :H])
            f = jax.nn.sigmoid(gates[:, H:2 * H])
            g = jnp.tanh(gates[:, 2 * H:3 * H])
            o = jax.nn.sigmoid(gates[:, 3 * H:])
            c = f * c + i * g
            return o * jnp.tanh(c), c

        hf32, c_f = cell(g_f, c_f)
        hb32, c_b = cell(g_b, c_b)
        h_f = hf32.astype(xs_ref.dtype)
        h_b = hb32.astype(xs_ref.dtype)
        ys_ref[t, 0] = h_f.astype(ys_ref.dtype)
        ys_ref[t, 1] = h_b.astype(ys_ref.dtype)
        return h_f, c_f, h_b, c_b

    B_, H_ = xs_ref.shape[2], H
    zh = jnp.zeros((B_, H_), xs_ref.dtype)
    zc = jnp.zeros((B_, H_), jnp.float32)
    jax.lax.fori_loop(0, T, step, (zh, zc, zh, zc))


@functools.partial(jax.jit, static_argnames=("interpret",))
def bilstm_recurrence(xs: jnp.ndarray, w_hh: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """xs: (T, 2, B, 4H) projected inputs (x@W_ih^T + biases; dir 1
    time-flipped), w_hh: (2, H, 4H) -> ys (T, 2, B, H) hidden states
    (dir 1 still in flipped time order — caller un-flips)."""
    T, two, B, H4 = xs.shape
    assert two == 2
    H = w_hh.shape[1]
    return pl.pallas_call(
        functools.partial(_bilstm_kernel, T=T),
        out_shape=jax.ShapeDtypeStruct((T, 2, B, H), xs.dtype),
        interpret=interpret,
    )(xs, w_hh)
