"""Flash kernel MXU/VPU overlap experiment at (64, 2688, 64).

v0: current kernel (full-S single pass: QK -> exp -> AV serial).
v1: 2-phase split over S: QK both halves first, shared max, then
    exp/AV per half — the scheduler can overlap AV(half 0) on the MXU
    with exp(half 1) on the VPU.
Scan protocol (gn_stats_micro)."""
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from jax.experimental import pallas as pl
from demucs_tpu.utils import enable_compile_cache
from demucs_tpu.ops.pallas.attention import flash_mha
enable_compile_cache()

STEPS, DISPATCHES = 20, 8
B, H, T, D = 8, 8, 2688, 64
BT = 896


def _kernel_2phase(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float):
    q = q_ref[0]
    S = k_ref.shape[1]
    h = S // 2
    k0 = k_ref[0, :h, :]
    k1 = k_ref[0, h:, :]
    lg0 = jax.lax.dot_general(q, k0, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32) * sm_scale
    lg1 = jax.lax.dot_general(q, k1, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32) * sm_scale
    m = jnp.maximum(jnp.max(lg0, -1, keepdims=True),
                    jnp.max(lg1, -1, keepdims=True))
    p0 = jnp.exp(lg0 - m)
    a0 = jax.lax.dot_general(p0.astype(v_ref.dtype), v_ref[0, :h, :],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    p1 = jnp.exp(lg1 - m)
    a1 = jax.lax.dot_general(p1.astype(v_ref.dtype), v_ref[0, h:, :],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    l = (jnp.sum(p0, -1, keepdims=True) + jnp.sum(p1, -1, keepdims=True))
    o_ref[0] = ((a0 + a1) / l).astype(o_ref.dtype)


@functools.partial(jax.jit)
def mha_2phase(q, k, v):
    Bh = B * H
    qf = q.reshape(Bh, T, D)
    kf = k.reshape(Bh, T, D)
    vf = v.reshape(Bh, T, D)
    out = pl.pallas_call(
        functools.partial(_kernel_2phase, sm_scale=1.0 / math.sqrt(D)),
        out_shape=jax.ShapeDtypeStruct((Bh, T, D), q.dtype),
        grid=(Bh, T // BT),
        in_specs=[
            pl.BlockSpec((1, BT, D), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, T, D), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, T, D), lambda b, t: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BT, D), lambda b, t: (b, t, 0)),
    )(qf, kf, vf)
    return out.reshape(B, H, T, D)


def timeit(fn, q, k, v):
    @jax.jit
    def run(q, c0):
        def body(c, _):
            o = fn(q + c, k, v)
            return (o.astype(jnp.float32).sum()
                    * jnp.float32(1e-30)).astype(q.dtype), ()
        c, _ = lax.scan(body, c0, None, length=STEPS)
        return c
    z = jnp.zeros((), q.dtype)
    float(run(q, z))
    t0 = time.perf_counter()
    c = z
    for _ in range(DISPATCHES):
        c = run(q, c)
    float(c)
    return (time.perf_counter() - t0) / (STEPS * DISPATCHES) * 1e3


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, T, D)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)) * 0.1, jnp.bfloat16)
    r0 = flash_mha(q, k, v)
    r1 = mha_2phase(q, k, v)
    err = float(jnp.abs(r0.astype(jnp.float32) - r1.astype(jnp.float32)).max())
    print("maxdiff", err, flush=True)
    print(f"v0 current {timeit(flash_mha, q, k, v):7.3f} ms", flush=True)
    print(f"v1 2-phase {timeit(mha_2phase, q, k, v):7.3f} ms", flush=True)


main()
