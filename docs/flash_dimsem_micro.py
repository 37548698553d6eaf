"""Flash kernel with parallel dimension_semantics vs default, at the v4
self-attention shape. Scan protocol (gn_stats_micro)."""
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from demucs_tpu.utils import enable_compile_cache
from demucs_tpu.ops.pallas.attention import _mha_kernel, flash_mha
enable_compile_cache()

STEPS, DISPATCHES = 20, 8
B, H, T, D = 8, 8, 2688, 64
BT = 896


@jax.jit
def mha_parallel(q, k, v):
    Bh = B * H
    qf = q.reshape(Bh, T, D)
    kf = k.reshape(Bh, T, D)
    vf = v.reshape(Bh, T, D)
    out = pl.pallas_call(
        functools.partial(_mha_kernel, bs=T, sm_scale=1.0 / math.sqrt(D)),
        out_shape=jax.ShapeDtypeStruct((Bh, T, D), q.dtype),
        grid=(Bh, T // BT),
        in_specs=[
            pl.BlockSpec((1, BT, D), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, T, D), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, T, D), lambda b, t: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BT, D), lambda b, t: (b, t, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
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
    r1 = mha_parallel(q, k, v)
    print("maxdiff", float(jnp.abs(r0.astype(jnp.float32)
                                   - r1.astype(jnp.float32)).max()), flush=True)
    print(f"default  {timeit(flash_mha, q, k, v):7.3f} ms", flush=True)
    print(f"parallel {timeit(mha_parallel, q, k, v):7.3f} ms", flush=True)


main()
