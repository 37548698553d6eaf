"""Flash kernel q-block sweep + dimension_semantics at the v4 shapes.
Scan protocol (gn_stats_micro). Self-attn (64,2688,64) and time
(64,1344,64)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from demucs_tpu.utils import enable_compile_cache
import demucs_tpu.ops.pallas.attention as A
enable_compile_cache()

STEPS, DISPATCHES = 20, 8


def timeit(bt_target, shape):
    BH, T, D = shape
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((8, 8, T, D)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((8, 8, T, D)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((8, 8, T, D)) * 0.1, jnp.bfloat16)
    orig = A._pick_block

    def patched(n, target=896):
        if n == T and target == 896:
            target = bt_target
        return orig(n, target)

    A._pick_block = patched
    try:
        @jax.jit
        def run(q, c0):
            def body(c, _):
                o = A.flash_mha(q + c, k, v)
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
    finally:
        A._pick_block = orig


def main():
    for T in (2688, 1344):
        for bt in (448, 672, 896, 1344, 2688):
            if T % bt and bt <= T:
                continue
            if bt > T:
                continue
            try:
                ms = timeit(bt, (64, T, 64))
                print(f"T={T} bt={bt:5d}: {ms:7.3f} ms", flush=True)
            except Exception as e:
                print(f"T={T} bt={bt:5d}: FAILED {str(e)[:80]}", flush=True)


main()
