"""K=3 stride-1 conv formulations at the DConv compress shapes:
folded freq level-0 (4096, 48->6, 336) dil 1/2 and time level-0
(8, 48->6, 85995) dil 1/2. tap-conv (current) vs conv emitter.
Scan protocol per docs/gn_stats_micro.py."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from demucs_tpu.utils import enable_compile_cache
from demucs_tpu.ops.conv import _tap_conv, _DN1
enable_compile_cache()

STEPS, DISPATCHES = 30, 8
CASES = [((4096, 48, 336), 6, 1), ((4096, 48, 336), 6, 2),
         ((8, 48, 85995), 6, 1), ((8, 48, 85995), 6, 2),
         ((8, 96, 21499), 12, 1), ((8, 192, 5375), 24, 2),
         ((8, 384, 1344), 48, 1), ((1024, 96, 336), 12, 1)]


def make_loop(fn, w):
    @jax.jit
    def run(x, c0):
        def body(c, _):
            y = fn(x + c, w)
            return (y.astype(jnp.float32).sum() * jnp.float32(1e-30)
                    ).astype(x.dtype), ()
        c, _ = lax.scan(body, c0, None, length=STEPS)
        return c
    return run


def timeit(run, x):
    z = jnp.zeros((), x.dtype)
    float(run(x, z))
    t0 = time.perf_counter()
    c = z
    for _ in range(DISPATCHES):
        c = run(x, c)
    float(c)
    return (time.perf_counter() - t0) / (STEPS * DISPATCHES) * 1e3


def main():
    rng = np.random.default_rng(0)
    for shape, O, dil in CASES:
        B, C, T = shape
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((O, C, 3)) * 0.1, jnp.bfloat16)

        def tap(x, w, dil=dil):
            return _tap_conv(x, w, dil, dil)

        def emitter(x, w, dil=dil):
            return lax.conv_general_dilated(
                x, w.astype(x.dtype), (1,), [(dil, dil)],
                rhs_dilation=(dil,),
                dimension_numbers=lax.conv_dimension_numbers(
                    x.shape, w.shape, _DN1))

        t1 = timeit(make_loop(tap, w), x)
        t2 = timeit(make_loop(emitter, w), x)
        print(f"{shape} dil={dil}: tap {t1:7.3f} ms | emitter {t2:7.3f} ms",
              flush=True)


main()
