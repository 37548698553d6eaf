"""Freq-decoder 3x3 rewrite formulations at the level-3 shape
(B=8, F=512, C=48 -> O=96, T=336), scan-of-N protocol (see
gn_stats_micro.py for why bare-op timing through the tunnel lies).

f1: current 9-tap sum (3 F-shifts x _tap_conv K=3) — re-reads the
    input per tap pair inside XLA's fusions.
f2: one conv_general_dilated with F-major dimension_numbers
    (spatial = (F, T), feature = C in place).
f3: NCHW conv with explicit transposes in/out.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from demucs_tpu.utils import enable_compile_cache
from demucs_tpu.ops import conv as C
enable_compile_cache()

STEPS, DISPATCHES = 30, 8
B, F, Cin, O, T = 8, 512, 48, 96, 336


def make_loop(fn, w):
    @jax.jit
    def run(x, c0):
        def body(c, _):
            y = fn(x + c, w)
            c2 = (y.astype(jnp.float32).sum() * jnp.float32(1e-30)
                  ).astype(x.dtype)
            return c2, ()
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


def f1(x, w):
    return C.freq_conv3x3_fmajor(x, w)


def f2(x, w):
    # lhs (B, F, C, T): batch=0, feature=2, spatial=(1, 3)
    # rhs (O, I, KH, KW): out=0, in=1, spatial=(2, 3)
    # out (B, F, O, T)
    dn = lax.ConvDimensionNumbers((0, 2, 1, 3), (0, 1, 2, 3), (0, 2, 1, 3))
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=dn)


def f3(x, w):
    xc = jnp.transpose(x, (0, 2, 1, 3))          # (B, C, F, T)
    y = lax.conv_general_dilated(
        xc, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=lax.conv_dimension_numbers(
            xc.shape, w.shape, ("NCHW", "OIHW", "NCHW")))
    return jnp.transpose(y, (0, 2, 1, 3))


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, F, Cin, T)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((O, Cin, 3, 3)) * 0.1, jnp.bfloat16)
    r1 = f1(x, w)
    for name, fn in [("f1 tap-sum", f1), ("f2 fmajor-conv", f2),
                     ("f3 nchw-conv", f3)]:
        try:
            r = fn(x, w)
            err = float(jnp.abs(r.astype(jnp.float32)
                                - r1.astype(jnp.float32)).max())
            ms = timeit(make_loop(fn, w), x)
            print(f"{name:16s} {ms:7.3f} ms/step  maxdiff {err:.2e}",
                  flush=True)
        except Exception as e:
            print(f"{name:16s} FAILED: {str(e)[:120]}", flush=True)


main()
