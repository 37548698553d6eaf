"""Strided freq convs + transposed convs: current chunked/phase einsum
forms vs the plain conv emitter with F-major dimension_numbers.
Shapes = the v4 encoder/decoder layers. Scan protocol (gn_stats_micro).
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
B, T = 8, 336
# (F, Cin, Cout) per encoder level; K=8 s=4 p=2 (level0 pads 2 -> 516)
ENC = [(2048, 4, 48), (512, 48, 96), (128, 96, 192), (32, 192, 384)]
# freq decoders: conv_tr (Cin -> Cout, KH=8, s=4), trim 2+2
DEC = [(8, 384, 192), (32, 192, 96), (128, 96, 48), (512, 48, 16)]


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


def timeit(fn, w, x):
    run = make_loop(fn, w)
    z = jnp.zeros((), x.dtype)
    float(run(x, z))
    t0 = time.perf_counter()
    c = z
    for _ in range(DISPATCHES):
        c = run(x, c)
    float(c)
    return (time.perf_counter() - t0) / (STEPS * DISPATCHES) * 1e3


DN_FM = lax.ConvDimensionNumbers((0, 2, 1, 3), (0, 1, 2, 3), (0, 2, 1, 3))


def enc_cur(x, w):
    return C.freq_conv_fmajor(x, w, stride=4, padding=2)


def enc_emit(x, w):
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (4, 1), [(2, 2), (0, 0)],
        dimension_numbers=DN_FM)


def dec_cur(x, w):
    return C.freq_convtr_fmajor(x, w, stride=4, padding=2)


def dec_emit(x, w):
    # ConvTranspose via lhs_dilation on the F axis, F-major dims;
    # padding k-1-p = 5 with the 2+2 output trim folded in
    wf = jnp.flip(w[:, :, :, :], 2).swapaxes(0, 1)   # (O, I, KH, 1)
    return lax.conv_general_dilated(
        x, wf.astype(x.dtype), (1, 1), [(5, 5), (0, 0)],
        lhs_dilation=(4, 1),
        dimension_numbers=DN_FM)


def main():
    rng = np.random.default_rng(0)
    for F, ci, co in ENC:
        x = jnp.asarray(rng.standard_normal((B, F, ci, T)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((co, ci, 8, 1)) * 0.1,
                        jnp.bfloat16)
        err = float(jnp.abs(enc_cur(x, w).astype(jnp.float32)
                            - enc_emit(x, w).astype(jnp.float32)).max())
        t1 = timeit(enc_cur, w, x)
        t2 = timeit(enc_emit, w, x)
        print(f"enc F={F:5d} {ci:3d}->{co:3d}: chunked {t1:7.3f} | "
              f"emitter {t2:7.3f} ms  (diff {err:.1e})", flush=True)
    for F, ci, co in DEC:
        x = jnp.asarray(rng.standard_normal((B, F, ci, T)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((ci, co, 8, 1)) * 0.1,
                        jnp.bfloat16)
        err = float(jnp.abs(dec_cur(x, w).astype(jnp.float32)
                            - dec_emit(x, w).astype(jnp.float32)).max())
        t1 = timeit(dec_cur, w, x)
        t2 = timeit(dec_emit, w, x)
        print(f"dec F={F:5d} {ci:3d}->{co:3d}: phase   {t1:7.3f} | "
              f"emitter {t2:7.3f} ms  (diff {err:.1e})", flush=True)


main()
