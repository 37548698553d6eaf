"""Time-branch strided convs + transposed convs: current chunked/phase
einsum forms vs the plain conv emitter (NCT). Shapes = v4 tencoder /
tdecoder layers. Scan protocol (gn_stats_micro)."""
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
# tencoder: (T, Cin, Cout), K=8 s=4 p=2
ENC = [(344064, 2, 48), (86016, 48, 96), (21504, 96, 192), (5376, 192, 384)]
# tdecoder conv_tr (Cin -> Cout), K=8 s=4, trim 2+2 via slice
DEC = [(1344, 384, 192), (5375, 192, 96), (21499, 96, 48)]


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


def enc_cur(x, w):
    return C.conv1d(x, w, stride=4, padding=2)


def enc_emit(x, w):
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (4,), [(2, 2)],
        dimension_numbers=lax.conv_dimension_numbers(
            x.shape, w.shape, ("NCH", "OIH", "NCH")))


def dec_cur(x, w):
    return C.conv_transpose1d(x, w, stride=4)[:, :, 2:-2]


def dec_emit(x, w):
    wf = jnp.flip(w, 2).swapaxes(0, 1)
    return lax.conv_general_dilated(
        x, wf.astype(x.dtype), (1,), [(5, 5)], lhs_dilation=(4,),
        dimension_numbers=lax.conv_dimension_numbers(
            x.shape, wf.shape, ("NCH", "OIH", "NCH")))


def main():
    rng = np.random.default_rng(0)
    for T, ci, co in ENC:
        x = jnp.asarray(rng.standard_normal((8, ci, T)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((co, ci, 8)) * 0.1, jnp.bfloat16)
        err = float(jnp.abs(enc_cur(x, w).astype(jnp.float32)
                            - enc_emit(x, w).astype(jnp.float32)).max())
        print(f"enc T={T:6d} {ci:3d}->{co:3d}: chunked "
              f"{timeit(enc_cur, w, x):7.3f} | emitter "
              f"{timeit(enc_emit, w, x):7.3f} ms (diff {err:.1e})",
              flush=True)
    for T, ci, co in DEC:
        x = jnp.asarray(rng.standard_normal((8, ci, T)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((ci, co, 8)) * 0.1, jnp.bfloat16)
        err = float(jnp.abs(dec_cur(x, w).astype(jnp.float32)
                            - dec_emit(x, w).astype(jnp.float32)).max())
        print(f"dec T={T:6d} {ci:3d}->{co:3d}: phase   "
              f"{timeit(dec_cur, w, x):7.3f} | emitter "
              f"{timeit(dec_emit, w, x):7.3f} ms (diff {err:.1e})",
              flush=True)


main()
