"""GN(1) stat reduce A/B. Protocol per CLAUDE.md: dispatch MANY steps,
fence ONCE (host fetch ~37 ms — must amortize over all steps).

Each variant: jit(scan of 50 dependent stat passes), dispatched 8x
back-to-back, one float() fence at the end. Per-step = total/400."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from demucs_tpu.utils import enable_compile_cache
enable_compile_cache()

STEPS, DISPATCHES = 50, 8
SHAPES = [(8, 2688, 512), (8, 1344, 512)]


def make_loop(stats_fn):
    @jax.jit
    def run(x, c0):
        def body(c, _):
            mean, var = stats_fn(x + c)
            c2 = (mean.sum() + var.sum()) * jnp.float32(1e-20)
            return c2.astype(x.dtype), ()
        c, _ = lax.scan(body, c0, None, length=STEPS)
        return c
    return run


def timeit(run, x):
    c = run(x, jnp.zeros((), x.dtype))
    float(c)  # compile + warm + fence
    t0 = time.perf_counter()
    c = jnp.zeros((), x.dtype)
    for _ in range(DISPATCHES):
        c = run(x, c)
    float(c)  # single fence
    return (time.perf_counter() - t0) / (STEPS * DISPATCHES) * 1e3


def main():
    rng = np.random.default_rng(0)
    for shape in SHAPES:
        B = shape[0]
        n = shape[1] * shape[2]
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        nbytes = n * B * 2

        def v0(x):  # current two-pass flat
            xf = x.astype(jnp.float32).reshape(B, -1)
            mean = xf.mean(-1)
            var = jnp.square(xf - mean[:, None]).mean(-1)
            return mean, var

        def v1(x):  # one-pass flat
            xf = x.astype(jnp.float32).reshape(B, -1)
            s = xf.sum(-1)
            ss = jnp.square(xf).sum(-1)
            return s / n, ss / n - jnp.square(s / n)

        def v3(x):  # one-pass staged over token axis
            xf = x.astype(jnp.float32)
            s = xf.sum(1)
            ss = jnp.square(xf).sum(1)
            return s.sum(-1) / n, ss.sum(-1) / n - jnp.square(s.sum(-1) / n)

        def v6(x):  # one-pass 4d-staged
            xf = x.astype(jnp.float32).reshape(B, -1, 8, 512)
            s = xf.sum((2, 3))
            ss = jnp.square(xf).sum((2, 3))
            return s.sum(-1) / n, ss.sum(-1) / n - jnp.square(s.sum(-1) / n)

        def v7(x):  # matmul-ones on MXU
            xf = x.reshape(B, -1)
            ones = jnp.ones((xf.shape[1],), jnp.bfloat16)
            kw = dict(preferred_element_type=jnp.float32)
            s = jnp.einsum("bn,n->b", xf, ones, **kw)
            ss = jnp.einsum("bn,bn->b", xf, xf, **kw)
            return s / n, ss / n - jnp.square(s / n)

        print(f"shape {shape} ({nbytes/1e6:.0f} MB):", flush=True)
        for name, fn in [("v0 two-pass flat", v0), ("v1 one-pass flat", v1),
                         ("v3 one-pass token-staged", v3),
                         ("v6 one-pass 4d-staged", v6),
                         ("v7 matmul-ones", v7)]:
            ms = timeit(make_loop(fn), x)
            print(f"  {name:26s} {ms:7.3f} ms/step ({nbytes/ms/1e6:5.0f} GB/s"
                  f" one-read equiv)", flush=True)


main()
