"""1-D NUFFT spread/interp timing: dense one-hot MXU path (mm1) vs the
XLA scatter/gather path, CSE-proof (see BASELINE.md "Measurement
correction").  Usage (TPU): python tools/nufft1d_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPS = 8
M = 200_000
N = 4096
EPS = 1e-6


def measure(tag, build_fn, a0, b0, jax, jnp, floor):
    @jax.jit
    def loop(a, b):
        acc = jnp.float32(0)
        for i in range(REPS):
            acc = acc + build_fn(a * (1 + 1e-4 * i), b * (1 - 1e-4 * i))
        return acc

    float(loop(a0, b0))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(a0, b0))
        ts.append(time.perf_counter() - t0)
    print(f"{tag}: {(min(ts) - floor) / REPS * 1e3:.2f} ms/apply",
          flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from pyxu_tpu.operator.linop.nufft import NUFFT

    rng = np.random.default_rng(0)
    x = rng.uniform(-np.pi, np.pi, (M, 1))

    f = jax.jit(lambda a: a.sum())
    xf = jnp.ones((8, 8), jnp.float32)
    float(f(xf))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(xf))
        ts.append(time.perf_counter() - t0)
    floor = min(ts)
    print(f"# dispatch floor {floor*1e3:.1f} ms", flush=True)

    cr = jnp.asarray(rng.standard_normal(M).astype(np.float32))
    ci = jnp.asarray(rng.standard_normal(M).astype(np.float32))

    for tag, env in (("mm1", {"PYXU_TPU_NUFFT_MM": "1"}),
                     ("scatter", {"PYXU_TPU_NUFFT_MM": "0"})):
        os.environ.update(env)
        op = NUFFT.type1(x, (N,), isign=+1, eps=EPS)

        def t1(a, b, op=op):
            return op.apply(jnp.stack([a, b], axis=-1)).sum()

        def t1adj(a, b, op=op):
            m = jnp.stack([jnp.cos(jnp.arange(N) * a[0]),
                           jnp.sin(jnp.arange(N) * b[0])], axis=-1)
            return op.adjoint(m).sum()

        measure(f"{tag} type1", t1, cr, ci, jax, jnp, floor)
        measure(f"{tag} type1adj", t1adj, cr, ci, jax, jnp, floor)


main()
