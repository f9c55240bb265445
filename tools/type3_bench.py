"""2-D type-3 NUFFT forward/adjoint timing, CSE-proof (see BASELINE.md
"Measurement correction"): repeats inside ONE jit with per-rep input
scaling, dispatch floor measured and subtracted.

Matches the BASELINE "type-3 centering" scenario: M = K = 100k, 2-D,
off-center coordinate clouds, eps=1e-6.

Usage (TPU): python tools/type3_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPS = 8
M = K = 100_000
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
    per = (min(ts) - floor) / REPS * 1e3
    print(f"{tag}: {per:.2f} ms/apply", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from pyxu_tpu.operator.linop.nufft import NUFFT

    rng = np.random.default_rng(0)
    # off-center clouds (the BASELINE centering scenario); --d3 runs the
    # 3-D variant (smaller M, eps=1e-4: the 3-D fine grid is volumetric)
    if "--d3" in sys.argv[1:]:
        m = 50_000
        x = rng.normal(3.0, 1.0, (m, 3))
        z = rng.normal(10.0, 4.0, (m, 3))
        op = NUFFT.type3(x, z, isign=-1, eps=1e-4)
    else:
        m = M
        x = rng.normal(3.0, 1.0, (M, 2))
        z = rng.normal(40.0, 12.0, (K, 2))
        op = NUFFT.type3(x, z, isign=-1, eps=EPS)
    print(f"# fine grid {getattr(op, '_nf', '?')}", flush=True)

    xf = jnp.ones((8, 8), jnp.float32)
    f = jax.jit(lambda a: a.sum())
    float(f(xf))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(xf))
        ts.append(time.perf_counter() - t0)
    floor = min(ts)
    print(f"# dispatch floor {floor*1e3:.1f} ms", flush=True)

    cr = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    ci = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    fr = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    fi = jnp.asarray(rng.standard_normal(m).astype(np.float32))

    def fwd(a, b):
        return op.apply(jnp.stack([a, b], axis=-1)).sum()

    def adj(a, b):
        return op.adjoint(jnp.stack([a, b], axis=-1)).sum()

    measure("type3 forward", fwd, cr, ci, jax, jnp, floor)
    measure("type3 adjoint", adj, fr, fi, jax, jnp, floor)


main()
