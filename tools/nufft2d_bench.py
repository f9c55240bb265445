"""2-D NUFFT spread/interp/type-1 timing: XLA slab vs Pallas slab vs
strip2, CSE-proof (input varied per repetition inside ONE jit; relay
dispatch floor measured and subtracted).  See BASELINE.md "Measurement
correction".

Usage (TPU): python tools/nufft2d_bench.py [T1 ...]
Env: PYXU_TPU_NUFFT_STRIP2_T1 set per-plan inside.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPS = 8
M = 200_000
N = (512, 512)
EPS = 1e-6


def _floor(jax, jnp):
    x = jnp.ones((8, 8), jnp.float32)
    f = jax.jit(lambda a: a.sum())
    float(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def measure(tag, build_fn, cr, ci, jax, jnp, floor):
    """build_fn(creal, cimag) -> scalar; CSE-proof REPS-unrolled."""

    @jax.jit
    def loop(cr, ci):
        acc = jnp.float32(0)
        for i in range(REPS):
            acc = acc + build_fn(cr * (1 + 1e-4 * i), ci * (1 - 1e-4 * i))
        return acc

    float(loop(cr, ci))               # warm (compile)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(cr, ci))
        ts.append(time.perf_counter() - t0)
    per = (min(ts) - floor) / REPS * 1e3
    print(f"{tag}: {per:.2f} ms/apply", flush=True)
    return per


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from pyxu_tpu.operator.linop import nufft as nf
    from pyxu_tpu.operator.linop.nufft import NUFFT

    rng = np.random.default_rng(0)
    x = rng.uniform(-np.pi, np.pi, (M, 2))
    crh = rng.standard_normal(M).astype(np.float32)
    cih = rng.standard_normal(M).astype(np.float32)
    cr = jnp.asarray(crh)
    ci = jnp.asarray(cih)
    gr = jnp.asarray(rng.standard_normal((1024, 1024)).astype(np.float32))
    gi = jnp.asarray(rng.standard_normal((1024, 1024)).astype(np.float32))
    fr = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    fi = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    floor = _floor(jax, jnp)
    print(f"# dispatch floor {floor*1e3:.1f} ms", flush=True)

    args = [a for a in sys.argv[1:]
            if a not in ("--spread-only", "--interp-only")]
    spread_only = "--spread-only" in sys.argv[1:]
    interp_only = "--interp-only" in sys.argv[1:]
    # hybrid plans route spread -> slab kernel unless forced, so strip2
    # spread legs must set the force switch to measure what the label says
    variants = [("strip2_T1_" + t, {"PYXU_TPU_NUFFT_STRIP2_T1": t,
                                    "PYXU_TPU_NUFFT_STRIP2_SPREAD": "1"})
                for t in args]          # no args -> hybrid + slab only
    variants += [("hybrid_default", {}),
                 ("slab_pallas", {"PYXU_TPU_NUFFT_STRIP2": "0"})]

    for tag, env in variants:
        for k, v in env.items():
            os.environ[k] = v
        op = NUFFT.type1(x, N, isign=+1, eps=EPS)
        plan = op._mm3
        if "strip2" in tag and (plan is None or plan.strip2 is None):
            print(f"{tag}: strip2 plan REFUSED", flush=True)
            continue

        def spread_s(a, b, plan=plan, op=op):
            g = nf._spread(a + 1j * b, op._idxs, op._wts, op._nf, plan)
            return g.real.sum() + g.imag.sum()

        def interp_s(a, b, plan=plan, op=op):
            # perturb the grid with the varying scalars so reps differ
            g = (gr * (1 + a[0])) + 1j * (gi * (1 + b[0]))
            v = nf._interp(g, op._idxs, op._wts, plan)
            return v.real.sum() + v.imag.sum()

        def type1_s(a, b, op=op):
            out = op.apply(jnp.stack([a, b], axis=-1))
            return out.sum()

        def type1adj_s(a, b, op=op):
            # modes -> points (the type-2 compute path: interp stage)
            m = jnp.stack([fr * (1 + a[0]), fi * (1 + b[0])], axis=-1)
            return op.adjoint(m).sum()

        if not interp_only:
            measure(f"{tag} spread", spread_s, cr, ci, jax, jnp, floor)
        if not spread_only:
            measure(f"{tag} interp", interp_s, cr, ci, jax, jnp, floor)
        if not (spread_only or interp_only):
            measure(f"{tag} type1", type1_s, cr, ci, jax, jnp, floor)
            measure(f"{tag} type1adj", type1adj_s, cr, ci, jax, jnp, floor)
        for k in env:
            del os.environ[k]


main()
