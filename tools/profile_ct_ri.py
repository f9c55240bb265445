"""Per-op budget of the ct_pd3o_256 and ri_admm_256 bench workloads
(VERDICT r3 weak #1 / builder candidate #4: un-profiled since the ragged
switch).  CSE-proof timing: 8 applies with input varied per repetition
inside ONE jit; relay dispatch floor measured and subtracted.

Usage (TPU): python tools/profile_ct_ri.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPS = 8


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


def measure(tag, fn, x, jax, jnp, floor):
    @jax.jit
    def loop(x):
        acc = jnp.float32(0)
        for i in range(REPS):
            acc = acc + jnp.sum(jnp.asarray(fn(x * (1 + 1e-4 * i))).astype(jnp.float32))
        return acc

    float(loop(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(x))
        ts.append(time.perf_counter() - t0)
    per = (min(ts) - floor) / REPS * 1e3
    print(f"  {tag}: {per:.3f} ms", flush=True)
    return per


def measure_chain(tag, step, mst0, jax, jnp, floor):
    """Time one m_step by chaining REPS dependent steps (no CSE possible)."""
    @jax.jit
    def loop(mst):
        for _ in range(REPS):
            mst = step(mst)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in mst.values()
                   if hasattr(v, "astype"))

    float(loop(mst0))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(mst0))
        ts.append(time.perf_counter() - t0)
    per = (min(ts) - floor) / REPS * 1e3
    print(f"  {tag}: {per:.3f} ms", flush=True)
    return per


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from pyxu_tpu.models.workloads import radio_interferometry, sparse_view_ct

    floor = _floor(jax, jnp)
    print(f"# dispatch floor: {floor*1e3:.1f} ms", flush=True)

    # ---------------- CT PD3O (256², 60 angles, FourierRadon) ----------------
    print("ct_pd3o_256:", flush=True)
    slv, fit_kw, aux = sparse_view_ct(shape=(256, 256), n_angles=60,
                                      method="fourier")
    x = jnp.asarray(np.random.default_rng(0).random((256, 256), np.float32))
    z = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 256, 256)).astype(np.float32))
    f, g, h, K = slv._f, slv._g, slv._h, slv._K
    t_grad = measure("f.grad (radon gram)", f.grad, x, jax, jnp, floor)
    t_gp = measure("g.prox (positivity)", lambda v: g.prox(v, 0.1), x, jax, jnp, floor)
    t_K = measure("K.apply (gradient)", K.apply, x, jax, jnp, floor)
    t_Kt = measure("K.adjoint", K.adjoint, z, jax, jnp, floor)
    t_hp = measure("h.fenchel_prox (L21)", lambda v: h.fenchel_prox(v, 0.5),
                   z, jax, jnp, floor)
    mst = slv.m_init(**fit_kw)
    t_step = measure_chain("m_step (whole)", slv.m_step, mst, jax, jnp, floor)
    print(f"  sum-of-parts ~{t_grad + t_gp + t_K + t_Kt + t_hp:.3f} ms; "
          f"m_step {t_step:.3f} ms -> fusion/overhead "
          f"{t_step - (t_grad + t_gp + t_K + t_Kt + t_hp):.3f} ms", flush=True)

    # ---------------- RI ADMM (256², 20k vis) ----------------
    print("ri_admm_256:", flush=True)
    slv, fit_kw, aux = radio_interferometry(shape=(256, 256), n_vis=20_000)
    f, hh = slv._f, slv._h
    dom = fit_kw["x0"].shape
    xr = jnp.asarray(np.random.default_rng(2).random(dom, np.float32))
    t_Q = measure("f-quadratic grad (toeplitz gram)",
                  f.grad if hasattr(f, "grad") else f.apply, xr, jax, jnp, floor)
    t_prox_f = measure("f.prox (24-iter CG)", lambda v: f.prox(v, 1.0),
                       xr, jax, jnp, floor)
    t_l1 = measure("h.prox (L1)", lambda v: hh.prox(v, 0.1), xr, jax, jnp, floor)
    mst = slv.m_init(**fit_kw)
    t_step = measure_chain("m_step (whole)", slv.m_step, mst, jax, jnp, floor)
    print(f"  -> CG dominates: {t_prox_f:.3f} of {t_step:.3f} ms; "
          f"gram/CG-iter ~{t_Q:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
