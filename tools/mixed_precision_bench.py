"""Mixed-precision state storage A/B on the headline 4K TV workload.

Runs the bench-identical Condat-Vu solve in three state-precision variants
and reports steady-state iter/s plus the final objective (always evaluated
at f32):

  f32      — x f32, z f32 (the headline configuration)
  bf16z    — x f32, z bf16  (dual storage halved: 7 -> 5 frame-traffics)
  bf16     — x bf16, z bf16 (full state halved: 7 -> ~4 frame-traffics)

All arithmetic runs at f32 inside the fused Pallas kernel; bf16 is storage
only (one rounding per state write per iteration).  See BASELINE.md
"Mixed precision".

Run (TPU): timeout 3600 python tools/mixed_precision_bench.py
"""

import sys
import time

import numpy as np


def main(n_iters=1000):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from pyxu_tpu.operator.func import L21Norm, SquaredL2Norm
    from pyxu_tpu.operator.linop import Gradient, Stencil
    from pyxu_tpu.opt.solver import CondatVu
    from pyxu_tpu.opt.stop import MaxIter

    H, W, LAM, KS, SIG = 2160, 3840, 0.01, 9, 2.0
    x = np.random.default_rng(0).random((H, W), dtype=np.float32)
    k = np.exp(-0.5 * ((np.arange(KS) - (KS - 1) / 2) / SIG) ** 2)
    k1 = (k / k.sum()).astype(np.float32)
    import scipy.ndimage as snd
    y = snd.correlate1d(snd.correlate1d(x, k1, axis=0, mode="reflect"),
                        k1, axis=1, mode="reflect")
    y += 0.01 * np.random.default_rng(0).standard_normal((H, W)).astype(np.float32)
    y = y.astype(np.float32)

    c = (KS - 1) // 2
    K = Stencil((H, W), [jnp.asarray(k1), jnp.asarray(k1)], [c, c],
                mode="symmetric")
    f = 0.5 * SquaredL2Norm((H, W)).asloss(jnp.asarray(y)) * K
    D = Gradient((H, W), mode="symmetric")
    h = LAM * L21Norm((2, H, W), l2_axis=0)

    @jax.jit
    def objective(xs):
        xs = xs.astype(jnp.float32)
        return f.apply(xs) + h.apply(D.apply(xs))

    results = {}
    for name, xdt, zdt in (("f32", jnp.float32, None),
                           ("bf16z", jnp.float32, jnp.bfloat16),
                           ("bf16", jnp.bfloat16, jnp.bfloat16)):
        slv = CondatVu(f=f, h=h, K=D, stop_rate=n_iters)
        crit = MaxIter(n_iters)
        x0 = jnp.asarray(y).astype(xdt)
        t0 = time.perf_counter()
        slv.fit(x0=x0, stop_crit=crit, max_iter=n_iters,
                segment_size=n_iters, dual_dtype=zdt)
        jax.block_until_ready(slv.solution())
        print(f"# {name}: warm fit (incl. compile) {time.perf_counter()-t0:.1f}s",
              flush=True)
        dt = []
        for _ in range(2):
            t0 = time.perf_counter()
            slv.fit(x0=x0, stop_crit=crit, max_iter=n_iters,
                    segment_size=n_iters, dual_dtype=zdt)
            jax.block_until_ready(slv.solution())
            dt.append(time.perf_counter() - t0)
        obj = float(objective(slv.solution()))
        it_s = n_iters / min(dt)
        results[name] = (it_s, obj)
        print(f"{name}: {it_s:.1f} iter/s, objective {obj:.2f}", flush=True)

    f32_obj = results["f32"][1]
    for name, (it_s, obj) in results.items():
        print(f"{name}: {it_s:8.1f} it/s  obj {obj:12.2f}  "
              f"rel-obj-gap {(obj - f32_obj) / abs(f32_obj):+.2e}  "
              f"speedup x{it_s / results['f32'][0]:.3f}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    main(n)
