"""On-device solution distance: f32 vs bf16-dual 4K TV solves (no large
device->host transfers — the relay chokes on them)."""
import numpy as np, time

def main():
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
    y = (y + 0.01 * np.random.default_rng(0).standard_normal((H, W))).astype(np.float32)
    c = (KS - 1) // 2
    K = Stencil((H, W), [jnp.asarray(k1), jnp.asarray(k1)], [c, c], mode="symmetric")
    f = 0.5 * SquaredL2Norm((H, W)).asloss(jnp.asarray(y)) * K
    D = Gradient((H, W), mode="symmetric")
    h = LAM * L21Norm((2, H, W), l2_axis=0)
    sols = {}
    for name, zdt in (("f32", None), ("bf16z", jnp.bfloat16)):
        slv = CondatVu(f=f, h=h, K=D, stop_rate=1000)
        slv.fit(x0=jnp.asarray(y), stop_crit=MaxIter(1000), max_iter=1000,
                segment_size=1000, dual_dtype=zdt)
        sols[name] = slv.solution()
    d = jax.jit(lambda a, b: jnp.linalg.norm(a - b) / jnp.linalg.norm(b))
    print("rel solution distance bf16z vs f32:",
          float(d(sols["bf16z"], sols["f32"])))
    # distance of each to a longer (3000-iter) f32 "converged" reference
    slv = CondatVu(f=f, h=h, K=D, stop_rate=3000)
    slv.fit(x0=jnp.asarray(y), stop_crit=MaxIter(3000), max_iter=3000,
            segment_size=1000)
    ref = slv.solution()
    for name in ("f32", "bf16z"):
        print(f"{name} vs 3000-iter ref:", float(d(sols[name], ref)))

main()
