import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from pyxu_tpu.models.workloads import radio_interferometry, sparse_view_ct
from pyxu_tpu.opt.stop import MaxIter

for name, factory, iters, seg in (
    ("ct_pd3o_256", lambda: sparse_view_ct(shape=(256, 256), n_angles=60, method="fourier"), 100, 100),
    ("ri_admm_256", lambda: radio_interferometry(shape=(256, 256), n_vis=20_000), 40, 40),
):
    slv, fit_kw, _ = factory()
    slv._stop_rate = seg
    crit = MaxIter(iters)
    slv.fit(stop_crit=crit, max_iter=iters, segment_size=seg, **fit_kw)
    jax.block_until_ready(slv.solution())
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        slv.fit(stop_crit=crit, max_iter=iters, segment_size=seg, **fit_kw)
        jax.block_until_ready(slv.solution())
        best = max(best, iters / (time.perf_counter() - t0))
    print(f"{name}: {best:.1f} it/s (seg={seg})", flush=True)
