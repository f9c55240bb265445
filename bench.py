"""North-star benchmark: 4K TV-regularized deconvolution with Condat-Vu.

Workload config 2 of BASELINE.json: Gaussian-blur forward model, isotropic-TV
regularizer (L21 of the gradient), Condat-Vu primal-dual iterations.

Metric: solver iterations/second, steady-state (compile excluded).

``vs_baseline``: the reference framework (AdriaJ/pyxu) cannot run in this
image (its numba/dask deps are absent), so the baseline is an equivalent
NumPy implementation of the *same* Condat-Vu iteration — scipy.ndimage
correlations + numpy BLAS-1, which is exactly Pyxu's default NumPy-backend
compute path per iteration (reference: src/pyxu/opt/solver/pds.py:429-520,
operator applies dispatch to numpy/scipy).  Measured on this host's CPU each
run; iters/s(ours) / iters/s(numpy-cpu) is reported.

Prints ONE JSON line.
"""

import json
import time

import numpy as np


# --------------------------------------------------------------------------
# Problem setup (shared by both implementations)
# --------------------------------------------------------------------------
H, W = 2160, 3840  # 4K UHD
LAM = 0.01
SIGMA_BLUR = 2.0
KSIZE = 9
# Timed iterations: every fit() pays one relay host round-trip (~40-65 ms
# dispatch + packed fetch — BASELINE.md "Measurement correction"), so short
# fits under-report steady-state throughput by that constant (200 iters at
# 1.12 ms/iter read ~15% low).  1000 iterations keep the device program at
# ~1.1 s — far below the worker-watchdog threshold (minutes) — and the
# per-fit overhead under 5%.
N_ITERS = 1000         # timed iterations (ours)
N_ITERS_BASE = 3       # timed iterations (numpy baseline; extrapolated)


def gauss_kernel1d(sigma, n):
    x = np.arange(n) - (n - 1) / 2
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def make_data():
    rng = np.random.default_rng(0)
    x = rng.random((H, W), dtype=np.float32)
    k1 = gauss_kernel1d(SIGMA_BLUR, KSIZE)
    import scipy.ndimage as snd
    y = snd.correlate1d(snd.correlate1d(x, k1, axis=0, mode="reflect"),
                        k1, axis=1, mode="reflect")
    y += 0.01 * rng.standard_normal((H, W)).astype(np.float32)
    return y.astype(np.float32), k1


# --------------------------------------------------------------------------
# Ours: pyxu_tpu Condat-Vu, jitted while-loop, device-resident
# --------------------------------------------------------------------------
def run_tpu(y, k1, n_iters):
    import jax

    # Persistent compile cache: first-ever bench run pays the loop+conv
    # compile (minutes on remote-compile backends); later runs are warm.
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from pyxu_tpu.operator.func import L21Norm, SquaredL2Norm
    from pyxu_tpu.operator.linop import Gradient, Stencil
    from pyxu_tpu.opt.solver import CondatVu
    from pyxu_tpu.opt.stop import MaxIter

    c = (KSIZE - 1) // 2
    K = Stencil((H, W), [jnp.asarray(k1), jnp.asarray(k1)], [c, c], mode="symmetric")
    f = 0.5 * SquaredL2Norm((H, W)).asloss(jnp.asarray(y)) * K
    D = Gradient((H, W), mode="symmetric")
    h = LAM * L21Norm((2, H, W), l2_axis=0)

    # ONE solver + ONE stop-criterion instance: the second fit() reuses the
    # compiled while-loop segment (Solver._seg_cache), so the timed run
    # measures pure iteration throughput.  With ~2 ms/iteration the whole
    # 200-iteration solve is a single short device program (long-running
    # programs — minutes — can trip this environment's worker watchdog, but
    # 0.4 s is far below that).
    seg = n_iters
    slv = CondatVu(f=f, h=h, K=D, stop_rate=seg)
    crit = MaxIter(n_iters)
    x0 = jnp.asarray(y)
    import sys
    print("# compile+warmup start", file=sys.stderr, flush=True)
    slv.fit(x0=x0, stop_crit=crit, max_iter=n_iters, segment_size=seg)
    jax.block_until_ready(slv.solution())
    print("# warmup done", file=sys.stderr, flush=True)
    # best of 2 timed fits: the relay occasionally stalls a dispatch for
    # tens of ms; steady-state throughput is the faster (repeatable) run.
    dt = min(_timed_fit(slv, x0, crit, n_iters, seg) for _ in range(2))
    # bf16-dual variant (fit(dual_dtype=bf16): z stored bf16, arithmetic
    # f32 in VMEM): +8.8% iter/s at +5e-4 relative objective after the same
    # 1000 iterations (BASELINE.md round 6).  Reported as an extra metric;
    # the headline stays f32 for cross-round comparability.
    bf16z = None
    try:
        slv.fit(x0=x0, stop_crit=crit, max_iter=n_iters, segment_size=seg,
                dual_dtype=jnp.bfloat16)
        jax.block_until_ready(slv.solution())
        dt_b = min(_timed_fit(slv, x0, crit, n_iters, seg,
                              dual_dtype=jnp.bfloat16) for _ in range(2))
        bf16z = round(n_iters / dt_b, 2)
    except Exception as e:  # never let the variant kill the headline
        print(f"# bf16z leg failed: {type(e).__name__}", file=sys.stderr)
    # NOTE: a fit(precision_schedule=[bf16, f32]) leg was measured at 735
    # it/s here — SLOWER than the pure-f32 fused headline (980): the fused
    # TV kernel's full-bf16 gain (~13%) cannot cover the two extra per-fit
    # dispatches + phase casts at 1000 iterations.  The schedule pays off
    # on generic (non-fused) paths where bf16 gives 1.65x (BASELINE round
    # 2); dual-storage bf16z above is the fused kernel's lever.
    return n_iters / dt, bf16z


def _timed_fit(slv, x0, crit, n_iters, seg, **kw):
    import jax
    t0 = time.perf_counter()
    slv.fit(x0=x0, stop_crit=crit, max_iter=n_iters, segment_size=seg, **kw)
    jax.block_until_ready(slv.solution())
    return time.perf_counter() - t0


# --------------------------------------------------------------------------
# Baseline: identical iteration in NumPy/SciPy on CPU
# --------------------------------------------------------------------------
def run_numpy(y, k1, n_iters, tau, sigma):
    import scipy.ndimage as snd

    def blur(v):
        return snd.correlate1d(snd.correlate1d(v, k1, axis=0, mode="reflect"),
                               k1, axis=1, mode="reflect")

    def grad(v):
        gx = np.empty_like(v)
        gx[:-1] = v[1:] - v[:-1]
        gx[-1] = 0
        gy = np.empty_like(v)
        gy[:, :-1] = v[:, 1:] - v[:, :-1]
        gy[:, -1] = 0
        return np.stack([gx, gy])

    def grad_T(z):
        gx, gy = z[0], z[1]
        out = np.zeros_like(gx)
        out[0] += -gx[0]
        out[1:] += gx[:-1] - gx[1:]
        out[1:][-1] += 0  # boundary handled above
        out2 = np.zeros_like(gy)
        out2[:, 0] += -gy[:, 0]
        out2[:, 1:] += gy[:, :-1] - gy[:, 1:]
        return -(out + out2) * -1.0  # adjoint of forward difference

    x = y.copy()
    z = np.zeros((2, H, W), dtype=np.float32)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        # grad f = K^T(K x - y)  (blur is self-adjoint symmetric kernel)
        gf = blur(blur(x) - y)
        xp = x - tau * (gf + grad_T(z))
        u = grad(2 * xp - x)
        zt = z + sigma * u
        n = np.sqrt((zt**2).sum(axis=0, keepdims=True))
        zp = zt - sigma * np.maximum(1 - (LAM / sigma) / np.maximum(n / sigma, 1e-30), 0) * (zt / sigma)
        # fenchel prox of lam*L21 via Moreau: z - sigma*prox_{h/sigma}(z/sigma)
        x, z = xp, zp
    dt = time.perf_counter() - t0
    return n_iters / dt


def run_extra_workloads():
    """Workloads 3 (sparse-view CT, PD3O) and 4 (radio interferometry, ADMM)
    of BASELINE.json — steady-state iter/s each, reported as extra keys on
    the headline JSON line.  Disable with PYXU_BENCH_EXTRA=0."""
    import os
    import signal
    if os.environ.get("PYXU_BENCH_EXTRA", "1") == "0":
        return {}
    import jax
    from pyxu_tpu.models.workloads import (consensus_tiles,
                                           lasso_deconvolution,
                                           radio_interferometry,
                                           sparse_view_ct)
    from pyxu_tpu.opt.stop import MaxIter

    # Hard wall-clock guard: a wedged device tunnel can hang a transfer
    # forever, and the headline JSON line must still be printed.
    class _Timeout(Exception):
        pass

    def _alarm(sig, frame):
        raise _Timeout()

    prev_handler = signal.signal(signal.SIGALRM, _alarm)

    out = {}
    # one segment per fit, and enough iterations that the ~40-65 ms
    # per-fit relay round-trip stays under ~5% of the timed window (the
    # old 100/40-iteration fits read 10-19% below steady state).  Full
    # fits are ~1 s device programs — far below the worker watchdog
    # threshold (minutes, see CLAUDE.md).
    for name, factory, iters, seg in (
        ("lasso_fista_256", lambda: lasso_deconvolution(
            shape=(256, 256)), 2000, 2000),
        ("ct_pd3o_256", lambda: sparse_view_ct(
            shape=(256, 256), n_angles=60, method="fourier"), 400, 400),
        ("ri_admm_256", lambda: radio_interferometry(
            shape=(256, 256), n_vis=20_000), 150, 150),
        # workload config 5 (giga-pixel consensus blocks): the block-sharded
        # consensus ADMM measured on this chip's 1-DEVICE mesh (the metric
        # name says so — this number exercises no psum); the 2/4/8-device
        # behaviour of the same code path is measured on the virtual CPU
        # mesh (tools/scaling_study.py -> SCALING_r*.json, BASELINE.md
        # "Scaling study").
        ("consensus_admm_8x512_1dev", lambda: consensus_tiles(
            tile=(512, 512), n_tiles=8), 1000, 1000),
    ):
        try:
            signal.alarm(600)  # compile (cached across runs) + 3 solves
            slv, fit_kw, _ = factory()
            slv._stop_rate = seg  # one on-device stop-check per segment
            crit = MaxIter(iters)
            slv.fit(stop_crit=crit, max_iter=iters, segment_size=seg, **fit_kw)
            jax.block_until_ready(slv.solution())

            def _one():
                t0 = time.perf_counter()
                slv.fit(stop_crit=crit, max_iter=iters, segment_size=seg,
                        **fit_kw)
                jax.block_until_ready(slv.solution())
                return time.perf_counter() - t0

            out[name] = round(iters / min(_one() for _ in range(2)), 2)
        except _Timeout:
            out[name] = "error: timeout"
        except Exception as e:  # never let an extra workload kill the bench
            out[name] = f"error: {type(e).__name__}"
        finally:
            signal.alarm(0)
    signal.signal(signal.SIGALRM, prev_handler)
    return out


def run_scaling(y, k1, single_dev_iter_per_s, n_iters=100):
    """Workload 5 of BASELINE.json: the same TV solve with image rows
    sharded over ALL visible devices (halo-exchange stencil via shard_map +
    ppermute).  Runs only when >1 device is visible (multi-chip rounds) or
    PYXU_BENCH_SCALING=1 forces it; reports iter/s and strong-scaling
    efficiency vs the single-device headline."""
    import os
    n_forced = os.environ.get("PYXU_BENCH_SCALING") == "1"
    import jax
    n_dev = len(jax.devices())
    if n_dev < 2 and not n_forced:
        return {}
    try:
        import jax.numpy as jnp

        from pyxu_tpu.operator.func import L21Norm, SquaredL2Norm
        from pyxu_tpu.operator.linop import Gradient
        from pyxu_tpu.opt.solver import CondatVu
        from pyxu_tpu.opt.stop import MaxIter
        from pyxu_tpu.parallel import P, ShardedStencil, auto_mesh, shard

        mesh = auto_mesh()
        c = (KSIZE - 1) // 2
        K = ShardedStencil((H, W), [jnp.asarray(k1), jnp.asarray(k1)],
                           [c, c], mesh, shard_axis=0, mode="constant")
        ys = K.apply(shard(jnp.asarray(y), mesh, P("s", None)))
        f = 0.5 * SquaredL2Norm((H, W)).asloss(ys) * K
        D = Gradient((H, W), mode="constant")
        h = LAM * L21Norm((2, H, W), l2_axis=0)
        slv = CondatVu(f=f, h=h, K=D, stop_rate=n_iters)
        crit = MaxIter(n_iters)
        x0 = shard(jnp.asarray(y), mesh, P("s", None))
        slv.fit(x0=x0, stop_crit=crit, max_iter=n_iters,
                segment_size=n_iters)
        jax.block_until_ready(slv.solution())
        t0 = time.perf_counter()
        slv.fit(x0=x0, stop_crit=crit, max_iter=n_iters,
                segment_size=n_iters)
        jax.block_until_ready(slv.solution())
        it_s = n_iters / (time.perf_counter() - t0)
        return {
            "n_devices": n_dev,
            "iter_per_s": round(it_s, 2),
            "strong_scaling_efficiency": round(
                it_s / (n_dev * single_dev_iter_per_s), 3),
        }
    except Exception as e:  # never let the scaling leg kill the bench
        return {"n_devices": n_dev, "error": type(e).__name__}


def main():
    y, k1 = make_data()
    ours, bf16z = run_tpu(y, k1, N_ITERS)
    # step sizes comparable to ours (beta = ||K||^2 <= 1, L_D <= sqrt(8))
    tau = 1.0 / (0.5 + np.sqrt(8.0))
    sigma = 1.0 / np.sqrt(8.0)
    base = run_numpy(y, k1, N_ITERS_BASE, tau, sigma)
    extra = run_extra_workloads()
    if bf16z is not None:
        extra["tv_bf16z_4k"] = bf16z
    out = {
        "metric": "tv_deconv_4k_condatvu",
        "value": round(ours, 3),
        "unit": "iter/s",
        "vs_baseline": round(ours / base, 2),
        "extra_iter_per_s": extra,
    }
    scaling = run_scaling(y, k1, ours)
    if scaling:
        out["multi_device"] = scaling
    print(json.dumps(out))


if __name__ == "__main__":
    main()
