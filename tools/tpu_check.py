"""On-device verification of every compiled Pallas kernel family.

VERDICT r4 item 4: the interpret-mode twins prove kernel SEMANTICS on CPU,
but nothing automated ran the compiled Mosaic kernels on the real chip and
recorded a pass/fail.  This script does: small sizes, single applies (no
loops around MXU ops — wedge-safe), persistent compile cache, numerics
asserted against the XLA/direct-evaluation fallbacks.

Families: fused TV step (fused-normal-op and legacy 4-stage bodies),
2-D slab + strip2-hybrid spread/interp, forced-ragged 2-D, 3-D strip/pencil,
2-D/3-D type-3 (ragged fine grids), with sort-permute active throughout
(the default TPU path).

Run ON the TPU (no JAX_PLATFORMS override):

    python tools/tpu_check.py          # writes TPUCHECK_r05.json

Each leg reports {ok, rel_err}; exit code 1 if any leg fails.  See
docs/testing.md ("On-device kernel checks").
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOL = 5e-4     # f32 plans built at eps=1e-6; rel err well below this


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30))


def leg_fused_tv(fuse_g):
    from pyxu_tpu.ops.fused_tv import tv_step_pallas, tv_step_xla
    os.environ["PYXU_TPU_FUSED_G"] = fuse_g
    rng = np.random.default_rng(0)
    H, W = 256, 384
    x = jnp.asarray(rng.random((H, W), dtype=np.float32))
    z = jnp.asarray(rng.standard_normal((2, H, W)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((H, W)).astype(np.float32) * 0.01)
    k = np.exp(-0.5 * ((np.arange(9) - 4) / 2.0) ** 2)
    k = (k / k.sum()).astype(np.float32)
    kw = dict(cst=1.0, lam=0.01, tau=0.1, sigma=0.2, rho=0.9)
    want = jax.jit(lambda x, z, b: tv_step_xla(
        x, z[0], z[1], b, jnp.asarray(k), jnp.asarray(k), 4, 4, **kw))(
        x, z, b)
    xg, zg = tv_step_pallas(x, z, b, k0=tuple(k.tolist()),
                            k1=tuple(k.tolist()), c0=4, c1=4, band=64, **kw)
    err = max(_rel(xg, want[0]), _rel(zg[0], want[1]), _rel(zg[1], want[2]))
    return err


def leg_fused_tv2():
    """Temporal-blocking kernel vs two XLA steps (compiled, on-chip)."""
    from pyxu_tpu.ops.fused_tv import tv_step2_pallas, tv_step_xla
    rng = np.random.default_rng(0)
    H, W = 256, 384
    x = jnp.asarray(rng.random((H, W), dtype=np.float32))
    z = jnp.asarray(rng.standard_normal((2, H, W)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((H, W)).astype(np.float32) * 0.01)
    k = np.exp(-0.5 * ((np.arange(9) - 4) / 2.0) ** 2)
    k = (k / k.sum()).astype(np.float32)
    kw = dict(cst=1.0, lam=0.01, tau=0.1, sigma=0.2, rho=0.9)

    @jax.jit
    def two(x, z, b):
        s1 = tv_step_xla(x, z[0], z[1], b, jnp.asarray(k), jnp.asarray(k),
                         4, 4, **kw)
        s2 = tv_step_xla(s1[0], s1[1], s1[2], b, jnp.asarray(k),
                         jnp.asarray(k), 4, 4, **kw)
        return s2

    want = two(x, z, b)
    xg, zg = tv_step2_pallas(x, z, b, k0=tuple(k.tolist()),
                             k1=tuple(k.tolist()), c0=4, c1=4, band=64, **kw)
    return max(_rel(xg, want[0]), _rel(zg[0], want[1]), _rel(zg[1], want[2]))


def _nufft_leg(d, ftype, env=None, n=48, M=3000):
    """Compare the planned fast path against the direct nudft evaluator."""
    from pyxu_tpu.operator.linop.nufft import NUFFT, nudft1, nudft2, nudft3
    prev = {}
    for k, v in (env or {}).items():
        prev[k] = os.environ.get(k)
        os.environ[k] = v
    def as_c(real_pair):    # host complex view of a (..., 2) real array
        a = np.asarray(jax.device_get(real_pair), np.float64)
        return a[..., 0] + 1j * a[..., 1]

    try:
        rng = np.random.default_rng(1)
        shape = (n,) * d
        pts = rng.uniform(-np.pi, np.pi, (M, d)).astype(np.float32)
        if ftype == 1:
            op = NUFFT.type1(pts, shape, eps=1e-6)
            cr = rng.standard_normal((M, 2)).astype(np.float32)
            got = as_c(jax.jit(op.apply)(jnp.asarray(cr)))
            want = nudft1(cr[:, 0] + 1j * cr[:, 1], pts, shape)
        elif ftype == 2:
            op = NUFFT.type2(pts, shape, eps=1e-6)
            ur = rng.standard_normal(shape + (2,)).astype(np.float32)
            got = as_c(jax.jit(op.apply)(jnp.asarray(ur)))
            want = nudft2(ur[..., 0] + 1j * ur[..., 1], pts, shape)
        else:
            zpts = rng.uniform(-8.0, 8.0, (M // 2, d)).astype(np.float32)
            op = NUFFT.type3(pts, zpts, eps=1e-6)
            cr = rng.standard_normal((M, 2)).astype(np.float32)
            got = as_c(jax.jit(op.apply)(jnp.asarray(cr)))
            want = nudft3(cr[:, 0] + 1j * cr[:, 1], pts, zpts)
        a = np.stack([got.real, got.imag], -1)
        b = np.stack([want.real, want.imag], -1)
        return _rel(a, b)
    finally:
        for k, v in prev.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    t0 = time.time()
    backend = jax.default_backend()
    legs = {}

    def run(name, fn, *a, **k):
        try:
            err = fn(*a, **k)
            legs[name] = {"ok": bool(err < TOL), "rel_err": round(err, 8)}
        except Exception as e:   # record, keep going
            legs[name] = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        print(f"# {name}: {legs[name]}", file=sys.stderr, flush=True)

    run("fused_tv_normal_op", leg_fused_tv, "1")
    run("fused_tv_legacy", leg_fused_tv, "0")
    run("fused_tv_double_step", leg_fused_tv2)
    # 2-D: slab spread + strip2 interp hybrid (defaults), sort-permute on
    run("nufft2d_type1_slab", _nufft_leg, 2, 1)
    run("nufft2d_type2_strip2", _nufft_leg, 2, 2)
    run("nufft2d_type1_strip2_spread", _nufft_leg, 2, 1,
        env={"PYXU_TPU_NUFFT_STRIP2_SPREAD": "1"})
    run("nufft2d_type1_ragged", _nufft_leg, 2, 1,
        env={"PYXU_TPU_NUFFT_RAGGED": "force"})
    # 3-D: strip pencils (spread) / grouped interp
    run("nufft3d_type1_strip", _nufft_leg, 3, 1, n=24, M=2000)
    run("nufft3d_type2", _nufft_leg, 3, 2, n=24, M=2000)
    # type-3: ragged fine grids (clustered spectral extents)
    run("nufft2d_type3_ragged", _nufft_leg, 2, 3, n=48, M=2000)
    run("nufft3d_type3_rpencil", _nufft_leg, 3, 3, n=16, M=1500)

    ok = all(v.get("ok") for v in legs.values())
    out = {"backend": backend, "ok": ok, "tol": TOL,
           "wall_s": round(time.time() - t0, 1), "legs": legs}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "TPUCHECK_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
