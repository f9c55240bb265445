"""Fused Condat-Vu TV iteration (pyxu_tpu.ops.fused_tv): the XLA reference
must match the operator-stack m_step, the Pallas kernel (interpret mode on
CPU) must match the XLA reference, and the CondatVu fusion pass must produce
the same solve as the generic path."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyxu_tpu.operator.func import L21Norm, SquaredL2Norm
from pyxu_tpu.operator.linop import Gradient, Stencil
from pyxu_tpu.ops.fused_tv import match_fused_tv, tv_step_pallas, tv_step_xla
from pyxu_tpu.opt.solver import CondatVu
from pyxu_tpu.opt.stop import MaxIter

rng0 = np.random.default_rng(7)


def _gauss(n=9, sig=2.0):
    k = np.exp(-0.5 * ((np.arange(n) - (n - 1) / 2) / sig) ** 2)
    return (k / k.sum()).astype(np.float32)


def _problem(H, W, mode, lam=0.01, seed=3):
    k1 = _gauss()
    y = jnp.asarray(np.random.default_rng(seed).random((H, W), np.float32))
    K = Stencil((H, W), [jnp.asarray(k1), jnp.asarray(k1)], [4, 4], mode=mode)
    f = 0.5 * SquaredL2Norm((H, W)).asloss(y) * K
    D = Gradient((H, W), mode=mode)
    h = lam * L21Norm((2, H, W), l2_axis=0)
    return f, h, D, k1, y


@pytest.mark.parametrize("mode", ["symmetric", "constant"])
def test_xla_step_matches_m_step(mode):
    H, W = 37, 41
    f, h, D, k1, y = _problem(H, W, mode)
    slv = CondatVu(f=f, h=h, K=D)
    x0 = jnp.asarray(rng0.random((H, W), np.float32))
    mst = slv.m_init(x0=x0)
    slv._fused_tv = None          # force the generic path as the oracle
    m = dict(mst)
    for _ in range(3):
        m = slv.m_step(m)
    _, c, _ = f._quad_spec()
    b = c.grad(jnp.zeros((H, W), jnp.float32))
    xf, z0f, z1f = mst["x"], mst["z"][0], mst["z"][1]
    for _ in range(3):
        xf, z0f, z1f = tv_step_xla(
            xf, z0f, z1f, b, jnp.asarray(k1), jnp.asarray(k1), 4, 4,
            cst=1.0, lam=0.01, tau=slv._tau, sigma=slv._sigma, rho=slv._rho,
            mode_k=mode, mode_d=mode)
    assert np.abs(np.asarray(m["x"]) - np.asarray(xf)).max() < 1e-5
    assert np.abs(np.asarray(m["z"][0]) - np.asarray(z0f)).max() < 1e-5
    assert np.abs(np.asarray(m["z"][1]) - np.asarray(z1f)).max() < 1e-5


@pytest.mark.parametrize("mode", ["symmetric", "constant"])
@pytest.mark.parametrize("band", [16, 32])
@pytest.mark.parametrize("fuse_g", ["0", "1"])
def test_pallas_matches_xla(mode, band, fuse_g, monkeypatch):
    # both kernel bodies: fused normal-op (G = K^T K separable taps +
    # correction matmuls) and the legacy 4-stage fwd/adj path
    monkeypatch.setenv("PYXU_TPU_FUSED_G", fuse_g)
    H, W = 64, 41
    k1 = _gauss()
    x = jnp.asarray(rng0.random((H, W), np.float32))
    z = jnp.asarray(rng0.standard_normal((2, H, W)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng0.standard_normal((H, W)).astype(np.float32) * 0.1)
    kw = dict(cst=1.0, lam=0.01, tau=0.2, sigma=0.15, rho=0.9,
              mode_k=mode, mode_d=mode)
    want = tv_step_xla(x, z[0], z[1], b, jnp.asarray(k1), jnp.asarray(k1),
                       4, 4, **kw)
    xg, zg = tv_step_pallas(x, z, b, k0=tuple(k1.tolist()),
                            k1=tuple(k1.tolist()), c0=4, c1=4, band=band,
                            interpret=True, **kw)
    assert np.abs(np.asarray(xg) - np.asarray(want[0])).max() < 1e-5
    assert np.abs(np.asarray(zg[0]) - np.asarray(want[1])).max() < 1e-5
    assert np.abs(np.asarray(zg[1]) - np.asarray(want[2])).max() < 1e-5


def test_pallas_asymmetric_kernels_and_momentum():
    H, W = 64, 33
    k0 = np.asarray([0.2, 0.5, 0.3], np.float32)
    k1 = np.asarray([0.1, 0.6, 0.2, 0.1], np.float32)
    x = jnp.asarray(rng0.random((H, W), np.float32))
    z = jnp.asarray(rng0.standard_normal((2, H, W)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng0.standard_normal((H, W)).astype(np.float32) * 0.1)
    for mode in ("symmetric", "constant"):
        kw = dict(cst=0.7, lam=0.02, tau=0.11, sigma=0.21, rho=0.8,
                  mode_k=mode, mode_d=mode)
        want = tv_step_xla(x, z[0], z[1], b, jnp.asarray(k0),
                           jnp.asarray(k1), 1, 2, **kw)
        xg, zg = tv_step_pallas(x, z, b, k0=tuple(k0.tolist()),
                                k1=tuple(k1.tolist()), c0=1, c1=2, band=16,
                                interpret=True, **kw)
        assert np.abs(np.asarray(xg) - np.asarray(want[0])).max() < 1e-5
        assert np.abs(np.asarray(zg[0]) - np.asarray(want[1])).max() < 1e-5
        assert np.abs(np.asarray(zg[1]) - np.asarray(want[2])).max() < 1e-5


@pytest.mark.parametrize("flag", ["xla", "1"])
def test_condatvu_fusion_matches_generic_solve(flag, monkeypatch):
    H, W = 96, 67
    iters = 25
    sols = {}
    for fl in ("0", flag):
        monkeypatch.setenv("PYXU_TPU_FUSED", fl)
        f, h, D, _, y = _problem(H, W, "symmetric")
        slv = CondatVu(f=f, h=h, K=D, stop_rate=iters)
        slv.fit(x0=y, stop_crit=MaxIter(iters), max_iter=iters,
                segment_size=iters)
        sols[fl] = np.asarray(slv.solution())
        if fl == "0":
            assert slv._fused_tv is None
        else:
            assert slv._fused_tv is not None
    assert np.abs(sols["0"] - sols[flag]).max() < 1e-5


def test_matcher_rejects_non_tv_problems(monkeypatch):
    monkeypatch.setenv("PYXU_TPU_FUSED", "1")
    H, W = 96, 64
    f, h, D, _, y = _problem(H, W, "symmetric")
    # wrong h (L1 instead of L21)
    from pyxu_tpu.operator.func import L1Norm
    assert match_fused_tv(f, None, 0.1 * L1Norm((2, H, W)), D,
                          tau=0.1, sigma=0.1, rho=1.0) is None
    # non-quadratic f
    assert match_fused_tv(L1Norm((H, W)), None, h, D,
                          tau=0.1, sigma=0.1, rho=1.0) is None
    # g present
    from pyxu_tpu.operator.func.indicator import PositiveOrthant
    step = match_fused_tv(f, PositiveOrthant((H, W)), h, D,
                          tau=0.1, sigma=0.1, rho=1.0)
    assert step is None
    # wrap-mode stencil
    k1 = _gauss()
    Kw = Stencil((H, W), [jnp.asarray(k1), jnp.asarray(k1)], [4, 4],
                 mode="wrap")
    fw = 0.5 * SquaredL2Norm((H, W)).asloss(y) * Kw
    assert match_fused_tv(fw, None, h, D, tau=0.1, sigma=0.1, rho=1.0) is None
    # image too small for the halo window
    f2, h2, D2, _, _ = _problem(24, 64, "symmetric")
    assert match_fused_tv(f2, None, h2, D2, tau=0.1, sigma=0.1, rho=1.0) is None
    # off switch
    monkeypatch.setenv("PYXU_TPU_FUSED", "0")
    assert match_fused_tv(f, None, h, D, tau=0.1, sigma=0.1, rho=1.0) is None


def test_band_smaller_than_halo_rejected(monkeypatch):
    """Review regression: interior bands' clamped DMA windows silently
    mis-index when the band is smaller than the halo window — both the
    kernel and the matcher must refuse instead."""
    monkeypatch.setenv("PYXU_TPU_FUSED", "1")
    # H whose largest <=128 multiple-of-8 divisor is 8 (< TX=16)
    H, W = 1048, 40
    f, h, D, _, _ = _problem(H, W, "symmetric")
    assert match_fused_tv(f, None, h, D, tau=0.1, sigma=0.1, rho=1.0) is None
    # explicit tiny band on the kernel entry point: refuse loudly
    k1 = _gauss()
    x = jnp.zeros((64, 40), jnp.float32)
    z = jnp.zeros((2, 64, 40), jnp.float32)
    b = jnp.zeros((64, 40), jnp.float32)
    with pytest.raises(AssertionError):
        tv_step_pallas(x, z, b, k0=tuple(k1.tolist()), k1=tuple(k1.tolist()),
                       c0=4, c1=4, band=8, interpret=True,
                       cst=1.0, lam=0.01, tau=0.1, sigma=0.1, rho=1.0)


@pytest.mark.parametrize("xdt,zdt", [
    (jnp.float32, jnp.bfloat16),       # bf16 dual storage
    (jnp.bfloat16, jnp.bfloat16),      # full bf16 state
])
def test_pallas_bf16_storage_matches_f32(xdt, zdt):
    """Mixed-precision storage: arithmetic runs at f32 in VMEM; the only
    numerical effect is one storage-rounding per state write, so a single
    step must match the f32 step to bf16 resolution (~4e-3 relative)."""
    H, W = 64, 41
    k1 = _gauss()
    x32 = jnp.asarray(rng0.random((H, W), np.float32))
    z32 = jnp.asarray(rng0.standard_normal((2, H, W)).astype(np.float32) * .1)
    b = jnp.asarray(rng0.standard_normal((H, W)).astype(np.float32) * 0.1)
    kw = dict(k0=tuple(k1.tolist()), k1=tuple(k1.tolist()), c0=4, c1=4,
              cst=1.0, lam=0.01, tau=0.2, sigma=0.15, rho=0.9,
              mode_k="symmetric", mode_d="symmetric", band=16,
              interpret=True)
    want_x, want_z = tv_step_pallas(x32, z32, b, **kw)
    got_x, got_z = tv_step_pallas(x32.astype(xdt), z32.astype(zdt), b, **kw)
    assert got_x.dtype == xdt and got_z.dtype == zdt     # carry-stable
    scale = float(np.abs(np.asarray(want_x)).max())
    assert np.abs(np.asarray(got_x, np.float32)
                  - np.asarray(want_x)).max() < 4e-3 * max(scale, 1.0)
    assert np.abs(np.asarray(got_z, np.float32)
                  - np.asarray(want_z)).max() < 4e-3


def test_condatvu_dual_dtype_solve(monkeypatch):
    """fit(dual_dtype=bf16) keeps the while-loop carry stable (z stays bf16
    across segments) on both the fused-XLA and the generic path, and the
    solution tracks the f32 solve."""
    H, W = 96, 67
    iters = 25
    sols = {}
    for fl, dd in (("xla", None), ("xla", jnp.bfloat16), ("0", jnp.bfloat16)):
        monkeypatch.setenv("PYXU_TPU_FUSED", fl)
        f, h, D, _, y = _problem(H, W, "symmetric")
        slv = CondatVu(f=f, h=h, K=D, stop_rate=iters)
        slv.fit(x0=y, stop_crit=MaxIter(iters), max_iter=iters,
                segment_size=iters, dual_dtype=dd)
        if dd is not None:
            assert slv._mstate["z"].dtype == jnp.bfloat16
        sols[(fl, dd)] = np.asarray(slv.solution(), np.float32)
    ref = sols[("xla", None)]
    scale = np.abs(ref).max()
    # bf16 dual quantization perturbs the iterates slightly; both bf16-dual
    # paths must agree with each other tightly and with f32 loosely
    assert np.abs(sols[("xla", jnp.bfloat16)] - ref).max() < 2e-2 * scale
    assert np.abs(sols[("0", jnp.bfloat16)] - ref).max() < 2e-2 * scale


@pytest.mark.parametrize("mode", ["symmetric", "constant"])
@pytest.mark.parametrize("rho", [1.0, 0.9])
def test_pallas2_matches_two_xla_steps(mode, rho):
    """Temporal-blocking kernel == two single iterations (interpret)."""
    from pyxu_tpu.ops.fused_tv import tv_step2_pallas
    H, W = 96, 41
    k1 = _gauss()
    x = jnp.asarray(rng0.random((H, W), np.float32))
    z = jnp.asarray(rng0.standard_normal((2, H, W)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng0.standard_normal((H, W)).astype(np.float32) * 0.1)
    kw = dict(cst=1.0, lam=0.01, tau=0.2, sigma=0.15, rho=rho,
              mode_k=mode, mode_d=mode)
    s1 = tv_step_xla(x, z[0], z[1], b, jnp.asarray(k1), jnp.asarray(k1),
                     4, 4, **kw)
    s2 = tv_step_xla(s1[0], s1[1], s1[2], b, jnp.asarray(k1),
                     jnp.asarray(k1), 4, 4, **kw)
    xg, zg = tv_step2_pallas(x, z, b, k0=tuple(k1.tolist()),
                             k1=tuple(k1.tolist()), c0=4, c1=4, band=32,
                             interpret=True, **kw)
    assert np.abs(np.asarray(xg) - np.asarray(s2[0])).max() < 2e-5
    assert np.abs(np.asarray(zg[0]) - np.asarray(s2[1])).max() < 2e-5
    assert np.abs(np.asarray(zg[1]) - np.asarray(s2[2])).max() < 2e-5


@pytest.mark.parametrize("iters", [24, 25])   # even + odd segment cadences
def test_condatvu_double_step_matches_generic_solve(iters, monkeypatch):
    """Engine temporal-blocking path (_m_step2): same solution as the
    generic operator path, including the odd-cadence single-step tail."""
    H, W = 96, 67
    sols = {}
    for fl in ("0", "1"):
        monkeypatch.setenv("PYXU_TPU_FUSED", fl)
        monkeypatch.setenv("PYXU_TPU_FUSED2", fl)
        f, h, D, _, y = _problem(H, W, "symmetric")
        slv = CondatVu(f=f, h=h, K=D, stop_rate=iters)
        slv.fit(x0=y, stop_crit=MaxIter(iters), max_iter=iters,
                segment_size=iters)
        sols[fl] = np.asarray(slv.solution())
        if fl == "1":
            assert getattr(slv, "_m_step2", None) is not None
            assert slv._m_step2_on
        else:
            assert getattr(slv, "_m_step2", None) is None
    assert np.abs(sols["0"] - sols["1"]).max() < 2e-5


@pytest.mark.parametrize("n_steps", [3, 4])
def test_pallask_matches_k_xla_steps(n_steps):
    """K-level temporal blocking == K single iterations (interpret)."""
    from pyxu_tpu.ops.fused_tv import tv_stepk_pallas
    H, W = 192, 41
    k1 = _gauss()
    x = jnp.asarray(rng0.random((H, W), np.float32))
    z = jnp.asarray(rng0.standard_normal((2, H, W)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng0.standard_normal((H, W)).astype(np.float32) * 0.1)
    kw = dict(cst=1.0, lam=0.01, tau=0.2, sigma=0.15, rho=0.9,
              mode_k="symmetric", mode_d="symmetric")
    s = (x, z[0], z[1])
    for _ in range(n_steps):
        s = tv_step_xla(s[0], s[1], s[2], b, jnp.asarray(k1),
                        jnp.asarray(k1), 4, 4, **kw)
    xg, zg = tv_stepk_pallas(x, z, b, k0=tuple(k1.tolist()),
                             k1=tuple(k1.tolist()), c0=4, c1=4, band=48,
                             interpret=True, n_steps=n_steps, **kw)
    assert np.abs(np.asarray(xg) - np.asarray(s[0])).max() < 3e-5
    assert np.abs(np.asarray(zg[0]) - np.asarray(s[1])).max() < 3e-5
    assert np.abs(np.asarray(zg[1]) - np.asarray(s[2])).max() < 3e-5


def test_fused2_steps_down_when_windows_exceed_image(monkeypatch):
    """match_fused_tv2 must fall back K=3 -> 2 when the level-1 windows
    would exceed the image (a too-large window makes the clamped DMA
    start negative — regression for the H=96 garbage-read bug)."""
    monkeypatch.setenv("PYXU_TPU_FUSED", "1")
    monkeypatch.setenv("PYXU_TPU_FUSED2", "1")
    monkeypatch.setenv("PYXU_TPU_FUSED2_K", "3")
    from pyxu_tpu.ops.fused_tv import match_fused_tv2
    f, h, D, _, _ = _problem(96, 64, "symmetric")
    step = match_fused_tv2(f, None, h, D, tau=0.1, sigma=0.1, rho=1.0)
    assert step is not None and step.n_steps == 2   # 3 needs NX=104 > 96
    f2, h2, D2, _, _ = _problem(384, 64, "symmetric")
    step3 = match_fused_tv2(f2, None, h2, D2, tau=0.1, sigma=0.1, rho=1.0)
    assert step3 is not None and step3.n_steps == 3


@pytest.mark.parametrize("zdt", [jnp.bfloat16])
def test_pallask_bf16_dual_storage(zdt):
    """K-step kernel with bf16 dual storage == K single-kernel passes with
    the same storage round-trips (interpret)."""
    from pyxu_tpu.ops.fused_tv import tv_step_pallas, tv_stepk_pallas
    H, W = 96, 41
    k1 = _gauss()
    x = jnp.asarray(rng0.random((H, W), np.float32))
    z = jnp.asarray(rng0.standard_normal((2, H, W)) * 0.1).astype(zdt)
    b = jnp.asarray(rng0.standard_normal((H, W)).astype(np.float32) * 0.1)
    kw = dict(k0=tuple(_gauss().tolist()), k1=tuple(k1.tolist()), c0=4,
              c1=4, cst=1.0, lam=0.01, tau=0.2, sigma=0.15, rho=1.0,
              band=48, interpret=True)
    s = (x, z)
    for _ in range(2):
        s = tv_step_pallas(s[0], s[1], b, **kw)
    xg, zg = tv_stepk_pallas(x, z, b, n_steps=2, **kw)
    assert zg.dtype == zdt
    assert np.abs(np.asarray(xg) - np.asarray(s[0])).max() < 1e-5
    assert np.abs(np.asarray(zg.astype(jnp.float32))
                  - np.asarray(s[1].astype(jnp.float32))).max() < 1e-5


def test_pallask_col_mm_matches(monkeypatch):
    """Opt-in block-banded MXU column stage == rolled column stage
    (interpret; W multiple of 128)."""
    from pyxu_tpu.ops.fused_tv import tv_stepk_pallas
    H, W = 96, 256
    k1 = _gauss()
    x = jnp.asarray(rng0.random((H, W), np.float32))
    z = jnp.asarray(rng0.standard_normal((2, H, W)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng0.standard_normal((H, W)).astype(np.float32) * 0.1)
    kw = dict(k0=tuple(k1.tolist()), k1=tuple(k1.tolist()), c0=4, c1=4,
              cst=1.0, lam=0.01, tau=0.2, sigma=0.15, rho=1.0, band=32,
              interpret=True)
    want = tv_stepk_pallas(x, z, b, n_steps=2, **kw)
    monkeypatch.setenv("PYXU_TPU_FUSED_CMM", "1")
    got = tv_stepk_pallas(x, z, b, n_steps=2, **kw)
    assert np.abs(np.asarray(got[0]) - np.asarray(want[0])).max() < 2e-5
    assert np.abs(np.asarray(got[1]) - np.asarray(want[1])).max() < 2e-5


def test_precision_schedule_with_k_step_engine(monkeypatch):
    """precision_schedule phases (bf16 warm -> f32 polish) compose with the
    K-step temporal-blocking hook: each phase re-matches, the dtype-lock
    wrapper keeps the carry stable, and the result tracks the generic
    path's schedule to bf16 accuracy."""
    import jax.numpy as jnp
    H, W = 96, 67
    sols = {}
    for fl in ("0", "1"):
        monkeypatch.setenv("PYXU_TPU_FUSED", fl)
        monkeypatch.setenv("PYXU_TPU_FUSED2", fl)
        f, h, D, _, y = _problem(H, W, "symmetric")
        slv = CondatVu(f=f, h=h, K=D, stop_rate=12)
        slv.fit(x0=y, stop_crit=MaxIter(48), max_iter=48, segment_size=24,
                precision_schedule=[(jnp.bfloat16, 24), (jnp.float32, None)])
        x = slv.solution()
        assert np.asarray(x).dtype == np.float32
        sols[fl] = float(f.apply(x) + h.apply(D.apply(x)))
    # bf16 phases quantize at different points in the two implementations
    # (per-store in the kernel vs per-m_step in the engine lock), so the
    # ITERATES legitimately drift a few %; the solves must reach the same
    # objective quality
    assert abs(sols["1"] - sols["0"]) / abs(sols["0"]) < 1e-2, sols
