"""Regression tests for the round-1 code-review findings."""

import jax
import jax.numpy as jnp
import numpy as np

from pyxu_tpu import Mode, PGD
from pyxu_tpu.abc.operator import DiffFunc
from pyxu_tpu.operator.func import L1Norm, SquaredL2Norm
from pyxu_tpu.operator.interop import from_source
from pyxu_tpu.operator.linop import ExplicitLinFunc, ExplicitLinOp
from pyxu_tpu.opt.stop import MaxIter

rng0 = np.random.default_rng(151)


def test_chain_estimate_diff_lipschitz():
    """(f o K).estimate_diff_lipschitz works with cold caches: dL_f ||K||^2."""
    A = rng0.standard_normal((8, 5))
    K = ExplicitLinOp(jnp.asarray(A))
    f = from_source(DiffFunc, (8,), apply=lambda x: jnp.sum(x**2, axis=-1),
                    diff_lipschitz=2.0)
    comp = f * K
    dL = comp.estimate_diff_lipschitz()
    want = 2.0 * np.linalg.norm(A, 2) ** 2
    assert np.isclose(dL, want, rtol=1e-3)


def test_linear_estimate_diff_lipschitz_zero():
    """Linear operands report dL = 0 so Add/Scale estimators recurse fine."""
    w = jnp.asarray(rng0.standard_normal(5))
    assert ExplicitLinFunc(w).estimate_diff_lipschitz() == 0.0
    f = from_source(DiffFunc, (5,), apply=lambda x: jnp.sum(jnp.cos(x), axis=-1),
                    diff_lipschitz=1.0)
    h = f + ExplicitLinFunc(w)
    assert np.isclose(h.estimate_diff_lipschitz(), 1.0)


def test_quadratic_asloss_traced():
    """argshift of a QuadraticFunc works on traced data (inside jit)."""
    def build_and_eval(y, x):
        f = SquaredL2Norm((6,)).asloss(y)
        return f.apply(x)

    y = jnp.asarray(rng0.standard_normal(6))
    x = jnp.asarray(rng0.standard_normal(6))
    got = jax.jit(build_and_eval)(y, x)
    want = np.sum((np.asarray(x) - np.asarray(y)) ** 2)
    assert np.isclose(float(got), want, atol=1e-5)


def test_block_fit_after_async_stop():
    """A stopped ASYNC fit must not truncate a later BLOCK fit."""
    import time
    y = jnp.asarray(rng0.standard_normal(8), jnp.float32)
    slv = PGD(f=0.5 * SquaredL2Norm((8,)).asloss(y), g=0.05 * L1Norm((8,)))
    slv.fit(x0=jnp.zeros(8), stop_crit=MaxIter(10**6), max_iter=10**6,
            segment_size=100, mode=Mode.ASYNC)
    time.sleep(0.2)
    slv.stop()
    slv.fit(x0=jnp.zeros(8), stop_crit=MaxIter(500), max_iter=500)
    _, hist = slv.stats()
    assert hist["iteration"][-1] == 500  # ran to the criterion, not 1 segment


def test_refit_new_folder_gets_own_log(tmp_path):
    y = jnp.asarray(rng0.standard_normal(8), jnp.float32)
    slv = PGD(f=0.5 * SquaredL2Norm((8,)).asloss(y), g=0.05 * L1Norm((8,)),
              folder=tmp_path / "runA", writeback_rate=10, verbosity=10)
    slv.fit(x0=jnp.zeros(8), stop_crit=MaxIter(20), max_iter=20)
    slv._folder = tmp_path / "runB"
    slv.fit(x0=jnp.zeros(8), stop_crit=MaxIter(20), max_iter=20)
    assert (tmp_path / "runA" / "solver.log").exists()
    assert (tmp_path / "runB" / "solver.log").exists()
    assert (tmp_path / "runB" / "solver.log").stat().st_size > 0


def test_combined_host_device_and():
    """MaxDuration & AbsError (host-only & device-only) fires once both do."""
    import datetime as dt
    from pyxu_tpu.opt.stop import AbsError, MaxDuration
    y = jnp.asarray(rng0.standard_normal(8), jnp.float32)
    slv = PGD(f=0.5 * SquaredL2Norm((8,)).asloss(y), g=0.05 * L1Norm((8,)))
    crit = MaxDuration(dt.timedelta(seconds=0.2)) & \
        AbsError(eps=1e30, var="x", rank=1)  # device side trivially true
    slv.fit(x0=jnp.zeros(8), stop_crit=crit, max_iter=10**6, segment_size=50)
    _, hist = slv.stats()
    assert hist["iteration"][-1] < 10**6  # fired via latched host flag


def test_pd3o_zero_x0_does_not_stop_immediately():
    from pyxu_tpu.opt.solver import PD3O
    from pyxu_tpu.abc.operator import DiffFunc
    f = from_source(DiffFunc, (6,),
                    apply=lambda x: jnp.sum((x - 1.0) ** 2, axis=-1),
                    diff_lipschitz=2.0)
    slv = PD3O(f=f)
    slv.fit(x0=jnp.zeros(6), max_iter=2000)
    assert np.allclose(slv.solution(), 1.0, atol=1e-3)


def test_padam_exponent_matches_reference():
    """padam with p=0.5 must equal amsgrad (denominator v_hat**0.5)."""
    from pyxu_tpu.opt.solver import ProxAdam
    y = jnp.asarray(rng0.standard_normal(6), jnp.float32)
    f = 0.5 * SquaredL2Norm((6,)).asloss(y)
    outs = {}
    for variant in ("padam", "amsgrad"):
        slv = ProxAdam(f=f)
        slv.fit(x0=jnp.zeros(6), variant=variant, stop_crit=MaxIter(50),
                max_iter=50)
        outs[variant] = np.asarray(slv.solution())
    assert np.allclose(outs["padam"], outs["amsgrad"], atol=1e-6)


def test_pgd_bf16_momentum_counter():
    """bf16 iterates must not freeze the f32 momentum counter at 256."""
    y = jnp.asarray(rng0.standard_normal(8), jnp.bfloat16)
    slv = PGD(f=0.5 * SquaredL2Norm((8,)).asloss(y), g=0.01 * L1Norm((8,)))
    slv.fit(x0=jnp.zeros(8, jnp.bfloat16), stop_crit=MaxIter(300), max_iter=300)
    assert slv._mstate["k"].dtype == jnp.float32
    assert float(slv._mstate["k"]) == 300.0


def test_admm_rejects_nonquadratic_prox_f_with_K():
    from pyxu_tpu.opt.solver import ADMM
    from pyxu_tpu.operator.linop import ExplicitLinOp
    K = ExplicitLinOp(jnp.asarray(rng0.standard_normal((5, 5))))
    try:
        ADMM(f=L1Norm((5,)), h=L1Norm((5,)), K=K)
        assert False, "should reject non-quadratic non-differentiable f"
    except AssertionError as e:
        assert "quadratic" in str(e).lower() or "differentiable" in str(e).lower()


def test_subsample_rejects_out_of_range():
    from pyxu_tpu.operator.linop import SubSample
    try:
        SubSample((4,), np.array([0, 10]))
        assert False, "should raise IndexError"
    except IndexError:
        pass
    # negative indices still work
    op = SubSample((4,), np.array([-1, 0]))
    got = op.apply(jnp.asarray([1.0, 2.0, 3.0, 4.0]))
    assert np.allclose(got, [4.0, 1.0])


def test_gaussian_derivative_sign():
    """Order-1 gd of a ramp must be +1 (correlation needs the flipped
    convolution kernel)."""
    from pyxu_tpu.operator.linop.diff import PartialDerivative
    n = 32
    ramp = jnp.asarray(np.arange(n, dtype=np.float64))
    D1 = PartialDerivative.gaussian_derivative((n,), 1, sigma=2.0)
    got = np.asarray(D1.apply(ramp))[8:-8]
    assert np.all(got > 0.9)


def test_divergence_is_negative_gradient_adjoint():
    from pyxu_tpu.operator.linop.diff import Divergence, Gradient, Laplacian
    G = Gradient((8, 9))
    V = Divergence((2, 8, 9))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 9)))
    y = jnp.asarray(rng.standard_normal((2, 8, 9)))
    d1 = float(jnp.vdot(G.apply(x).ravel(), y.ravel()))
    d2 = float(jnp.vdot(x.ravel(), V.apply(y).ravel()))
    assert np.isclose(d1, -d2, rtol=1e-10)  # div = -grad^T
    L = Laplacian((8, 9))
    interior = (slice(1, -1), slice(1, -1))
    diff = (V.apply(G.apply(x)) - L.apply(x))[interior]
    assert float(jnp.abs(diff).max()) < 1e-10  # div(grad) = centered Laplacian


def test_from_torch_prox_traced_tau():
    import pytest
    torch = pytest.importorskip("torch")
    from pyxu_tpu.abc.operator import ProxFunc
    from pyxu_tpu.operator.interop import from_torch

    def t_apply(x):
        return x.abs().sum(dim=-1)

    def t_prox(x, tau):
        return x.sign() * (x.abs() - tau).clamp(min=0)

    op = from_torch(ProxFunc, (4,), apply=t_apply, prox=t_prox)
    x = jnp.asarray([3.0, -0.2, 1.0, 0.0], jnp.float32)

    @jax.jit
    def run(v, tau):  # tau is traced here
        return op.prox(v, tau)

    got = run(x, jnp.asarray(1.0, jnp.float32))
    assert np.allclose(got, [2.0, 0.0, 0.0, 0.0])


def test_from_torch_batched_adjoint():
    import pytest
    torch = pytest.importorskip("torch")
    from pyxu_tpu.abc.operator import LinOp as LO
    from pyxu_tpu.operator.interop import from_torch
    A = rng0.standard_normal((4, 3)).astype(np.float32)

    def t_apply(x):
        return torch.einsum("...j,ij->...i", x, torch.from_numpy(A))

    op = from_torch(LO, (3,), (4,), apply=t_apply)
    Y = jnp.asarray(rng0.standard_normal((5, 4)), jnp.float32)  # batched
    got = np.asarray(op.adjoint(Y))
    want = np.asarray(Y) @ A
    assert np.allclose(got, want, atol=1e-5)


def test_from_source_forwards_pinv():
    from pyxu_tpu.abc.operator import LinOp as LO
    from pyxu_tpu.operator.interop import from_source
    called = {}

    def my_pinv(arr, damp=0.0, **kw):
        called["yes"] = True
        return jnp.zeros(3)

    op = from_source(LO, (3,), (3,), apply=lambda x: 2 * x, pinv=my_pinv)
    op.pinv(jnp.ones(3))
    assert called.get("yes")


def test_trace_blocked_matches_dense():
    from pyxu_tpu.math.linalg import trace
    from pyxu_tpu.operator.linop import ExplicitLinOp
    Q = rng0.standard_normal((30, 30))
    op = ExplicitLinOp(jnp.asarray(Q))
    got = float(trace(op, block=7))  # forces multiple ragged blocks
    assert np.isclose(got, np.trace(Q), rtol=1e-6)


# ------------------------------------------- interop/math review fixes -----

import pytest

def test_from_source_quadratic_spec_derives_grad_prox():
    """Reference supports from_source(QuadraticFunc, ..., _quad_spec=...)
    (source.py:15-262); grad/prox must derive from the spec."""
    from pyxu_tpu.abc.operator import QuadraticFunc
    from pyxu_tpu.operator.interop import from_source
    from pyxu_tpu.operator.linop.base import DiagonalOp, ExplicitLinOp
    import numpy as _np
    v = jnp.asarray([1.0, 2.0, 4.0, 0.5])
    Q = DiagonalOp(v)
    cvec = jnp.asarray([0.5, -1.0, 0.0, 2.0])
    c = ExplicitLinOp(cvec.reshape(1, 4)).squeeze_linfunc() if hasattr(
        ExplicitLinOp(cvec.reshape(1, 4)), "squeeze_linfunc") else None
    from pyxu_tpu.operator.interop.source import from_source as fs
    op = fs(QuadraticFunc, (4,),
            apply=lambda x: 0.5 * jnp.sum(x * (v * x), -1),
            _quad_spec=lambda: (Q, _nullfunc((4,)), jnp.asarray(0.0)))
    x = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    np.testing.assert_allclose(np.asarray(op.grad(x)), np.asarray(v),
                               atol=1e-6)
    # prox solves (I + tau Q) p = x
    p = np.asarray(op.prox(x, 0.5))
    want = 1.0 / (1.0 + 0.5 * np.asarray(v))
    np.testing.assert_allclose(p, want, atol=1e-4)


def _nullfunc(shape):
    from pyxu_tpu.operator.linop.base import NullFunc
    return NullFunc(shape)


def test_linesearch_rejects_nan_overstep():
    from pyxu_tpu.math.linesearch import backtracking_linesearch
    from pyxu_tpu.operator.interop import from_source
    from pyxu_tpu.abc.operator import DiffFunc

    def apply(x):
        v = jnp.sum(x ** 2, -1)
        return jnp.where(v > 2.0, jnp.nan, v)

    f = from_source(DiffFunc, (2,), apply=apply,
                    grad=lambda x: 2 * x, diff_lipschitz=2.0)
    x = jnp.asarray([0.9, 0.9])       # ||x||^2 = 1.62; step 1 -> NaN zone
    d = jnp.asarray([1.0, 1.0])
    a = float(backtracking_linesearch(f, x, d, a0=1.0))
    fa = float(apply(x + a * d))
    assert np.isfinite(fa), "accepted a NaN overstep"
    assert a < 1.0


def test_linesearch_a0_defaults_to_inv_diff_lipschitz():
    from pyxu_tpu.math.linesearch import backtracking_linesearch
    from pyxu_tpu.operator.func import SquaredL2Norm
    f = SquaredL2Norm((3,))            # diff_lipschitz = 2
    x = jnp.ones(3)
    d = -f.grad(x)                      # descent direction: a0 accepted
    a = float(backtracking_linesearch(f, x, d))
    assert abs(a - 1.0 / float(f.diff_lipschitz)) < 1e-6


def test_from_jax_jit_skips_nonarray_methods():
    from pyxu_tpu.abc.operator import LinOp
    from pyxu_tpu.operator.interop import from_jax
    op = from_jax(LinOp, (4,), (4,), jit=True,
                  apply=lambda x: 2 * x, adjoint=lambda y: 2 * y,
                  svdvals=lambda k=1, **kw: jnp.full((k,), 2.0))
    s = np.asarray(op.svdvals(k=2))   # k used as a shape -> must not trace
    np.testing.assert_allclose(s, [2.0, 2.0])


def test_svdvals_ascending_reference_contract():
    """Reference svds contract: ascending order (abc/operator.py:1509-1579)."""
    from pyxu_tpu.operator.linop.base import DiagonalOp, ExplicitLinOp
    from pyxu_tpu.operator.linop.kron import kron
    d = DiagonalOp(jnp.asarray([3.0, -1.0, 2.0]))
    np.testing.assert_allclose(np.asarray(d.svdvals(2)), [2.0, 3.0])
    M = ExplicitLinOp(jnp.asarray([[3.0, 0.0], [0.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(M.svdvals(2)), [1.0, 3.0])
    kd = kron(d, M)
    np.testing.assert_allclose(np.asarray(kd.svdvals(2)), [6.0, 9.0])
    # subspace-iteration path too
    s = np.asarray(M.gram().svdvals(k=2, maxiter=48))
    assert s[0] <= s[-1]


def test_trace_requires_square():
    from pyxu_tpu.math.linalg import trace
    from pyxu_tpu.operator.linop.base import ExplicitLinOp
    A = ExplicitLinOp(jnp.ones((5, 3)))
    with pytest.raises(ValueError, match="square"):
        trace(A)


def test_from_torch_forwards_constants_and_rejects_typos():
    torch = pytest.importorskip("torch")
    from pyxu_tpu.abc.operator import Map
    from pyxu_tpu.operator.interop import from_torch
    op = from_torch(Map, (3,), (3,), apply=lambda t: 2 * t, lipschitz=2.0)
    assert float(op.lipschitz) == 2.0
    with pytest.raises(AssertionError, match="unknown"):
        from_torch(Map, (3,), (3,), apply=lambda t: 2 * t, prox_=lambda t: t)


def test_from_sciop_matches_dense_batched():
    import scipy.sparse.linalg as spla
    from pyxu_tpu.operator.interop import from_sciop
    rng = np.random.default_rng(3)
    A = rng.standard_normal((5, 4)).astype(np.float32)
    op = from_sciop(spla.aslinearoperator(A))
    x = jnp.asarray(rng.standard_normal((7, 4)), jnp.float32)
    np.testing.assert_allclose(np.asarray(op.apply(x)),
                               np.asarray(x) @ A.T, atol=1e-5)
    y = jnp.asarray(rng.standard_normal((7, 5)), jnp.float32)
    np.testing.assert_allclose(np.asarray(op.adjoint(y)),
                               np.asarray(y) @ A, atol=1e-5)


# -------------------------------------- directional/filter parity fixes ----

def test_directional_derivative_normalizes_and_defaults_fd():
    from pyxu_tpu.operator.linop.diff import DirectionalDerivative
    x = jnp.asarray(np.random.default_rng(0).random((8, 8)), jnp.float32)
    d1 = DirectionalDerivative((8, 8), 1, jnp.asarray([1.0, 0.0]))
    d2 = DirectionalDerivative((8, 8), 1, jnp.asarray([2.0, 0.0]))
    np.testing.assert_allclose(np.asarray(d1.apply(x)),
                               np.asarray(d2.apply(x)), atol=1e-6)
    # backward-compatible (shape, directions) call
    d3 = DirectionalDerivative((8, 8), jnp.asarray([1.0, 0.0]))
    np.testing.assert_allclose(np.asarray(d3.apply(x)),
                               np.asarray(d1.apply(x)), atol=1e-6)


def test_directional_laplacian_sign_matches_laplacian():
    """Axis-aligned directions: the reference's DirectionalLaplacian equals
    the ordinary (negative-definite) Laplacian — NOT its negation
    (reference diff.py:2475-2545 computes sum w_d v^T H v)."""
    from pyxu_tpu.operator.linop.diff import DirectionalLaplacian, Laplacian
    shape = (10, 10)
    dl = DirectionalLaplacian(shape, directions=[jnp.asarray([1.0, 0.0]),
                                                 jnp.asarray([0.0, 1.0])])
    lap = Laplacian(shape)
    x = jnp.asarray(np.random.default_rng(1).random(shape), jnp.float32)
    np.testing.assert_allclose(np.asarray(dl.apply(x)),
                               np.asarray(lap.apply(x)), atol=1e-5)


def test_directional_laplacian_weights_validated():
    from pyxu_tpu.operator.linop.diff import DirectionalLaplacian
    with pytest.raises(ValueError, match="weights and directions"):
        DirectionalLaplacian((6, 6),
                             directions=[jnp.asarray([1.0, 0.0]),
                                         jnp.asarray([0.0, 1.0])],
                             weights=[1.0])


def test_second_directional_derivative_order2():
    """order=2: v^T H v; for v = e_x it is d^2/dx^2."""
    from pyxu_tpu.operator.linop.diff import (DirectionalDerivative,
                                              PartialDerivative)
    shape = (12,)
    dd = DirectionalDerivative(shape, 2, jnp.asarray([1.0]))
    pd2 = PartialDerivative.finite_difference(shape, order=(2,),
                                              scheme="central", accuracy=2)
    x = jnp.asarray(np.random.default_rng(2).random(shape), jnp.float32)
    np.testing.assert_allclose(np.asarray(dd.apply(x)),
                               np.asarray(pd2.apply(x)), atol=1e-5)


def test_directional_hessian_no_field_differentiation():
    """Varying fields pointwise-weight the Hessian (reference: 'no
    differentiation is performed for this parameter')."""
    from pyxu_tpu.operator.linop.diff import DirectionalHessian, Hessian
    shape = (9, 9)
    v = np.zeros((2,) + shape, np.float32)
    v[0] = 1.0   # constant e_x field, but in 'varying' format
    dh = DirectionalHessian(shape, directions=[jnp.asarray(v)])
    hs = Hessian(shape)
    x = jnp.asarray(np.random.default_rng(3).random(shape), jnp.float32)
    got = np.asarray(dh.apply(x))         # (1, *shape): e_x^T H e_x = H_00
    want = np.asarray(hs.apply(x))[0]
    np.testing.assert_allclose(got[0], want, atol=1e-5)


def test_hessian_accepts_pair_and_all():
    from pyxu_tpu.operator.linop.diff import Hessian
    x = jnp.asarray(np.random.default_rng(4).random((8, 8)), jnp.float32)
    h_pair = Hessian((8, 8), directions=(0, 1))
    assert h_pair.codim_shape[0] == 1
    h_all = Hessian((8, 8), directions="all")
    assert h_all.codim_shape[0] == 3
    np.testing.assert_allclose(np.asarray(h_pair.apply(x))[0],
                               np.asarray(h_all.apply(x))[1], atol=1e-6)


def test_edge_filters_normalized_like_reference():
    """Sobel/Prewitt/Scharr smooth kernels are [1,2,1]/4, [1,1,1]/3,
    [3,10,3]/16 (reference filter.py:623, 722, 820)."""
    from pyxu_tpu.operator.linop.filter import Prewitt, Scharr, Sobel
    shape = (9, 9)
    imp = np.zeros(shape, np.float32); imp[4, 4] = 1.0
    x = jnp.asarray(imp)
    for fac, smooth in ((Sobel, [0.25, 0.5, 0.25]),
                        (Prewitt, [1/3, 1/3, 1/3]),
                        (Scharr, [3/16, 10/16, 3/16])):
        out = np.asarray(fac(shape, axis=0).apply(x))
        # correlation impulse response = flipped kernel
        want = np.outer([1.0, 0.0, -1.0], smooth)
        np.testing.assert_allclose(out[3:6, 3:6], want, atol=1e-6)


def test_gaussian_laplace_sampling_kwarg():
    from pyxu_tpu.operator.linop.filter import Gaussian, Laplace
    shape = (16,)
    x = jnp.asarray(np.random.default_rng(5).random(shape), jnp.float32)
    # sigma is in physical units: sigma=2 at spacing 0.5 equals sigma=4 in
    # pixels (reference filter.py:303: sigma_pix = sigma / sampling)
    ga = Gaussian(shape, sigma=2.0, sampling=0.5)
    gb = Gaussian(shape, sigma=4.0, sampling=1.0)
    np.testing.assert_allclose(np.asarray(ga.apply(x)),
                               np.asarray(gb.apply(x)), atol=1e-6)
    l1 = Laplace(shape, sampling=2.0)
    l2 = Laplace(shape)
    np.testing.assert_allclose(np.asarray(l1.apply(x)) * 2.0,
                               np.asarray(l2.apply(x)), atol=1e-6)


def test_stack_cache_actually_caches():
    from pyxu_tpu.operator import blocks as B
    from pyxu_tpu.operator.linop.base import DiagonalOp
    B._STACK_CACHE.clear()
    ops = tuple(DiagonalOp(jnp.full(4, float(i + 1))) for i in range(3))
    t1 = B._stack_ops(ops)
    assert len(B._STACK_CACHE) == 1
    t2 = B._stack_ops(ops)
    assert t2[1][0] is t1[1][0]   # same stacked leaf object => cache hit


# ----------------------------------------------- solver-engine review fixes --

def test_refit_with_new_tau_takes_effect():
    """The compiled-segment cache key must include hyperparameters: a re-fit
    with a different tau previously reused the program with the OLD tau
    baked in as a trace constant (silent wrong results)."""
    from pyxu_tpu.operator.func import SquaredL2Norm
    from pyxu_tpu.opt.solver import PGD
    from pyxu_tpu.opt.stop import MaxIter
    y = jnp.asarray([2.0, -3.0, 1.0])
    f = SquaredL2Norm((3,)).asloss(y)
    slv = PGD(f=f)
    slv.fit(x0=jnp.zeros(3), stop_crit=MaxIter(1), max_iter=1, tau=0.1,
            acceleration=False)
    x_small = np.asarray(slv.solution())
    slv.fit(x0=jnp.zeros(3), stop_crit=MaxIter(1), max_iter=1, tau=0.5,
            acceleration=False)
    x_big = np.asarray(slv.solution())
    # one gradient step from 0: x = tau * 2 * y -> scales linearly with tau
    np.testing.assert_allclose(x_small * 5.0, x_big, atol=1e-5)


def test_relerror_stops_on_divergence():
    from pyxu_tpu.operator.func import SquaredL2Norm
    from pyxu_tpu.opt.solver import PGD
    from pyxu_tpu.opt.stop import RelError
    f = SquaredL2Norm((4,)).asloss(jnp.ones(4))
    slv = PGD(f=f, stop_rate=1)
    # absurd step size -> divergence to inf/NaN; must stop early, not burn
    # the full max_iter
    slv.fit(x0=jnp.ones(4) * 100.0, stop_crit=RelError(1e-12), max_iter=5000,
            tau=1e6, segment_size=50)
    _, hist = slv.stats()
    assert hist is not None and hist["iteration"][-1] < 5000


def test_maxduration_enforced_mid_solve():
    import datetime as dt
    import time as _time
    from pyxu_tpu.operator.func import SquaredL2Norm
    from pyxu_tpu.opt.solver import PGD
    from pyxu_tpu.opt.stop import MaxDuration
    f = SquaredL2Norm((64,)).asloss(jnp.ones(64))
    slv = PGD(f=f, stop_rate=1)
    t0 = _time.monotonic()
    slv.fit(x0=jnp.zeros(64), stop_crit=MaxDuration(dt.timedelta(seconds=0.2)),
            max_iter=2_000_000, tau=1e-4)
    assert _time.monotonic() - t0 < 30.0
    _, hist = slv.stats()
    assert hist["iteration"][-1] < 2_000_000
    # host metric recorded into the history (reference records duration)
    assert "duration" in hist.dtype.names


def test_combined_duplicate_metric_keys_kept():
    from pyxu_tpu.opt.stop import RelError
    crit = RelError(1e-3, var="x") | RelError(1e-6, var="x")
    cs = crit.init_state({"x": jnp.ones(3)})
    cs, stop, metrics = crit.update(cs, {"x": jnp.ones(3) * 2}, 1)
    assert "RelError[x]" in metrics and "RelError[x]'" in metrics


def test_admm_gd_xupdate_inside_jit():
    """Non-quadratic differentiable f with K: the GD x-update's step size is
    now computed host-side in m_init (was estimating Lipschitz constants on
    traced operators, crashing inside the segment and silently returning
    x0)."""
    from pyxu_tpu.abc.operator import DiffFunc
    from pyxu_tpu.operator.func import L1Norm
    from pyxu_tpu.operator.interop import from_source
    from pyxu_tpu.operator.linop.base import ExplicitLinOp
    from pyxu_tpu.opt.solver import ADMM
    from pyxu_tpu.opt.stop import MaxIter
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal(4), jnp.float32)
    # smooth non-quadratic loss: sum log cosh(x - y)
    f = from_source(
        DiffFunc, (4,),
        apply=lambda x: jnp.sum(jnp.log(jnp.cosh(x - y)), -1),
        grad=lambda x: jnp.tanh(x - y),
        diff_lipschitz=1.0)
    K = ExplicitLinOp(jnp.asarray(rng.standard_normal((5, 4)), jnp.float32))
    slv = ADMM(f=f, h=0.01 * L1Norm((5,)), K=K)
    slv.fit(x0=jnp.zeros(4), stop_crit=MaxIter(60), max_iter=60, tau=1.0)
    x = np.asarray(slv.solution())
    # must have moved toward y (x0 would indicate the swallowed-crash path)
    assert np.linalg.norm(x - np.asarray(y)) < 0.8 * np.linalg.norm(np.asarray(y))


def test_admm_rejects_typo_kwargs():
    from pyxu_tpu.operator.func import L1Norm, SquaredL2Norm
    from pyxu_tpu.opt.solver import ADMM
    from pyxu_tpu.opt.stop import MaxIter
    slv = ADMM(f=SquaredL2Norm((3,)).asloss(jnp.ones(3)), h=L1Norm((3,)))
    with pytest.raises(TypeError):
        slv.fit(x0=jnp.zeros(3), stop_crit=MaxIter(2), max_iter=2, tau0=0.1)


def test_manual_steps_jit_cached():
    from pyxu_tpu.operator.func import SquaredL2Norm
    from pyxu_tpu.opt.solver import PGD
    from pyxu_tpu.opt.stop import MaxIter
    from pyxu_tpu.abc.solver import Mode
    f = SquaredL2Norm((3,)).asloss(jnp.ones(3))
    slv = PGD(f=f)
    gen = slv.fit(x0=jnp.zeros(3), mode=Mode.MANUAL, stop_crit=MaxIter(3),
                  max_iter=3, tau=0.1)
    next(gen)
    fn1 = slv._step_cache[1]
    gen2 = slv.fit(x0=jnp.zeros(3), mode=Mode.MANUAL, stop_crit=MaxIter(3),
                   max_iter=3, tau=0.1)
    next(gen2)
    assert slv._step_cache[1] is fn1


# ----------------------------------------------- core-algebra review fixes --

def test_nonlinear_chain_diff_lipschitz_is_inf():
    """(x^2/2) o (x^2/2) = x^4/8 has no finite diff-Lipschitz; the reference
    ChainRule reports infinity (a product heuristic under-reports and a
    1/dL step size diverges)."""
    import math
    sq = from_source(DiffFunc, (3,),
                     apply=lambda x: jnp.sum(0.5 * x ** 2, -1),
                     grad=lambda x: x, diff_lipschitz=1.0)
    sq_map = from_source(
        __import__("pyxu_tpu.abc.operator", fromlist=["DiffMap"]).DiffMap,
        (3,), (3,), apply=lambda x: 0.5 * x ** 2)
    comp = sq * sq_map
    assert math.isinf(comp.estimate_diff_lipschitz())


def test_linear_chain_diff_lipschitz_zero():
    from pyxu_tpu.operator.linop.base import ExplicitLinOp
    A = ExplicitLinOp(jnp.eye(3))
    B = ExplicitLinOp(jnp.eye(3))
    comp = A * B
    assert float(comp.diff_lipschitz) == 0.0


def test_cast_estimate_diff_lipschitz_delegates():
    from pyxu_tpu.abc.operator import ProxDiffFunc, QuadraticFunc
    from pyxu_tpu.operator.linop.base import DiagonalOp
    qf = QuadraticFunc((4,), Q=DiagonalOp(jnp.asarray([1.0, 2.0, 3.0, 4.0])))
    cast = qf.asop(ProxDiffFunc)
    dL = cast.estimate_diff_lipschitz()
    assert abs(float(dL) - 4.0) < 1e-3


def test_asloss_host_data_stays_host_side():
    """asloss(np_array) must not require an eager device round-trip of the
    negated data (poison hazard on some TPU runtimes)."""
    y = np.asarray([1.0, -2.0, 3.0], np.float32)
    f = SquaredL2Norm((3,)).asloss(y)
    x = jnp.asarray([1.0, -2.0, 3.0], jnp.float32)
    assert abs(float(f.apply(x))) < 1e-6


def test_pinv_warm_start_and_typo_rejection():
    from pyxu_tpu.operator.linop.base import ExplicitLinOp
    rng = np.random.default_rng(0)
    A = ExplicitLinOp(jnp.asarray(rng.standard_normal((5, 4)), jnp.float32))
    y = jnp.asarray(rng.standard_normal(5), jnp.float32)
    x1 = A.pinv(y, maxiter=60)
    x2 = A.pinv(y, kwargs_init={"x0": x1}, maxiter=60)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-4)
    with pytest.raises(AssertionError, match="unknown pinv"):
        A.pinv(y, rtoll=1e-3)


def test_linfunc_svdvals_padded():
    from pyxu_tpu.operator.linop import ExplicitLinFunc
    w = jnp.asarray([3.0, 4.0])
    s = np.asarray(ExplicitLinFunc(w).svdvals(k=2))
    np.testing.assert_allclose(s, [0.0, 5.0], atol=1e-6)


# --------------------------------------------- ufunc/norm/fft review fixes --

def test_ufunc_jacobian_inside_jit():
    """DiagonalOp's eager posdef probe must not concretize traced jacobian
    diagonals (all 23 differentiable ufuncs crashed inside jit)."""
    from pyxu_tpu.operator.map.ufunc import Sin
    op = Sin((4,))
    x = jnp.asarray([0.1, 0.5, 1.0, 2.0])
    got = jax.jit(lambda v: op.jacobian(v).apply(v))(x)
    want = np.cos(np.asarray(x)) * np.asarray(x)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_fft_eager_apply_routes_through_jit():
    """Eager FFT applies run the complex pipeline under jit (eager complex
    arithmetic poisons some TPU runtimes); result matches numpy."""
    from pyxu_tpu.operator.linop import FFT
    from pyxu_tpu.utils.complex import view_as_complex, view_as_real
    rng = np.random.default_rng(0)
    z = rng.standard_normal((4, 5)) + 1j * rng.standard_normal((4, 5))
    op = FFT((4, 5))
    out = view_as_complex(np.asarray(op.apply(
        jnp.asarray(view_as_real(z.astype(np.complex64))))))
    np.testing.assert_allclose(out, np.fft.fftn(z), atol=1e-4)


def test_linf_norm_lipschitz_and_tau0_prox():
    from pyxu_tpu.operator.func import LInfinityNorm
    f = LInfinityNorm((4,))
    assert float(f.lipschitz) == 1.0   # reference norm.py:248
    x = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    np.testing.assert_allclose(np.asarray(f.prox(x, 0.0)), np.asarray(x))
    # and normal tau still soft-shrinks the max
    p = np.asarray(f.prox(x, 1.0))
    assert p.max() < 4.0 and np.isfinite(p).all()


def test_l21_axis_validation():
    from pyxu_tpu.operator.func import L21Norm
    with pytest.raises(ValueError, match="duplicate"):
        L21Norm((3, 4), l2_axis=(0, -2))
    with pytest.raises(ValueError, match="out of range"):
        L21Norm((3, 4), l2_axis=(5,))


def test_ufunc_functional_positional_args():
    from pyxu_tpu.operator.map import ufunc
    from pyxu_tpu.operator.map.ufunc import Sin
    op = ufunc.clip(Sin((4,)), 0.0, 0.5)
    x = jnp.asarray([0.1, 1.0, -1.0, 2.0])
    got = np.asarray(op.apply(x))
    np.testing.assert_allclose(got, np.clip(np.sin(np.asarray(x)), 0.0, 0.5),
                               atol=1e-6)


class TestRound2ReviewFixes:
    """Round-2 code-review regressions (NUFFT diagnostics + engine fetch)."""

    def test_type2_dense_not_conjugated(self):
        from pyxu_tpu.operator import NUFFT
        rng = np.random.default_rng(0)
        x = rng.uniform(-np.pi, np.pi, (15, 2))
        A2 = NUFFT.type2(x, (5, 4), isign=-1, eps=1e-8)
        D = A2.ascomplexarray()
        f = rng.normal(size=(5, 4)) + 1j * rng.normal(size=(5, 4))
        fr = jnp.asarray(np.stack([f.real, f.imag], -1).astype(np.float32))
        got = np.asarray(A2.apply(fr))
        gotc = got[:, 0] + 1j * got[:, 1]
        want = D @ f.ravel()
        assert np.abs(gotc - want).max() / np.abs(want).max() < 1e-5

    def test_chunked_mesh_no_attribute_error(self):
        from pyxu_tpu.operator import NUFFT
        rng = np.random.default_rng(1)
        x = rng.uniform(-1, 1, (40, 2)) + 5.0
        z = rng.uniform(-4, 4, (30, 2))
        C = NUFFT.type3(x, z, chunked=True, fft_mem_mb=0.05)
        for scale in ("unit", "source", "target"):
            g = C.mesh(scale=scale)
            assert g.ndim == 3 and g.shape[-1] == 2

    def test_modeord_refused_not_swallowed(self):
        from pyxu_tpu.operator import NUFFT
        x = np.random.default_rng(2).uniform(-np.pi, np.pi, (9, 1))
        with pytest.raises(NotImplementedError):
            NUFFT.type1(x, 8, modeord=1)
        NUFFT.type1(x, 8, modeord=0)  # our behavior already: accepted

    def test_source_mesh_odd_axis(self):
        from pyxu_tpu.operator import NUFFT
        x = np.random.default_rng(3).uniform(-np.pi, np.pi, (5, 1))
        m = NUFFT.type1(x, 3, eps=1e-3).mesh(scale="source")[..., 0]
        np.testing.assert_allclose(
            m, np.linspace(-np.pi, np.pi, 3, endpoint=False))

    def test_type2_real_input(self):
        from pyxu_tpu.operator import NUFFT
        rng = np.random.default_rng(4)
        x = rng.uniform(-np.pi, np.pi, (12, 2))
        A = NUFFT.type2(x, (4, 3), real=True)
        assert A.dim_shape == (4, 3)
        f = rng.normal(size=(4, 3)).astype(np.float32)
        got = np.asarray(A.apply(jnp.asarray(f)))
        want = A.ascomplexarray() @ f.ravel().astype(np.float64)
        gotc = got[:, 0] + 1j * got[:, 1]
        assert np.abs(gotc - want).max() / np.abs(want).max() < 1e-5
        adj = np.asarray(A.adjoint(jnp.asarray(got)))
        assert adj.shape == (4, 3)
        lhs = float(np.sum(got * got))
        rhs = float(np.sum(f * adj))
        assert abs(lhs - rhs) / abs(lhs) < 1e-4

    def test_multisegment_fit_converges(self):
        """Multi-segment fits drive k_end off the host mirror (one packed
        fetch per segment); 4 segments of 5 == one segment of 20."""
        from pyxu_tpu.operator import L1Norm, SquaredL2Norm
        from pyxu_tpu.opt.solver import PGD
        from pyxu_tpu.opt.stop import MaxIter
        y = jnp.asarray(np.random.default_rng(5).standard_normal(16),
                        jnp.float32)
        f = SquaredL2Norm((16,)).asloss(y)
        g = 0.1 * L1Norm((16,))
        a = PGD(f=f, g=g)
        a.fit(x0=jnp.zeros(16), stop_crit=MaxIter(20), max_iter=20,
              segment_size=5)
        b = PGD(f=f, g=g)
        b.fit(x0=jnp.zeros(16), stop_crit=MaxIter(20), max_iter=20,
              segment_size=20)
        np.testing.assert_allclose(np.asarray(a.solution()),
                                   np.asarray(b.solution()), atol=1e-6)
        _, hist = a.stats()
        assert hist["iteration"][-1] == 20
