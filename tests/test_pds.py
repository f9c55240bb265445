"""Primal-dual family + NLCG + ProxAdam (reference:
src/pyxu_tests/opt/solver/test_{pds,nlcg,prox_adam}.py).

Strategy: small strongly-convex problems where independent algorithms must
agree; absolute ground truths from numpy where closed forms exist.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pyxu_tpu.operator.func import L1Norm, L21Norm, SquaredL2Norm
from pyxu_tpu.operator.linop import ExplicitLinOp, Gradient, IdentityOp
from pyxu_tpu.opt.solver import (
    ADMM,
    CG,
    NLCG,
    PD3O,
    PGD,
    ChambollePock,
    CondatVu,
    DavisYin,
    DouglasRachford,
    ForwardBackward,
    ProxAdam,
    ProximalPoint,
)
from pyxu_tpu.opt.stop import MaxIter, RelError

rng0 = np.random.default_rng(41)
_N = 20
_y = np.clip(rng0.standard_normal(_N).cumsum(), -2, 2)  # piecewise-ish signal
_LAM = 0.4


def _tv_objective(x):
    return 0.5 * np.sum((x - _y) ** 2) + _LAM * np.abs(np.diff(x)).sum()


def _tv_problem():
    """min 0.5||x-y||^2 + lam ||Dx||_1 with D = forward difference."""
    f = 0.5 * SquaredL2Norm((_N,)).asloss(jnp.asarray(_y))
    D = ExplicitLinOp(jnp.asarray(
        np.eye(_N, k=1)[: _N - 1] - np.eye(_N)[: _N - 1]))
    D.estimate_lipschitz()
    h = _LAM * L1Norm((_N - 1,))
    return f, h, D


def _solve(slv, x0=None, n=5000, **fit_kw):
    x0 = jnp.zeros(_N) if x0 is None else x0
    slv.fit(x0=x0, stop_crit=RelError(eps=1e-9, var="x") | MaxIter(n),
            max_iter=n, **fit_kw)
    return np.asarray(slv.solution())


def test_condatvu_pd3o_admm_agree():
    f, h, D = _tv_problem()
    x_cv = _solve(CondatVu(f=f, h=h, K=D))
    x_pd3o = _solve(PD3O(f=f, h=h, K=D))
    x_admm = _solve(ADMM(f=f, h=h, K=D, solver_kwargs={"maxiter": 30}))
    o = min(_tv_objective(x_cv), _tv_objective(x_pd3o), _tv_objective(x_admm))
    for x in (x_cv, x_pd3o, x_admm):
        assert _tv_objective(x) <= o * (1 + 1e-4) + 1e-6
    assert np.allclose(x_cv, x_pd3o, atol=1e-3)
    assert np.allclose(x_cv, x_admm, atol=1e-3)


def test_chambolle_pock():
    # min ||x - y||_1 ... use CP on f=0: min g(x) + h(Kx) with
    # g = 0.5||.-y||^2 (proxable quadratic), h = lam ||.||_1, K = D
    f, h, D = _tv_problem()
    slv = ChambollePock(g=f, h=h, K=D)
    x = _solve(slv)
    f2, h2, D2 = _tv_problem()
    x_ref = _solve(CondatVu(f=f2, h=h2, K=D2))
    assert np.allclose(x, x_ref, atol=1e-3)


def test_davis_yin():
    # min 0.5||x-y||^2 + lam||x||_1 + iota-free smooth term
    f = 0.5 * SquaredL2Norm((_N,)).asloss(jnp.asarray(_y))
    g = _LAM * L1Norm((_N,))
    h = _LAM * L1Norm((_N,))
    x = _solve(DavisYin(f=f, g=g, h=h))
    # ground truth: prox of 2lam L1 at ... solve with PGD on f + (g+h) via
    # soft threshold at 2 lam
    want = np.sign(_y) * np.maximum(np.abs(_y) - 2 * _LAM, 0)
    assert np.allclose(x, want, atol=1e-3)


def test_forward_backward_matches_pgd():
    f = 0.5 * SquaredL2Norm((_N,)).asloss(jnp.asarray(_y))
    g = _LAM * L1Norm((_N,))
    x_fb = _solve(ForwardBackward(f=f, g=g))
    want = np.sign(_y) * np.maximum(np.abs(_y) - _LAM, 0)
    assert np.allclose(x_fb, want, atol=1e-4)


def test_proximal_point():
    g = _LAM * L1Norm((_N,))
    slv = ProximalPoint(g=g)
    x = _solve(slv, x0=jnp.asarray(_y), n=200)
    assert np.allclose(x, 0.0, atol=1e-6)  # prox iterates shrink to argmin 0


def test_douglas_rachford():
    g = 0.5 * SquaredL2Norm((_N,)).asloss(jnp.asarray(_y))
    h = _LAM * L1Norm((_N,))
    x = _solve(DouglasRachford(g=g, h=h))
    want = np.sign(_y) * np.maximum(np.abs(_y) - _LAM, 0)  # argmin is ST(y)
    assert np.allclose(x, want, atol=1e-4)


def test_admm_classic():
    f = 0.5 * SquaredL2Norm((_N,)).asloss(jnp.asarray(_y))
    h = _LAM * L1Norm((_N,))
    x = _solve(ADMM(f=f, h=h))
    want = np.sign(_y) * np.maximum(np.abs(_y) - _LAM, 0)
    assert np.allclose(x, want, atol=1e-4)


def test_nlcg_quadratic():
    A = rng0.standard_normal((_N, _N))
    Q = A.T @ A + np.eye(_N)
    b = rng0.standard_normal(_N)
    from pyxu_tpu.abc.operator import PosDefOp
    from pyxu_tpu.abc.arithmetic import cast_op
    from pyxu_tpu.abc.operator import QuadraticFunc
    from pyxu_tpu.operator.linop.base import ExplicitLinFunc
    Qop = cast_op(ExplicitLinOp(jnp.asarray(Q)), PosDefOp)
    Qop.estimate_lipschitz()
    f = QuadraticFunc((_N,), Q=Qop, c=ExplicitLinFunc(jnp.asarray(-b)))
    slv = NLCG(f)
    slv.fit(x0=jnp.zeros(_N), stop_crit=RelError(eps=1e-12, var="x") | MaxIter(1500),
            max_iter=1500)
    assert np.allclose(slv.solution(), np.linalg.solve(Q, b), atol=1e-3)


@pytest.mark.parametrize("variant", ["adam", "amsgrad", "padam"])
def test_prox_adam_lasso(variant):
    A = rng0.standard_normal((30, _N))
    y = rng0.standard_normal(30)
    f = SquaredL2Norm((30,)).asloss(jnp.asarray(y)) * ExplicitLinOp(jnp.asarray(A))
    g = _LAM * L1Norm((_N,))
    slv = ProxAdam(f=f, g=g)
    slv.fit(x0=jnp.zeros(_N), variant=variant,
            stop_crit=RelError(eps=1e-7, var="x") | MaxIter(3000), max_iter=3000)
    x = np.asarray(slv.solution())
    # compare objective against FISTA solution
    ref = PGD(f=f, g=g)
    ref.fit(x0=jnp.zeros(_N), stop_crit=RelError(eps=1e-9, var="x") | MaxIter(5000),
            max_iter=5000)
    xr = np.asarray(ref.solution())

    def obj(v):
        return float(np.sum((A @ v - y) ** 2) + _LAM * np.abs(v).sum())

    assert obj(x) <= obj(xr) * 1.01 + 1e-6
