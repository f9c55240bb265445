"""Arithmetic rule engine: composite operators re-run the conformance suite
and are value-checked against dense linear algebra (reference:
src/pyxu_tests/operator/arithmetic/test_*rule.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conformance import ConformanceSuite
from pyxu_tpu.abc.operator import LinOp, Map, Property, ProxFunc, QuadraticFunc
from pyxu_tpu.operator.func import L1Norm, SquaredL2Norm
from pyxu_tpu.operator.linop import (
    DiagonalOp,
    ExplicitLinOp,
    HomothetyOp,
    IdentityOp,
    Pad,
    SubSample,
)

rng0 = np.random.default_rng(11)
_A = rng0.standard_normal((6, 5))
_B = rng0.standard_normal((5, 5))


def _exp(A, fdtype=np.float64):
    op = ExplicitLinOp(jnp.asarray(A, fdtype))
    op.estimate_lipschitz()
    return op


class TestScaleRule(ConformanceSuite):
    @pytest.fixture
    def op(self, fdtype):
        return -2.5 * _exp(_A, fdtype)

    def test_value(self, rng, fdtype):
        op = -2.5 * _exp(_A, fdtype)
        x = jnp.asarray(rng.standard_normal(5), fdtype)
        assert np.allclose(op.apply(x), -2.5 * (_A.astype(fdtype) @ np.asarray(x)), atol=1e-4)


class TestAddRule(ConformanceSuite):
    @pytest.fixture
    def op(self, fdtype):
        return _exp(_B, fdtype) + 3.0 * IdentityOp((5,))

    def test_value(self, rng, fdtype):
        op = _exp(_B, fdtype) + 3.0 * IdentityOp((5,))
        x = jnp.asarray(rng.standard_normal(5), fdtype)
        want = _B.astype(fdtype) @ np.asarray(x) + 3.0 * np.asarray(x)
        assert np.allclose(op.apply(x), want, atol=1e-4)


class TestChainRule(ConformanceSuite):
    @pytest.fixture
    def op(self, fdtype):
        return _exp(_A, fdtype) * _exp(_B, fdtype)

    def test_value(self, rng, fdtype):
        op = _exp(_A, fdtype) * _exp(_B, fdtype)
        x = jnp.asarray(rng.standard_normal(5), fdtype)
        want = _A @ (_B @ np.asarray(x, np.float64))
        assert np.allclose(op.apply(x), want, atol=1e-3)


class TestTransposeRule(ConformanceSuite):
    @pytest.fixture
    def op(self, fdtype):
        return _exp(_A, fdtype).T

    def test_value(self, rng, fdtype):
        op = _exp(_A, fdtype).T
        y = jnp.asarray(rng.standard_normal(6), fdtype)
        assert np.allclose(op.apply(y), _A.T @ np.asarray(y, np.float64), atol=1e-3)


class TestPowerRule(ConformanceSuite):
    @pytest.fixture
    def op(self, fdtype):
        return _exp(_B, fdtype) ** 3

    def test_value(self, rng, fdtype):
        op = _exp(_B, fdtype) ** 3
        x = jnp.asarray(rng.standard_normal(5), fdtype)
        want = np.linalg.matrix_power(_B, 3) @ np.asarray(x, np.float64)
        assert np.allclose(op.apply(x), want, atol=1e-2)


class TestArgScaledL1(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return L1Norm((5,)).argscale(2.0)


class TestArgShiftedSqL2(ConformanceSuite):
    @pytest.fixture
    def op(self, fdtype):
        shift = jnp.asarray(rng0.standard_normal(4), fdtype)
        return SquaredL2Norm((4,)).argshift(shift)


class TestL1AfterUnitaryChain(ConformanceSuite):
    """prox survives composition with a unitary op
    (reference: ChainRule prox special case, abc/arithmetic.py:1034-1344)."""

    @pytest.fixture
    def op(self):
        from pyxu_tpu.abc.operator import UnitOp
        # permutation = unitary subsample of all indices; class-level
        # unitarity must be declared via asop (reference behaves the same:
        # prox survives only a UnitOp rhs)
        perm = SubSample((5,), np.array([3, 1, 4, 0, 2])).asop(UnitOp)
        return L1Norm((5,)) * perm

    def test_prox_exists(self, op, rng, fdtype):
        assert op.has(Property.PROXIMABLE)
        x = jnp.asarray(rng.standard_normal(5), fdtype)
        p = op.prox(x, 0.5)
        want = np.sign(np.asarray(x)) * np.maximum(np.abs(np.asarray(x)) - 0.5, 0)
        assert np.allclose(p, want, atol=1e-5)


class TestQuadraticAfterLinear(ConformanceSuite):
    """quadratic o linear stays quadratic (reference: ChainRule,
    abc/arithmetic.py:1230-1260)."""

    @pytest.fixture
    def op(self, fdtype):
        return SquaredL2Norm((6,)) * _exp(_A, fdtype)

    def test_is_quadratic(self, op):
        assert op.has(Property.QUADRATIC)

    def test_grad(self, op, rng, fdtype):
        x = jnp.asarray(rng.standard_normal(5), fdtype)
        want = 2.0 * _A.T @ (_A @ np.asarray(x, np.float64))
        assert np.allclose(op.grad(x), want, atol=1e-3)


class TestLinearAddProx(ConformanceSuite):
    """prox of (proxable + linear) = prox(arr - tau * grad(linear))
    (reference: AddRule, abc/arithmetic.py:667-1031)."""

    @pytest.fixture
    def op(self, fdtype):
        from pyxu_tpu.operator.linop.base import ExplicitLinFunc
        w = jnp.asarray(rng0.standard_normal(5), fdtype)
        return L1Norm((5,)) + ExplicitLinFunc(w)

    def test_is_proximable(self, op):
        assert op.has(Property.PROXIMABLE)


def test_class_inference():
    assert isinstance(HomothetyOp((4,), 2.0) * HomothetyOp((4,), 3.0), LinOp)
    comp = _exp(_A) * _exp(_A).T
    assert comp.has(Property.LINEAR_SQUARE)
    s = L1Norm((5,)) * 1.0
    assert s is not None and s.has(Property.PROXIMABLE)
    z = 0.0 * L1Norm((5,))
    x = jnp.zeros(5)
    assert float(z.apply(x)) == 0.0


def test_scale_prox_survives_positive():
    """alpha > 0 keeps prox (reference: ScaleRule, abc/arithmetic.py:65-258)."""
    op = 2.0 * L1Norm((5,))
    assert op.has(Property.PROXIMABLE)
    x = jnp.asarray([3.0, -1.0, 0.5, 0.0, -4.0])
    got = op.prox(x, 1.0)  # prox of 2*||.||_1 with tau=1 = soft at 2
    want = np.sign(np.asarray(x)) * np.maximum(np.abs(np.asarray(x)) - 2.0, 0)
    assert np.allclose(got, want)


def test_neg_l1_loses_prox():
    op = -1.0 * L1Norm((5,))
    assert not op.has(Property.PROXIMABLE)


def test_lipschitz_propagation():
    a = _exp(_A)
    b = _exp(_B)
    La, Lb = a.lipschitz, b.lipschitz
    assert np.isclose((a * b).lipschitz, La * Lb, rtol=1e-5)
    assert (b + IdentityOp((5,))).lipschitz <= Lb + 1 + 1e-6
    assert np.isclose((3.0 * a).lipschitz, 3 * La, rtol=1e-5)


def test_expr_tree():
    op = (2.0 * IdentityOp((4,))) * Pad((4,), 0, mode="constant").T
    s = op.expr()
    assert "scale" in s or "Homothety" in s or "chain" in s
