"""Norm functionals + prox ground truths (reference:
src/pyxu_tests/operator/func/test_norm.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conformance import ConformanceSuite
from pyxu_tpu.operator.func import (
    L1Norm,
    L2Norm,
    L21Norm,
    LInfinityNorm,
    PositiveL1Norm,
    SquaredL1Norm,
    SquaredL2Norm,
)


class TestL1Norm(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return L1Norm((5,))

    @pytest.fixture
    def data_apply(self):
        return np.array([1.0, -2.0, 3.0, 0.0, -1.0]), 7.0

    def test_prox_soft_threshold(self, op, fdtype):
        x = jnp.asarray([3.0, -0.5, 0.2, -4.0, 0.0], fdtype)
        got = op.prox(x, 1.0)
        want = np.array([2.0, 0.0, 0.0, -3.0, 0.0])
        assert np.allclose(got, want)


class TestL2Norm(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return L2Norm((4,))

    def test_prox_shrinks_to_zero(self, op, fdtype):
        x = jnp.asarray([0.3, 0.0, -0.4, 0.0], fdtype)  # norm 0.5 < tau
        assert np.allclose(op.prox(x, 1.0), 0.0)


class TestSquaredL2Norm(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return SquaredL2Norm((4,))

    @pytest.fixture
    def data_apply(self):
        return np.array([1.0, 2.0, -1.0, 0.0]), 6.0

    def test_prox_closed_form(self, op, rng, fdtype):
        x = jnp.asarray(rng.standard_normal(4), fdtype)
        assert np.allclose(op.prox(x, 0.5), x / 2.0, atol=1e-5)


class TestSquaredL1Norm(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return SquaredL1Norm((5,))


class TestLInfinityNorm(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return LInfinityNorm((5,))

    @pytest.fixture
    def data_apply(self):
        return np.array([1.0, -7.0, 3.0, 0.0, 5.0]), 7.0


class TestL21Norm(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return L21Norm((3, 4), l2_axis=0)

    @pytest.fixture
    def data_apply(self):
        x = np.ones((3, 4))
        return x, 4 * np.sqrt(3.0)


class TestPositiveL1Norm(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return PositiveL1Norm((4,))

    def test_infinite_outside_orthant(self, op):
        assert np.isinf(float(op.apply(jnp.asarray([1.0, -0.1, 0.0, 2.0]))))

    def test_prox_in_orthant(self, op, rng, fdtype):
        x = jnp.asarray(rng.standard_normal(4), fdtype)
        p = op.prox(x, 0.3)
        assert np.all(np.asarray(p) >= 0)
