"""Indicator functionals (reference: src/pyxu_tests/operator/func/test_indicator.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conformance import ConformanceSuite
from pyxu_tpu.operator.func import (
    AffineSet,
    ConvexSetIntersection,
    HyperSlab,
    L1Ball,
    L2Ball,
    LInfinityBall,
    PositiveOrthant,
    RangeSet,
)
from pyxu_tpu.operator.linop import ExplicitLinOp

rng0 = np.random.default_rng(47)


class TestL1Ball(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return L1Ball((5,), radius=2.0)

    def test_projection(self, op, rng, fdtype):
        x = jnp.asarray(rng.standard_normal(5) * 3, fdtype)
        p = np.asarray(op.prox(x, 1.0))
        assert np.abs(p).sum() <= 2.0 * (1 + 1e-5)
        inside = jnp.asarray([0.5, -0.5, 0.0, 0.3, 0.0], fdtype)
        assert np.allclose(op.prox(inside, 1.0), inside)


class TestL2Ball(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return L2Ball((4,), radius=1.5)


class TestLInfinityBall(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return LInfinityBall((4,), radius=0.7)

    def test_projection_is_clip(self, op, rng, fdtype):
        x = jnp.asarray(rng.standard_normal(4) * 3, fdtype)
        assert np.allclose(op.prox(x, 1.0), np.clip(np.asarray(x), -0.7, 0.7))


class TestPositiveOrthant(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return PositiveOrthant((5,))


class TestHyperSlab(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return HyperSlab(jnp.asarray([1.0, 2.0, 0.5]), lb=-1.0, ub=2.0)

    def test_projection(self, op, rng, fdtype):
        a = np.array([1.0, 2.0, 0.5])
        for _ in range(5):
            x = rng.standard_normal(3) * 4
            p = np.asarray(op.prox(jnp.asarray(x, fdtype), 1.0))
            ip = float(a @ p)
            assert -1.0 - 1e-4 <= ip <= 2.0 + 1e-4
            # projection is the closest slab point: residual parallel to a
            r = x - p
            if np.linalg.norm(r) > 1e-5:
                cos = abs(r @ a) / (np.linalg.norm(r) * np.linalg.norm(a))
                assert cos > 1 - 1e-5


class TestRangeSet(ConformanceSuite):
    @pytest.fixture
    def op(self):
        A = ExplicitLinOp(jnp.asarray(rng0.standard_normal((6, 3))))
        return RangeSet(A)

    def test_projection(self, op, rng, fdtype):
        A = np.asarray(op._A.asarray(), np.float64)
        x = rng.standard_normal(6)
        p = np.asarray(op.prox(jnp.asarray(x, jnp.float64), 1.0))
        P = A @ np.linalg.pinv(A)
        assert np.allclose(p, P @ x, atol=1e-5)


class TestAffineSet(ConformanceSuite):
    @pytest.fixture
    def op(self):
        A = ExplicitLinOp(jnp.asarray(rng0.standard_normal((3, 6))))
        b = jnp.asarray(rng0.standard_normal(3))
        return AffineSet(A, b)

    def test_projection(self, op, rng, fdtype):
        A = np.asarray(op._A.asarray(), np.float64)
        b = np.asarray(op._b, np.float64)
        x = rng.standard_normal(6)
        p = np.asarray(op.prox(jnp.asarray(x, jnp.float64), 1.0))
        assert np.allclose(A @ p, b, atol=1e-6)
        # KKT: x - p in row space of A
        r = x - p
        null = r - A.T @ np.linalg.lstsq(A.T, r, rcond=None)[0]
        assert np.linalg.norm(null) <= 1e-6


class TestConvexSetIntersection(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return ConvexSetIntersection(
            PositiveOrthant((4,)), LInfinityBall((4,), radius=1.0), n_iter=16
        )

    def test_projection_in_both(self, op, rng, fdtype):
        x = jnp.asarray(rng.standard_normal(4) * 3, fdtype)
        p = np.asarray(op.prox(x, 1.0))
        assert np.all(p >= -1e-6) and np.all(p <= 1.0 + 1e-6)
