"""Pad / SubSample / Trim / Sum conformance (reference:
src/pyxu_tests/operator/linop/test_{pad,select,reduce}.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conformance import ConformanceSuite
from pyxu_tpu.operator.linop import Pad, SubSample, Sum, Trim

MODES = ["constant", "wrap", "reflect", "symmetric", "edge"]


class TestPad1D(ConformanceSuite):
    @pytest.fixture(params=MODES)
    def op(self, request):
        return Pad((7,), (2, 3), mode=request.param)

    def test_matches_numpy_pad(self, op, rng, fdtype):
        x = rng.standard_normal(7).astype(fdtype)
        want = np.pad(x, (2, 3), mode=op._mode if op._mode != "constant" else "constant")
        assert np.allclose(op.apply(jnp.asarray(x)), want)


class TestPad2D(ConformanceSuite):
    @pytest.fixture(params=MODES)
    def op(self, request):
        return Pad((5, 6), ((1, 2), (2, 1)), mode=request.param)


class TestSubSample(ConformanceSuite):
    @pytest.fixture(params=["slice", "bool", "fancy"])
    def op(self, request):
        if request.param == "slice":
            return SubSample((6, 5), slice(0, None, 2), slice(1, 4))
        if request.param == "bool":
            mask = np.array([True, False, True, True, False, True])
            return SubSample((6, 5), mask)
        return SubSample((6, 5), np.array([4, 0, 2]), np.array([1, 1, 3]))

    def test_orthproj_gram_when_unique(self, op, rng, fdtype):
        # A A^T = I when indices are unique per axis
        idx = op._idx
        if any(len(set(i)) != len(i) for i in idx):
            pytest.skip("duplicate indices")
        y = jnp.asarray(rng.standard_normal(op.codim_shape), fdtype)
        assert np.allclose(op.apply(op.adjoint(y)), y, atol=1e-5)


class TestTrim(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return Trim((8, 7), ((1, 2), (0, 3)))


class TestSumAll(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return Sum((4, 5))


class TestSumAxis(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return Sum((4, 5, 3), axis=(0, 2))

    @pytest.fixture
    def data_apply(self):
        x = np.ones((4, 5, 3))
        return x, 12.0 * np.ones(5)
