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

    @pytest.fixture
    def data_apply(self, request):
        """Hard-coded ground truth for every pad mode on x = 1..7."""
        x = np.arange(1.0, 8.0)
        mode = request.node.callspec.params["op"]
        want = {
            "constant":  [0, 0, 1, 2, 3, 4, 5, 6, 7, 0, 0, 0],
            "wrap":      [6, 7, 1, 2, 3, 4, 5, 6, 7, 1, 2, 3],
            "reflect":   [3, 2, 1, 2, 3, 4, 5, 6, 7, 6, 5, 4],
            "symmetric": [2, 1, 1, 2, 3, 4, 5, 6, 7, 7, 6, 5],
            "edge":      [1, 1, 1, 2, 3, 4, 5, 6, 7, 7, 7, 7],
        }.get(mode)
        if want is None:
            pytest.skip("no hard-coded ground truth")
        return x, np.asarray(want, np.float64)

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

    @pytest.fixture
    def data_apply(self, request):
        """Hard-coded ground truth (reference discipline:
        src/pyxu_tests/operator/examples/): x[i,j] = 10 i + j makes every
        selected entry human-readable."""
        x = 10.0 * np.arange(6)[:, None] + np.arange(5)[None, :]
        which = request.node.callspec.params["op"]
        if which == "slice":        # rows 0,2,4; cols 1..3
            want = np.asarray([[1.0, 2, 3], [21, 22, 23], [41, 42, 43]])
        elif which == "bool":       # rows 0,2,3,5, all cols
            want = x[[0, 2, 3, 5]]
        else:   # OUTER (cross) indexing: rows [4,0,2] x cols [1,1,3]
            want = np.asarray([[41.0, 41, 43], [1, 1, 3], [21, 21, 23]])
        return x, want

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
