"""Filters + ufunc maps (reference: src/pyxu_tests/operator/linop/test_filter.py,
operator/map/test_ufunc.py)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.ndimage as snd

from conformance import ConformanceSuite
from pyxu_tpu.operator.linop import (
    DifferenceOfGaussians,
    Gaussian,
    Laplace,
    MovingAverage,
    Sobel,
    StructureTensor,
)
from pyxu_tpu.operator.map import ufunc
from pyxu_tpu.abc.operator import Property


class TestMovingAverage(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return MovingAverage((6, 7), size=3, mode="symmetric")

    @pytest.fixture
    def data_apply(self):
        """Hard-coded ground truth (reference discipline:
        src/pyxu_tests/operator/examples/): a 3x3 box mean spreads a
        height-9 delta into a 3x3 block of ones."""
        x = np.zeros((6, 7))
        x[2, 3] = 9.0
        want = np.zeros((6, 7))
        want[1:4, 2:5] = 1.0
        return x, want

    def test_matches_scipy(self, rng, fdtype):
        op = MovingAverage((6, 7), size=3, mode="symmetric")
        x = rng.standard_normal((6, 7))
        want = snd.uniform_filter(x, size=3, mode="reflect")
        assert np.allclose(op.apply(jnp.asarray(x, fdtype)), want, atol=1e-4)


class TestGaussianFilter(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return Gaussian((8, 8), sigma=1.2, mode="symmetric")

    def test_matches_scipy(self, rng, fdtype):
        op = Gaussian((8, 8), sigma=1.2, truncate=3.0, mode="symmetric")
        x = rng.standard_normal((8, 8))
        want = snd.gaussian_filter(x, sigma=1.2, truncate=3.0, mode="reflect")
        assert np.allclose(op.apply(jnp.asarray(x, fdtype)), want, atol=1e-3)


class TestDoG(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return DifferenceOfGaussians((8, 8), low_sigma=1.0)


class TestLaplaceFilter(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return Laplace((7, 7))

    @pytest.fixture
    def data_apply(self):
        """[1,-2,1] in both axes on the ramp x[i,j]=i under the default
        constant (zero) padding: interior 0; the top row reads the zero pad
        (+1), the bottom row loses x[7] (x[5]-2x[6] = -7), and the first/
        last columns lose one horizontal neighbor of the constant row i
        (-i each).  Hand-derived."""
        x = np.tile(np.arange(7.0)[:, None], (1, 7))
        want = np.zeros((7, 7))
        want[0, :] += 1.0
        want[-1, :] += -7.0
        want[:, 0] += -np.arange(7.0)
        want[:, -1] += -np.arange(7.0)
        return x, want

    def test_matches_scipy(self, rng, fdtype):
        op = Laplace((7, 7), mode="symmetric")
        x = rng.standard_normal((7, 7))
        want = snd.laplace(x, mode="reflect")
        assert np.allclose(op.apply(jnp.asarray(x, fdtype)), want, atol=1e-4)


class TestSobelSingleAxis(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return Sobel((6, 6), axis=0, mode="symmetric")

    @pytest.fixture
    def data_apply(self):
        """Normalized Sobel ([-1,0,1] x [1,2,1]/4) on the ramp x[i,j]=i:
        central difference 2 in the interior, 1 at the reflected edges
        (hand-derived, cross-checked against scipy.ndimage.sobel/4)."""
        x = np.tile(np.arange(6.0)[:, None], (1, 6))
        want = np.tile(np.asarray([1.0, 2, 2, 2, 2, 1])[:, None], (1, 6))
        return x, want

    def test_matches_scipy(self, rng, fdtype):
        op = Sobel((6, 6), axis=0, mode="symmetric")
        x = rng.standard_normal((6, 6))
        # reference pyxu normalizes the smoothing kernel ([1,2,1]/4,
        # filter.py:623); scipy's sobel is unnormalized
        want = snd.sobel(x, axis=0, mode="reflect") / 4.0
        assert np.allclose(op.apply(jnp.asarray(x, fdtype)), want, atol=1e-4)


def test_sobel_magnitude():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((6, 6))
    op = Sobel((6, 6), mode="symmetric")
    g0 = snd.sobel(x, axis=0, mode="reflect") / 4.0
    g1 = snd.sobel(x, axis=1, mode="reflect") / 4.0
    want = np.sqrt(g0**2 + g1**2) / np.sqrt(2)
    assert np.allclose(op.apply(jnp.asarray(x)), want, atol=1e-4)


class TestStructureTensor(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return StructureTensor((6, 6), smooth_sigma=1.0, mode="symmetric")

    def test_shape(self, op):
        assert op.codim_shape == (3, 6, 6)


# ------------------------------------------------------------------ ufuncs --

_DIFF_CASES = [
    (ufunc.Sin, np.sin, (-2, 2)),
    (ufunc.Cos, np.cos, (-2, 2)),
    (ufunc.Tanh, np.tanh, (-2, 2)),
    (ufunc.Exp, np.exp, (-2, 2)),
    (ufunc.Sigmoid, lambda x: 1 / (1 + np.exp(-x)), (-2, 2)),
    (ufunc.Sqrt, np.sqrt, (0.1, 3)),
    (ufunc.Log, np.log, (0.1, 3)),
    (ufunc.Square, np.square, (-2, 2)),
    (ufunc.ArcTan, np.arctan, (-2, 2)),
    (ufunc.Gaussian, lambda x: np.exp(-x * x), (-2, 2)),
]


@pytest.mark.parametrize("cls,ref,rng_box", _DIFF_CASES,
                         ids=[c[0].__name__ for c in _DIFF_CASES])
def test_ufunc_value_and_jacobian(cls, ref, rng_box):
    rng = np.random.default_rng(5)
    lo, hi = rng_box
    x = jnp.asarray(rng.uniform(lo, hi, (4, 5)))
    op = cls((4, 5))
    assert np.allclose(op.apply(x), ref(np.asarray(x)), atol=1e-6)
    # jacobian diagonal vs finite differences
    J = op.jacobian(x)
    v = jnp.asarray(rng.standard_normal((4, 5)))
    eps = 1e-6
    fd = (op.apply(x + eps * v) - op.apply(x - eps * v)) / (2 * eps)
    assert np.allclose(J.apply(v), fd, atol=1e-4)


def test_ufunc_functional_form():
    from pyxu_tpu.operator.linop import ExplicitLinOp
    rng = np.random.default_rng(7)
    A = rng.standard_normal((4, 3))
    op = ufunc.tanh(ExplicitLinOp(jnp.asarray(A)))
    x = jnp.asarray(rng.standard_normal(3))
    assert np.allclose(op.apply(x), np.tanh(A @ np.asarray(x)), atol=1e-6)
    assert op.has(Property.DIFFERENTIABLE)


def test_softmax():
    op = ufunc.SoftMax((5,))
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal(5))
    p = np.asarray(op.apply(x))
    assert np.isclose(p.sum(), 1.0)
    J = op.jacobian(x)
    v = jnp.asarray(rng.standard_normal(5))
    eps = 1e-6
    fd = (op.apply(x + eps * v) - op.apply(x - eps * v)) / (2 * eps)
    assert np.allclose(J.apply(v), fd, atol=1e-4)


def test_relu_clip_sign():
    x = jnp.asarray([-1.5, 0.0, 2.0])
    assert np.allclose(ufunc.ReLU((3,)).apply(x), [0, 0, 2])
    assert np.allclose(ufunc.Clip((3,), a_min=-1, a_max=1).apply(x), [-1, 0, 1])
    assert np.allclose(ufunc.Sign((3,)).apply(x), [-1, 0, 1])
    assert np.allclose(ufunc.LeakyReLU((3,), alpha=0.1).apply(x), [-0.15, 0, 2])


def test_constant_valued():
    from pyxu_tpu.operator.map import ConstantValued
    f = ConstantValued((4,), (), 3.5)
    x = jnp.ones((2, 4))
    assert np.allclose(f.apply(x), 3.5)
    assert np.allclose(f.grad(x), 0.0)
    assert np.allclose(f.prox(x, 1.0), np.asarray(x))
