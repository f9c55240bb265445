"""Derivative-stack conformance (reference: src/pyxu_tests/operator/linop/diff/)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conformance import ConformanceSuite
from pyxu_tpu.operator.linop.diff import (
    DirectionalDerivative,
    DirectionalGradient,
    DirectionalLaplacian,
    Divergence,
    Gradient,
    Hessian,
    Jacobian,
    Laplacian,
    PartialDerivative,
    _fd_coeffs,
)


def test_fd_coefficients():
    off, c = _fd_coeffs(1, "forward", 1)
    assert np.allclose(c, [-1, 1]) and np.allclose(off, [0, 1])
    off, c = _fd_coeffs(1, "central", 2)
    assert np.allclose(c, [-0.5, 0, 0.5])
    off, c = _fd_coeffs(2, "central", 2)
    assert np.allclose(c, [1, -2, 1])
    off, c = _fd_coeffs(1, "backward", 1)
    assert np.allclose(c, [-1, 1]) and np.allclose(off, [-1, 0])


def test_fd_exact_on_polynomials():
    """Order-d FD of x^d equals d! (interior points)."""
    n = 16
    x = np.arange(n, dtype=np.float64)
    D2 = PartialDerivative.finite_difference((n,), 2, scheme="central", accuracy=2)
    got = np.asarray(D2.apply(jnp.asarray(x**2)))
    assert np.allclose(got[2:-2], 2.0, atol=1e-5)


def test_sampling_scale():
    n = 16
    h = 0.25
    x = np.arange(n, dtype=np.float64) * h
    D1 = PartialDerivative.finite_difference((n,), 1, scheme="central",
                                             accuracy=2, sampling=h)
    got = np.asarray(D1.apply(jnp.asarray(x**2)))
    assert np.allclose(got[2:-2], 2 * x[2:-2], atol=1e-4)


class TestPartialDerivative(ConformanceSuite):
    @pytest.fixture(params=["fd-fwd", "fd-central", "gd"])
    def op(self, request):
        if request.param == "fd-fwd":
            return PartialDerivative.finite_difference((6, 7), (1, 0))
        if request.param == "fd-central":
            return PartialDerivative.finite_difference((6, 7), (0, 2),
                                                       scheme="central", accuracy=2)
        return PartialDerivative.gaussian_derivative((8, 8), (1, 0), sigma=1.0)


class TestGradient(ConformanceSuite):
    @pytest.fixture(params=["constant", "symmetric"])
    def op(self, request):
        return Gradient((5, 6), mode=request.param)

    @pytest.fixture
    def data_apply(self, request, op):
        """Hard-coded ground truth (reference discipline:
        src/pyxu_tests/operator/examples/): forward difference of the plane
        x[i,j] = 2i + 3j — interior slopes (2, 3); the last row/col is the
        boundary: constant mode sees a 0 beyond the edge (diff = -x_edge),
        symmetric mode replicates the edge (diff = 0)."""
        mode = request.node.callspec.params["op"]
        x = 2.0 * np.arange(5)[:, None] + 3.0 * np.arange(6)[None, :]
        g0 = np.full((5, 6), 2.0)
        g1 = np.full((5, 6), 3.0)
        if mode == "constant":
            g0[-1, :] = -x[-1, :]
            g1[:, -1] = -x[:, -1]
        else:                       # symmetric: edge replicated
            g0[-1, :] = 0.0
            g1[:, -1] = 0.0
        return x, np.stack([g0, g1])

    def test_shape(self, op):
        assert op.codim_shape == (2, 5, 6)

    def test_values(self, op, fdtype):
        x = jnp.asarray(np.arange(30.0).reshape(5, 6), fdtype)
        g = np.asarray(op.apply(x))
        # forward difference: interior rows/cols
        assert np.allclose(g[0][:-1, :], 6.0)
        assert np.allclose(g[1][:, :-1], 1.0)


class TestJacobian(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return Jacobian((3, 5, 6))

    def test_shape(self, op):
        assert op.codim_shape == (3, 2, 5, 6)


class TestDivergence(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return Divergence((2, 5, 6))


class TestHessian(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return Hessian((5, 6))

    def test_shape(self, op):
        assert op.codim_shape == (3, 5, 6)


class TestLaplacian(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return Laplacian((6, 6))

    def test_harmonic(self, op, fdtype):
        # Laplacian of a linear function vanishes in the interior
        xx, yy = np.meshgrid(np.arange(6.0), np.arange(6.0), indexing="ij")
        f = jnp.asarray(2 * xx - 3 * yy, fdtype)
        got = np.asarray(op.apply(f))
        assert np.allclose(got[1:-1, 1:-1], 0.0, atol=1e-4)


class TestDirectionalDerivative(ConformanceSuite):
    @pytest.fixture(params=["constant", "varying"])
    def op(self, request, fdtype):
        if request.param == "constant":
            v = jnp.asarray([1.0, 2.0], fdtype)
        else:
            rng = np.random.default_rng(0)
            v = jnp.asarray(rng.standard_normal((2, 6, 5)), fdtype)
        return DirectionalDerivative((6, 5), v, diff_method="fd")


class TestDirectionalGradient(ConformanceSuite):
    @pytest.fixture
    def op(self, fdtype):
        dirs = [jnp.asarray([1.0, 0.0], fdtype), jnp.asarray([0.0, 1.0], fdtype)]
        return DirectionalGradient((5, 5), dirs, diff_method="fd")


class TestDirectionalLaplacian(ConformanceSuite):
    @pytest.fixture
    def op(self, fdtype):
        dirs = [jnp.asarray([1.0, 1.0], fdtype)]
        return DirectionalLaplacian((5, 5), dirs, diff_method="fd")
