"""Stencil / Correlate / Convolve conformance (reference:
src/pyxu_tests/operator/linop/test_stencil.py)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.ndimage as snd

from conformance import ConformanceSuite
from pyxu_tpu.operator.linop import Convolve, Stencil

MODES = ["constant", "wrap", "reflect", "symmetric", "edge"]
# scipy.ndimage naming of the same boundary rules:
_SCIPY_MODE = {
    "constant": "constant",
    "wrap": "grid-wrap",
    "reflect": "mirror",     # reflect w/o edge repeat
    "symmetric": "reflect",  # reflect w/ edge repeat
    "edge": "nearest",
}


class TestStencil1D(ConformanceSuite):
    @pytest.fixture(params=MODES)
    def op(self, request, fdtype):
        k = jnp.asarray([1.0, -2.0, 3.0, 0.5], fdtype)
        return Stencil((9,), k, center=1, mode=request.param)

    def test_matches_scipy_correlate(self, op, rng, fdtype):
        x = rng.standard_normal(9).astype(fdtype)
        k = np.asarray(op.kernel)
        # scipy's origin: 0 = centered at len//2; shift to our center
        origin = op.center[0] - len(k) // 2
        want = snd.correlate1d(x.astype(np.float64), k.astype(np.float64),
                               mode=_SCIPY_MODE[op._mode], origin=origin, cval=0.0)
        assert np.allclose(op.apply(jnp.asarray(x)), want, atol=1e-4)


class TestStencil2D(ConformanceSuite):
    @pytest.fixture(params=["constant", "symmetric"])
    def op(self, request, fdtype):
        k = jnp.asarray([[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]], fdtype)
        return Stencil((6, 7), k, center=(1, 1), mode=request.param)

    @pytest.fixture
    def data_apply(self, request):
        """Hard-coded ground truth (reference discipline:
        src/pyxu_tests/operator/examples/): the 5-point Laplacian stencil on
        a constant field is 0 in the interior; each missing neighbor at the
        boundary contributes -1 under constant (zero) padding and 0 under
        symmetric padding."""
        x = np.ones((6, 7))
        if request.node.callspec.params["op"] == "symmetric":
            return x, np.zeros((6, 7))
        want = np.zeros((6, 7))
        want[0, :] -= 1.0   # missing top neighbor
        want[-1, :] -= 1.0
        want[:, 0] -= 1.0
        want[:, -1] -= 1.0
        return x, want

    def test_matches_scipy_correlate(self, op, rng, fdtype):
        x = rng.standard_normal((6, 7)).astype(np.float64)
        k = np.asarray(op.kernel, np.float64)
        want = snd.correlate(x, k, mode=_SCIPY_MODE[op._mode], cval=0.0)
        got = op.apply(jnp.asarray(x.astype(fdtype)))
        assert np.allclose(got, want, atol=1e-4)


class TestStencilSeparable(ConformanceSuite):
    @pytest.fixture
    def op(self, fdtype):
        kx = jnp.asarray([1.0, 2.0, 1.0], fdtype)
        ky = jnp.asarray([1.0, 0.0, -1.0], fdtype)
        return Stencil((6, 5), [kx, ky], center=[1, 1], mode="constant")

    def test_equals_outer_kernel(self, op, rng, fdtype):
        kx = np.array([1.0, 2.0, 1.0])
        ky = np.array([1.0, 0.0, -1.0])
        full = Stencil((6, 5), jnp.asarray(np.outer(kx, ky), fdtype),
                       center=(1, 1), mode="constant")
        x = jnp.asarray(rng.standard_normal((6, 5)), fdtype)
        assert np.allclose(op.apply(x), full.apply(x), atol=1e-4)


class TestConvolve(ConformanceSuite):
    @pytest.fixture
    def op(self, fdtype):
        k = jnp.asarray([1.0, -1.0, 2.0], fdtype)
        return Convolve((8,), k, center=1, mode="constant")

    def test_matches_numpy_convolve(self, op, rng, fdtype):
        x = rng.standard_normal(8).astype(np.float64)
        k = np.array([1.0, -1.0, 2.0])
        want = np.convolve(x, k, mode="full")[1:9]
        got = op.apply(jnp.asarray(x.astype(fdtype)))
        assert np.allclose(got, want, atol=1e-4)


def test_trace_constant_mode():
    k = jnp.asarray([[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]])
    op = Stencil((6, 7), k, center=(1, 1), mode="constant")
    assert np.isclose(op.trace(), -4.0 * 42)


def test_lipschitz_youngs_bound(rng):
    k = jnp.asarray([1.0, -2.0, 3.0])
    op = Stencil((16,), k, center=1, mode="constant")
    assert op.lipschitz <= 6.0 + 1e-6
    est = op.estimate_lipschitz(method="power", maxiter=128)
    assert est <= op.lipschitz * (1 + 1e-3)
