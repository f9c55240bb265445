"""Conformance runs for the elementary linops (reference:
src/pyxu_tests/operator/linop/base/test_*.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conformance import ConformanceSuite
from pyxu_tpu.abc.operator import PosDefOp, Property
from pyxu_tpu.operator.linop.base import (
    DiagonalOp,
    ExplicitLinFunc,
    ExplicitLinOp,
    HomothetyOp,
    IdentityOp,
    NullFunc,
    NullOp,
)


class TestIdentityOp(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return IdentityOp((3, 4))

    @pytest.fixture
    def data_apply(self):
        x = np.arange(12.0).reshape(3, 4)
        return x, x


class TestNullOp(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return NullOp((5,), (3, 2))

    @pytest.fixture
    def data_apply(self):
        return np.ones(5), np.zeros((3, 2))


class TestNullFunc(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return NullFunc((4,))

    @pytest.fixture
    def data_apply(self):
        return np.ones(4), np.zeros(())


class TestHomothetyOp(ConformanceSuite):
    @pytest.fixture(params=[-2.5, 3.0])
    def op(self, request):
        return HomothetyOp((6,), request.param)


def test_homothety_posdef_dispatch():
    assert isinstance(HomothetyOp((3,), 2.0), PosDefOp)
    assert not isinstance(HomothetyOp((3,), -2.0), PosDefOp)


class TestDiagonalOp(ConformanceSuite):
    @pytest.fixture(params=["mixed", "positive"])
    def op(self, request, fdtype):
        rng = np.random.default_rng(3)
        v = rng.standard_normal((4, 3))
        if request.param == "positive":
            v = np.abs(v) + 0.1
        return DiagonalOp(jnp.asarray(v, fdtype))


def test_diagonal_posdef_dispatch():
    assert isinstance(DiagonalOp(np.ones(3)), PosDefOp)
    assert not isinstance(DiagonalOp(np.array([1.0, -1.0])), PosDefOp)


class TestExplicitLinOp(ConformanceSuite):
    @pytest.fixture(params=[1, 2])
    def op(self, request, fdtype):
        rng = np.random.default_rng(5)
        if request.param == 1:
            A = rng.standard_normal((7, 5))
        else:
            A = rng.standard_normal((2, 3, 4, 5))  # codim (2,3), dim (4,5)
        op = ExplicitLinOp(jnp.asarray(A, fdtype), dim_rank=request.param)
        op.estimate_lipschitz()
        return op


class TestSparseExplicitLinOp(ConformanceSuite):
    """Conformance over a BCOO-backed sparse operator (VERDICT r4 item 7;
    reference sparse `_ExplicitLinOp` branch, base.py:334-512)."""

    @pytest.fixture(params=["scipy", "bcoo"])
    def op(self, request, fdtype):
        import scipy.sparse as sp

        from pyxu_tpu.operator.linop.base import SparseExplicitLinOp
        rng = np.random.default_rng(11)
        A = sp.random(7, 5, density=0.4, random_state=rng,
                      data_rvs=rng.standard_normal).tocsr()
        if request.param == "scipy":
            op = SparseExplicitLinOp(A.astype(np.float64))
        else:
            from jax.experimental import sparse as jsp
            dense = jnp.asarray(A.toarray(), fdtype)
            op = SparseExplicitLinOp(jsp.BCOO.fromdense(dense))
        op.estimate_lipschitz()
        return op


def test_sparse_explicit_matches_dense_and_dispatch():
    import scipy.sparse as sp

    from pyxu_tpu.abc.operator import LinOp
    from pyxu_tpu.operator.linop.base import SparseExplicitLinOp
    rng = np.random.default_rng(3)
    A = sp.random(6, 6, density=0.5, random_state=rng,
                  data_rvs=rng.standard_normal).tocsc()
    op = LinOp.from_array(A)
    assert isinstance(op, SparseExplicitLinOp)
    dense = ExplicitLinOp(jnp.asarray(A.toarray()))
    x = jnp.asarray(rng.standard_normal(6), jnp.float32)
    y = jnp.asarray(rng.standard_normal(6), jnp.float32)
    assert np.allclose(op.apply(x), dense.apply(x), atol=1e-5)
    assert np.allclose(op.adjoint(y), dense.adjoint(y), atol=1e-5)
    assert np.allclose(op.asarray(), A.toarray(), atol=1e-6)
    assert np.isclose(op.trace(), np.trace(A.toarray()), atol=1e-5)
    # dense class refuses sparse input with a clear error
    with pytest.raises(TypeError, match="dense-only"):
        ExplicitLinOp(A)
    # complex sparse is refused (real (...,2)-view convention)
    with pytest.raises(TypeError, match="complex"):
        SparseExplicitLinOp(A.astype(np.complex64))


class TestExplicitLinFunc(ConformanceSuite):
    @pytest.fixture
    def op(self, fdtype):
        rng = np.random.default_rng(7)
        op = ExplicitLinFunc(jnp.asarray(rng.standard_normal((6,)), fdtype))
        op.estimate_lipschitz()
        return op

    def test_grad_is_vec(self, op, rng, fdtype):
        x = jnp.asarray(rng.standard_normal((6,)), fdtype)
        assert np.allclose(op.grad(x), op.asarray())


def test_identity_closed_forms():
    op = IdentityOp((4,))
    assert op.trace() == 4.0
    assert np.allclose(op.pinv(jnp.ones(4)), jnp.ones(4))
    assert op.has(Property.LINEAR_UNITARY) is False  # OrthProj, not Unit


def test_homothety_closed_forms():
    op = HomothetyOp((4,), -3.0)
    assert op.trace() == -12.0
    assert np.allclose(np.asarray(op.svdvals(2)), [3.0, 3.0])
    assert np.allclose(op.pinv(jnp.ones(4)), -jnp.ones(4) / 3.0)
