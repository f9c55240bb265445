"""Blocks / Kronecker / FFT conformance (reference:
src/pyxu_tests/operator/{blocks,linop/kron,linop/fft}/)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conformance import ConformanceSuite
from pyxu_tpu.operator import block, block_diag, coo_block, hstack, stack, vstack
from pyxu_tpu.operator.func import L1Norm, SquaredL2Norm
from pyxu_tpu.operator.linop import (
    FFT,
    DiagonalOp,
    ExplicitLinOp,
    IdentityOp,
    khatri_rao,
    kron,
)
from pyxu_tpu.utils.complex import view_as_complex, view_as_real

rng0 = np.random.default_rng(53)
_A = rng0.standard_normal((4, 6))
_B = rng0.standard_normal((3, 6))
_C = rng0.standard_normal((4, 5))


def _exp(M, fdtype=np.float64):
    op = ExplicitLinOp(jnp.asarray(M, fdtype))
    op.estimate_lipschitz()
    return op


class TestStack(ConformanceSuite):
    @pytest.fixture
    def op(self, fdtype):
        return stack([_exp(_A, fdtype), _exp(_A * 2, fdtype)])

    def test_shape_and_value(self, rng, fdtype):
        op = stack([_exp(_A, fdtype), _exp(_A * 2, fdtype)])
        assert op.codim_shape == (2, 4)
        x = jnp.asarray(rng.standard_normal(6), fdtype)
        y = np.asarray(op.apply(x))
        assert np.allclose(y[0], _A @ np.asarray(x, np.float64), atol=1e-4)
        assert np.allclose(y[1], 2 * _A @ np.asarray(x, np.float64), atol=1e-4)


class TestVStack(ConformanceSuite):
    @pytest.fixture
    def op(self, fdtype):
        return vstack([_exp(_A, fdtype), _exp(_B, fdtype)])

    def test_value(self, rng, fdtype):
        op = vstack([_exp(_A, fdtype), _exp(_B, fdtype)])
        assert op.codim_shape == (7,)
        x = jnp.asarray(rng.standard_normal(6), fdtype)
        want = np.concatenate([_A @ np.asarray(x, np.float64),
                               _B @ np.asarray(x, np.float64)])
        assert np.allclose(op.apply(x), want, atol=1e-4)


class TestHStack(ConformanceSuite):
    @pytest.fixture
    def op(self, fdtype):
        return hstack([_exp(_A, fdtype), _exp(_C, fdtype)])

    def test_value(self, rng, fdtype):
        op = hstack([_exp(_A, fdtype), _exp(_C, fdtype)])
        assert op.dim_shape == (11,)
        x = rng.standard_normal(11)
        want = _A @ x[:6] + _C @ x[6:]
        assert np.allclose(op.apply(jnp.asarray(x, fdtype)), want, atol=1e-4)


class TestBlockDiagHomogeneous(ConformanceSuite):
    @pytest.fixture
    def op(self, fdtype):
        ops = [_exp(rng0.standard_normal((4, 6)), fdtype) for _ in range(3)]
        return block_diag(ops)

    def test_vmap_path_active(self, op):
        assert op._vmap  # same class/shape -> batched fast path


class TestBlockDiagHeterogeneous(ConformanceSuite):
    @pytest.fixture
    def op(self, fdtype):
        return block_diag([_exp(np.eye(5) * 2, fdtype), IdentityOp((5,))])


def test_separable_sum_prox():
    f = block_diag([L1Norm((4,)), SquaredL2Norm((4,))])
    x = jnp.asarray(rng0.standard_normal((2, 4)))
    val = float(f.apply(x))
    want = np.abs(np.asarray(x)[0]).sum() + (np.asarray(x)[1] ** 2).sum()
    assert np.isclose(val, want, atol=1e-6)
    p = np.asarray(f.prox(x, 0.5))
    st = np.sign(np.asarray(x)[0]) * np.maximum(np.abs(np.asarray(x)[0]) - 0.5, 0)
    assert np.allclose(p[0], st, atol=1e-6)
    assert np.allclose(p[1], np.asarray(x)[1] / 2.0, atol=1e-6)


class TestCOOBlock(ConformanceSuite):
    @pytest.fixture
    def op(self, fdtype):
        return coo_block({
            (0, 0): _exp(_A, fdtype),                      # 6 -> 4
            (1, 0): _exp(_B, fdtype),                      # 6 -> 3
            (1, 1): _exp(rng0.standard_normal((3, 2)), fdtype),
        }, (2, 2))

    def test_dense_vs_blocks(self, rng, fdtype):
        op = coo_block({
            (0, 0): _exp(_A, fdtype),
            (1, 0): _exp(_B, fdtype),
            (1, 1): _exp(np.ones((3, 2)), fdtype),
        }, (2, 2))
        M = np.zeros((7, 8))
        M[:4, :6] = _A
        M[4:, :6] = _B
        M[4:, 6:] = 1.0
        x = rng.standard_normal(8)
        assert np.allclose(op.apply(jnp.asarray(x, fdtype)), M @ x, atol=1e-4)


class TestBlockGrid(ConformanceSuite):
    @pytest.fixture
    def op(self, fdtype):
        return block([
            [_exp(_A, fdtype), None],
            [_exp(_B, fdtype), _exp(np.ones((3, 2)), fdtype)],
        ])


class TestKron(ConformanceSuite):
    @pytest.fixture
    def op(self, fdtype):
        return kron(_exp(rng0.standard_normal((3, 4)), fdtype),
                    _exp(rng0.standard_normal((2, 5)), fdtype))

    def test_vs_dense_kron(self, rng, fdtype):
        Ka = rng0.standard_normal((3, 4))
        Kb = rng0.standard_normal((2, 5))
        op = kron(_exp(Ka, fdtype), _exp(Kb, fdtype))
        x = rng.standard_normal(20)
        want = np.kron(Ka, Kb) @ x
        assert np.allclose(op.apply(jnp.asarray(x, fdtype)), want, atol=1e-3)

    def test_trace(self, fdtype):
        Ka = rng0.standard_normal((4, 4))
        Kb = rng0.standard_normal((5, 5))
        op = kron(_exp(Ka, fdtype), _exp(Kb, fdtype))
        assert np.isclose(op.trace(), np.trace(Ka) * np.trace(Kb), rtol=1e-4)


class TestKhatriRao(ConformanceSuite):
    @pytest.fixture
    def op(self, fdtype):
        return khatri_rao(_exp(rng0.standard_normal((3, 6)), fdtype),
                          _exp(rng0.standard_normal((4, 6)), fdtype))

    def test_vs_dense(self, rng, fdtype):
        Ka = rng0.standard_normal((3, 6))
        Kb = rng0.standard_normal((4, 6))
        op = khatri_rao(_exp(Ka, fdtype), _exp(Kb, fdtype))
        dense = np.stack([np.kron(Ka[:, j], Kb[:, j]) for j in range(6)], axis=1)
        x = rng.standard_normal(6)
        assert np.allclose(op.apply(jnp.asarray(x, fdtype)), dense @ x, atol=1e-3)


class TestFFTComplex(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return FFT((8, 4))

    @pytest.fixture
    def data_apply(self):
        """Hard-coded ground truth (reference discipline:
        src/pyxu_tests/operator/examples/): DFT of a delta at (1, 0) is the
        pure phase ramp e^{-2 pi i k1 / 8}, constant along axis 1."""
        z = np.zeros((8, 4), complex)
        z[1, 0] = 1.0
        want = np.exp(-2j * np.pi * np.arange(8) / 8)[:, None] * np.ones((1, 4))
        return np.asarray(view_as_real(jnp.asarray(z))), \
            np.asarray(view_as_real(jnp.asarray(want)))

    def test_matches_numpy_fft(self, rng, fdtype):
        op = FFT((8, 4))
        z = rng.standard_normal((8, 4)) + 1j * rng.standard_normal((8, 4))
        got = view_as_complex(op.apply(view_as_real(jnp.asarray(z))))
        want = np.fft.fftn(z)
        assert np.allclose(got, want, atol=1e-5)

    def test_adjoint_unnormalized_inverse(self, rng, fdtype):
        op = FFT((8, 4))
        z = jnp.asarray(rng.standard_normal((8, 4, 2)))
        back = op.adjoint(op.apply(z))
        assert np.allclose(back, 32 * z, atol=1e-4)


class TestFFTReal(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return FFT((6,), real=True)

    @pytest.fixture
    def data_apply(self):
        """DFT of a real delta at index 1: e^{-2 pi i k / 6}."""
        x = np.zeros(6)
        x[1] = 1.0
        want = np.exp(-2j * np.pi * np.arange(6) / 6)
        return x, np.asarray(view_as_real(jnp.asarray(want)))

    def test_cosine(self):
        N = 10
        op = FFT((N,), real=True)
        x = np.cos(2 * np.pi / N * np.arange(N))
        y = np.asarray(view_as_complex(op.apply(jnp.asarray(x))))
        want = np.zeros(N, complex)
        want[1] = want[-1] = N / 2
        assert np.allclose(y, want, atol=1e-5)


class TestFFTAxesSubset(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return FFT((4, 6), axes=(1,))
