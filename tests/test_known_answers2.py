"""Second batch of paper-verifiable fixtures (round 5): differential
operators on polynomials (central differences are EXACT on quadratics, so
interior values are closed-form integers) and block compositions on
literal 2x2 matrices.

Reference discipline: src/pyxu_tests/operator/examples/ — a sign or
scheme-flip bug that is self-consistent across apply/adjoint still gets
caught by a literal value."""

import jax
import jax.numpy as jnp
import numpy as np

from pyxu_tpu.operator.linop import (
    Divergence,
    ExplicitLinOp,
    Gradient,
    Hessian,
    Laplacian,
)
from pyxu_tpu.operator.blocks import block_diag, coo_block, hstack, vstack

_N = 8
_II, _JJ = np.meshgrid(np.arange(_N, dtype=np.float64),
                       np.arange(_N, dtype=np.float64), indexing="ij")
_IN = (slice(2, -2), slice(2, -2))   # interior: away from boundary schemes


def test_laplacian_of_quadratic_is_constant():
    """Δ(i² + j²) = 4 exactly on interior points (central differences are
    exact for quadratics)."""
    L = Laplacian((_N, _N), mode="symmetric")
    out = np.asarray(L.apply(jnp.asarray(_II**2 + _JJ**2, jnp.float32)))
    assert np.allclose(out[_IN], 4.0, atol=1e-5), out[_IN]


def test_gradient_of_linear_is_constant():
    """∇(3i + 5j) = (3, 5) exactly on interior points."""
    G = Gradient((_N, _N), mode="symmetric")
    out = np.asarray(G.apply(jnp.asarray(3 * _II + 5 * _JJ, jnp.float32)))
    assert np.allclose(out[0][_IN], 3.0, atol=1e-5)
    assert np.allclose(out[1][_IN], 5.0, atol=1e-5)


def test_divergence_of_linear_field():
    """div(2i, 7j) = 2 + 7 = 9 exactly on interior points."""
    D = Divergence((2, _N, _N), mode="symmetric")
    v = np.stack([2.0 * _II, 7.0 * _JJ]).astype(np.float32)
    out = np.asarray(D.apply(jnp.asarray(v)))
    assert np.allclose(out[_IN], 9.0, atol=1e-5), out[_IN]


def test_hessian_of_bilinear():
    """H(2 i j) = [[0, 2], [2, 0]] — components (dxx, dxy, dyy) = (0, 2, 0)
    exactly on interior points."""
    H = Hessian((_N, _N), mode="symmetric")
    out = np.asarray(H.apply(jnp.asarray(2.0 * _II * _JJ, jnp.float32)))
    assert out.shape[0] == 3
    assert np.allclose(out[0][_IN], 0.0, atol=1e-5)   # dxx
    assert np.allclose(out[1][_IN], 2.0, atol=1e-5)   # dxy
    assert np.allclose(out[2][_IN], 0.0, atol=1e-5)   # dyy


def test_laplacian_is_div_of_grad():
    """div(grad f) == Laplacian f on interior points (the scheme-flip
    contract the Divergence constructor documents)."""
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.random((_N, _N)), jnp.float32)
    G = Gradient((_N, _N), mode="symmetric")
    D = Divergence((2, _N, _N), mode="symmetric")
    L = Laplacian((_N, _N), mode="symmetric")
    a = np.asarray(D.apply(G.apply(f)))
    b = np.asarray(L.apply(f))
    assert np.allclose(a[_IN], b[_IN], atol=1e-5)


# --------------------------------------------------------------- blocks ----

_A = ExplicitLinOp(jnp.asarray([[1.0, 2.0], [3.0, 4.0]], jnp.float32))
_B = ExplicitLinOp(jnp.asarray([[0.0, 1.0], [1.0, 0.0]], jnp.float32))


def test_vstack_known_answer():
    """[A; B] @ (1, 2) = (5, 11, 2, 1)."""
    op = vstack([_A, _B])
    got = np.asarray(op.apply(jnp.asarray([1.0, 2.0])).ravel())
    assert np.allclose(got, [5.0, 11.0, 2.0, 1.0]), got


def test_hstack_known_answer():
    """[A, B] @ (1, 2, 3, 4) = A@(1,2) + B@(3,4) = (5+4, 11+3) = (9, 14)."""
    op = hstack([_A, _B])
    x = jnp.asarray([1.0, 2.0, 3.0, 4.0]).reshape(op.dim_shape)
    got = np.asarray(op.apply(x)).ravel()
    assert np.allclose(got, [9.0, 14.0]), got


def test_block_diag_known_answer():
    """diag(A, B) @ (1, 2, 3, 4) = (5, 11, 4, 3)."""
    op = block_diag([_A, _B])
    x = jnp.asarray([1.0, 2.0, 3.0, 4.0]).reshape(op.dim_shape)
    got = np.asarray(op.apply(x)).ravel()
    assert np.allclose(got, [5.0, 11.0, 4.0, 3.0]), got


def test_coo_block_known_answer():
    """[[A, 0], [0, B]] assembled by coordinate == block_diag."""
    op = coo_block({(0, 0): _A, (1, 1): _B}, (2, 2))
    ref = block_diag([_A, _B])
    x = jnp.asarray(np.arange(1.0, 5.0, dtype=np.float32)).reshape(
        op.dim_shape)
    assert np.allclose(np.asarray(op.apply(x)).ravel(),
                       np.asarray(ref.apply(
                           x.reshape(ref.dim_shape))).ravel())
