"""Core Operator API: recasting, Moreau envelope, QuadraticFunc machinery,
spectral tools (reference: src/pyxu_tests/operator/examples + test_runtime)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyxu_tpu.abc.operator import (
    DiffFunc,
    LinOp,
    Map,
    Property,
    QuadraticFunc,
)
from pyxu_tpu.operator.func import L1Norm, SquaredL2Norm
from pyxu_tpu.operator.linop import DiagonalOp, ExplicitLinOp, IdentityOp

rng0 = np.random.default_rng(31)
_A = rng0.standard_normal((7, 5))


class _PlainMap(Map):
    """A linear map that doesn't declare linearity — for asop tests."""

    def __init__(self):
        super().__init__((5,), (7,))

    def apply(self, arr):
        return jnp.einsum("...j,ij->...i", jnp.asarray(arr), jnp.asarray(_A, arr.dtype))


def test_asop_downcast_derives_adjoint():
    m = _PlainMap()
    lin = m.asop(LinOp)
    assert lin.has(Property.LINEAR)
    y = jnp.asarray(rng0.standard_normal(7), jnp.float64)
    assert np.allclose(lin.adjoint(y), _A.T @ np.asarray(y), atol=1e-8)


def test_moreau_envelope():
    f = L1Norm((5,))
    mu = 0.3
    env = f.moreau_envelope(mu)
    x = jnp.asarray(rng0.standard_normal(5), jnp.float64)
    # envelope <= f, and grad = (x - prox)/mu
    assert float(env.apply(x)) <= float(f.apply(x)) + 1e-10
    g = env.grad(x)
    want = (x - f.prox(x, mu)) / mu
    assert np.allclose(g, want, atol=1e-8)
    # gradient also matches autodiff through the envelope formula
    g2 = jax.grad(lambda v: env.apply(v))(x)
    assert np.allclose(g, g2, atol=1e-6)


def test_quadratic_func_prox():
    Qm = _A.T @ _A + np.eye(5)
    Q = ExplicitLinOp(jnp.asarray(Qm))
    from pyxu_tpu.abc.arithmetic import cast_op
    from pyxu_tpu.abc.operator import PosDefOp
    Qp = cast_op(Q, PosDefOp)
    f = QuadraticFunc((5,), Q=Qp)
    x = jnp.asarray(rng0.standard_normal(5), jnp.float64)
    tau = 0.7
    p = f.prox(x, tau)
    want = np.linalg.solve(np.eye(5) + tau * Qm, np.asarray(x))
    assert np.allclose(p, want, atol=1e-5)


def test_quadratic_grad_apply():
    f = QuadraticFunc((4,), Q=DiagonalOp(jnp.asarray([1.0, 2.0, 3.0, 4.0])), t=1.5)
    x = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    assert np.isclose(float(f.apply(x)), 0.5 * 10 + 1.5)
    assert np.allclose(f.grad(x), [1.0, 2.0, 3.0, 4.0])


def test_pinv_least_squares():
    op = ExplicitLinOp(jnp.asarray(_A))
    y = jnp.asarray(rng0.standard_normal(7), jnp.float64)
    x = op.pinv(y, damp=0.0, rtol=1e-12)
    want = np.linalg.lstsq(_A, np.asarray(y), rcond=None)[0]
    assert np.allclose(x, want, atol=1e-6)


def test_dagger_op():
    op = ExplicitLinOp(jnp.asarray(_A))
    dag = op.dagger()
    y = jnp.asarray(rng0.standard_normal(7), jnp.float64)
    assert np.allclose(dag.apply(y), np.linalg.pinv(_A) @ np.asarray(y), atol=1e-5)


def test_svdvals():
    op = ExplicitLinOp(jnp.asarray(_A))
    got = np.sort(np.asarray(op.svdvals(k=3)))[::-1]
    want = np.linalg.svd(_A, compute_uv=False)[:3]
    assert np.allclose(got, want, rtol=1e-3)


def test_gram_cogram():
    op = ExplicitLinOp(jnp.asarray(_A))
    x = jnp.asarray(rng0.standard_normal(5), jnp.float64)
    assert np.allclose(op.gram().apply(x), _A.T @ (_A @ np.asarray(x)), atol=1e-8)
    y = jnp.asarray(rng0.standard_normal(7), jnp.float64)
    assert np.allclose(op.cogram().apply(y), _A @ (_A.T @ np.asarray(y)), atol=1e-8)


def test_trace_estimators():
    Qm = _A.T @ _A
    op = ExplicitLinOp(jnp.asarray(Qm))
    from pyxu_tpu.math import linalg
    exact = float(np.trace(Qm))
    assert np.isclose(linalg.trace(op), exact, rtol=1e-6)
    est = linalg.hutchpp(op, m=150, key=jax.random.PRNGKey(0))
    assert abs(float(est) - exact) <= 0.05 * abs(exact)


def test_squeeze():
    op = ExplicitLinOp(jnp.asarray(rng0.standard_normal((1, 5))))
    f = op.squeeze()
    assert f.codim_shape == ()
    assert f.has(Property.FUNCTIONAL)


def test_vmap_over_operator_batch():
    """Operators as pytrees vmap over stacked kernels."""
    vecs = jnp.asarray(rng0.standard_normal((3, 5)))
    ops = jax.vmap(lambda v: DiagonalOp(v))(vecs) if False else None
    # construction inside vmap is host logic; instead vmap over data leaves:
    op = DiagonalOp(jnp.ones(5))
    leaves, treedef = jax.tree_util.tree_flatten(op)

    def apply_with(vec, x):
        o = jax.tree_util.tree_unflatten(treedef, [vec])
        return o.apply(x)

    x = jnp.ones((5,))
    out = jax.vmap(apply_with, in_axes=(0, None))(vecs, x)
    assert np.allclose(out, np.asarray(vecs))
