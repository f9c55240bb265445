"""Samplers, online statistics, and interop bridges (reference:
src/pyxu_tests/experimental/sampler/, operator/interop/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyxu_tpu.abc.operator import DiffFunc, LinFunc, LinOp, Map, ProxFunc
from pyxu_tpu.operator.func import L1Norm, SquaredL2Norm
from pyxu_tpu.operator.interop import from_jax, from_sciop, from_source, from_torch
from pyxu_tpu.sampler import (
    MYULA,
    ULA,
    OnlineCenteredMoment,
    OnlineKurtosis,
    OnlineMoment,
    OnlineSkewness,
    OnlineVariance,
)

rng0 = np.random.default_rng(61)


# ------------------------------------------------------------------ sampler --

def test_ula_gaussian_target():
    """ULA on F(x)=||x||^2: the discrete chain x+ = (1-2g)x + sqrt(2g)w has
    exact stationary variance 1/(2(1-g)) — check against it."""
    f = SquaredL2Norm((4,))
    ula = ULA(f, gamma=0.05)
    samples = ula.run(jnp.zeros(4), n=6000, seed=1, burn_in=1000)
    s = np.asarray(samples)
    assert s.shape == (6000, 4)
    assert np.abs(s.mean()) < 0.1
    want = 1.0 / (2 * (1 - 0.05))
    assert np.allclose(s.var(axis=0), want, atol=0.12)


def test_ula_generator_protocol():
    f = SquaredL2Norm((3,))
    gen = ULA(f).samples(jnp.zeros(3), seed=0)
    xs = [next(gen) for _ in range(5)]
    assert all(x.shape == (3,) for x in xs)


def test_myula_runs():
    f = SquaredL2Norm((4,))
    g = L1Norm((4,))
    my = MYULA(f=f, g=g)
    s = np.asarray(my.run(jnp.zeros(4), n=500, seed=2))
    assert s.shape == (500, 4)
    assert np.isfinite(s).all()


def test_online_moments():
    rng = np.random.default_rng(3)
    xs = rng.standard_normal((2000, 5)) * 2.0 + 1.0
    m1 = OnlineMoment(1)
    var = OnlineVariance()
    for x in xs:
        m1.update(jnp.asarray(x))
        var.update(jnp.asarray(x))
    assert np.allclose(np.asarray(m1.stat()), xs.mean(axis=0), atol=1e-6)
    assert np.allclose(np.asarray(var.stat()), xs.var(axis=0), atol=1e-6)


def test_online_skew_kurtosis():
    rng = np.random.default_rng(5)
    xs = rng.standard_normal((5000, 3))
    sk = OnlineSkewness()
    ku = OnlineKurtosis()
    for x in xs:
        sk.update(jnp.asarray(x))
        ku.update(jnp.asarray(x))
    assert np.allclose(np.asarray(sk.stat()), 0.0, atol=0.15)
    assert np.allclose(np.asarray(ku.stat()), 3.0, atol=0.3)


def test_stat_algebra():
    xs = np.arange(10.0)
    m2 = OnlineMoment(2)
    m1 = OnlineMoment(1)
    comp = m2 - m1 ** 2  # variance via algebra
    for x in xs:
        v = comp.update(jnp.asarray(x))
    assert np.isclose(float(comp.stat()), xs.var(), atol=1e-6)


# ------------------------------------------------------------------ interop --

def test_from_source_linop():
    A = rng0.standard_normal((5, 3))
    op = from_source(
        LinOp, (3,), (5,),
        apply=lambda x: jnp.einsum("...j,ij->...i", x, jnp.asarray(A, x.dtype)),
    )
    x = jnp.asarray(rng0.standard_normal(3))
    assert np.allclose(op.apply(x), A @ np.asarray(x), atol=1e-6)
    # adjoint auto-derived via linear_transpose
    y = jnp.asarray(rng0.standard_normal(5))
    assert np.allclose(op.adjoint(y), A.T @ np.asarray(y), atol=1e-6)


def test_from_source_proxfunc():
    op = from_source(
        ProxFunc, (4,),
        apply=lambda x: jnp.sum(jnp.abs(x), axis=-1),
        prox=lambda x, t: jnp.sign(x) * jnp.maximum(jnp.abs(x) - t, 0),
    )
    x = jnp.asarray([3.0, -0.2, 1.0, 0.0])
    assert np.isclose(float(op.apply(x)), 4.2)
    assert np.allclose(op.prox(x, 1.0), [2.0, 0.0, 0.0, 0.0])


def test_from_source_vectorize():
    op = from_source(
        Map, (3,), (3,),
        apply=lambda x: x[::-1],  # unbatched single-sample fn
        vectorize="apply",
    )
    xb = jnp.asarray(rng0.standard_normal((2, 5, 3)))
    out = np.asarray(op.apply(xb))
    assert np.allclose(out, np.asarray(xb)[..., ::-1])


def test_from_source_composes():
    op = from_source(
        DiffFunc, (4,),
        apply=lambda x: jnp.sum(x ** 4, axis=-1),
    )
    x = jnp.asarray(rng0.standard_normal(4))
    g = op.grad(x)  # auto jax.grad
    assert np.allclose(g, 4 * np.asarray(x) ** 3, atol=1e-5)
    comp = 2.0 * op
    assert np.allclose(comp.grad(x), 8 * np.asarray(x) ** 3, atol=1e-5)


def test_from_jax():
    op = from_jax(DiffFunc, (3,), apply=lambda x: jnp.sum(jnp.sin(x), axis=-1),
                  jit=True)
    x = jnp.asarray([0.1, 0.2, 0.3])
    assert np.allclose(op.grad(x), np.cos(np.asarray(x)), atol=1e-6)


def test_from_sciop():
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl
    A = sp.random(6, 4, density=0.5, random_state=1, format="csr")
    op = from_sciop(spl.aslinearoperator(A))
    x = jnp.asarray(rng0.standard_normal(4), jnp.float64)
    assert np.allclose(op.apply(x), A @ np.asarray(x), atol=1e-8)
    y = jnp.asarray(rng0.standard_normal(6), jnp.float64)
    assert np.allclose(op.adjoint(y), A.T @ np.asarray(y), atol=1e-8)


def test_from_torch():
    torch = pytest.importorskip("torch")
    A = rng0.standard_normal((4, 3)).astype(np.float32)

    def t_apply(x):
        return torch.einsum("...j,ij->...i", x, torch.from_numpy(A))

    op = from_torch(LinOp, (3,), (4,), apply=t_apply)
    x = jnp.asarray(rng0.standard_normal(3), jnp.float32)
    assert np.allclose(op.apply(x), A @ np.asarray(x), atol=1e-5)
    y = jnp.asarray(rng0.standard_normal(4), jnp.float32)
    assert np.allclose(op.adjoint(y), A.T @ np.asarray(y), atol=1e-5)


def test_from_torch_vectorize_single_sample():
    """``vectorize=("apply",)`` lifts a single-sample torch callable over
    arbitrary leading batch axes (reference `_auto_vectorize`,
    torch.py:151-185)."""
    torch = pytest.importorskip("torch")

    def t_apply(x):            # STRICTLY single-sample: rank-1 in, rank-1 out
        assert x.dim() == 1
        return torch.flip(x, (0,)) * 2.0

    op = from_torch(LinOp, (3,), (3,), apply=t_apply, vectorize=("apply",))
    x = jnp.asarray(rng0.standard_normal((2, 5, 3)), jnp.float32)
    want = np.asarray(x)[..., ::-1] * 2.0
    assert np.allclose(op.apply(x), want, atol=1e-6)
    # single-sample call still works
    assert np.allclose(op.apply(x[0, 0]), want[0, 0], atol=1e-6)


def test_from_torch_composes_under_jit():
    """A torch-backed operator jits and composes with native operators
    (XLA stages the host callback)."""
    torch = pytest.importorskip("torch")
    from pyxu_tpu.operator import HomothetyOp

    def t_apply(x):
        return torch.tanh(x)

    op = HomothetyOp(dim_shape=(4,), cst=3.0) * \
        from_torch(Map, (4,), (4,), apply=t_apply)
    x = jnp.asarray(rng0.standard_normal(4), jnp.float32)
    got = jax.jit(op.apply)(x)
    assert np.allclose(got, 3.0 * np.tanh(np.asarray(x)), atol=1e-6)


def test_from_torch_difffunc():
    torch = pytest.importorskip("torch")

    def t_apply(x):
        return (x ** 2).sum(dim=-1)

    op = from_torch(DiffFunc, (3,), apply=t_apply)
    x = jnp.asarray([1.0, -2.0, 0.5], jnp.float32)
    assert np.isclose(float(op.apply(x)), 5.25)
    assert np.allclose(op.grad(x), 2 * np.asarray(x), atol=1e-5)


# -------------------------------------------------- review-fix regressions --

def test_online_stat_refuses_tracing():
    """Python-side counters would freeze at trace time -> must raise, not
    silently return wrong results (review finding)."""
    from pyxu_tpu.sampler.statistics import OnlineMoment
    m = OnlineMoment(1)
    with pytest.raises(RuntimeError, match="trac"):
        jax.jit(m.update)(jnp.asarray(2.0))


def test_online_stat_empty_state_raises():
    from pyxu_tpu.sampler.statistics import OnlineCenteredMoment, OnlineMoment
    with pytest.raises(RuntimeError, match="before any update"):
        OnlineMoment(1).stat()
    with pytest.raises(RuntimeError, match="before any update"):
        OnlineCenteredMoment(2).stat()


def test_myula_objective_includes_moreau_envelope():
    """Reference MYULA monitors F + G^lambda (reference _sampler.py:476-478),
    not just f."""
    f = SquaredL2Norm((4,))
    g = L1Norm((4,))
    my = MYULA(f=f, g=g, lamb=0.5)
    x = jnp.asarray([1.0, -2.0, 0.0, 3.0])
    got = float(my.objective_func(x))
    p = np.asarray(g.prox(x, 0.5))
    want = float(f.apply(x)) + np.abs(p).sum() + \
        ((np.asarray(x) - p) ** 2).sum() / (2 * 0.5)
    assert abs(got - want) < 1e-5 * max(abs(want), 1.0)
    # g-only MYULA must not be constant in x
    my2 = MYULA(g=g, lamb=0.5)
    assert float(my2.objective_func(x)) > float(my2.objective_func(0 * x))


def test_run_chain_is_cached():
    f = SquaredL2Norm((3,))
    ula = ULA(f, gamma=0.05)
    s1 = np.asarray(ula.run(jnp.zeros(3), n=20, seed=3, burn_in=10))
    assert (1, 10, 20) in ula._chain_cache
    s2 = np.asarray(ula.run(jnp.zeros(3), n=20, seed=3, burn_in=10))
    np.testing.assert_allclose(s1, s2)


def test_first_derivative_boundary_parity():
    """Boundary rows are zeroed like the reference
    (experimental/_dev/__init__.py:60-64)."""
    from pyxu_tpu.experimental._dev import FirstDerivative
    x = jnp.arange(5.0)
    fw = np.asarray(FirstDerivative(5, kind="forward").apply(x))
    np.testing.assert_allclose(fw, [1, 1, 1, 1, 0], atol=1e-6)
    bw = np.asarray(FirstDerivative(5, kind="backward").apply(x))
    np.testing.assert_allclose(bw, [0, 1, 1, 1, 1], atol=1e-6)
    ce = np.asarray(FirstDerivative(5, kind="centered").apply(x))
    np.testing.assert_allclose(ce, [0, 1, 1, 1, 0], atol=1e-6)


def test_experimental_sampler_import_path():
    import importlib
    mod = importlib.import_module("pyxu_tpu.experimental.sampler")
    assert hasattr(mod, "ULA")


def test_profiler_timed_blocks_on_out():
    from pyxu_tpu.utils.profiler import timed
    with timed() as out:
        out["x"] = jnp.ones(8) * 2.0
    assert out["seconds"] >= 0.0 and float(out["x"].sum()) == 16.0
