"""to_sciop export, checkpoint read-back, utils (reference:
src/pyxu_tests/util/, abc/operator.py:1392-1438)."""

import jax.numpy as jnp
import numpy as np

from pyxu_tpu.abc.solver import Solver
from pyxu_tpu.operator.linop import ExplicitLinOp
from pyxu_tpu.opt.solver import PGD
from pyxu_tpu.opt.stop import MaxIter
from pyxu_tpu.operator.func import L1Norm, SquaredL2Norm
from pyxu_tpu.utils.misc import next_fast_len, peaks, star_like_sample

rng0 = np.random.default_rng(91)


def test_to_sciop():
    import scipy.sparse.linalg as spl
    A = rng0.standard_normal((7, 5))
    op = ExplicitLinOp(jnp.asarray(A))
    sci = op.to_sciop(dtype=np.float64)
    v = rng0.standard_normal(5)
    assert np.allclose(sci.matvec(v), A @ v, atol=1e-8)
    w = rng0.standard_normal(7)
    assert np.allclose(sci.rmatvec(w), A.T @ w, atol=1e-8)
    # usable by scipy's own machinery
    s = spl.svds(sci, k=1, return_singular_vectors=False)
    assert np.isclose(s[0], np.linalg.svd(A, compute_uv=False)[0], rtol=1e-4)


def test_checkpoint_roundtrip(tmp_path):
    y = jnp.asarray(rng0.standard_normal(6), jnp.float32)
    f = 0.5 * SquaredL2Norm((6,)).asloss(y)
    g = 0.1 * L1Norm((6,))
    slv = PGD(f=f, g=g, folder=tmp_path / "ck", writeback_rate=10)
    slv.fit(x0=jnp.zeros(6), stop_crit=MaxIter(30), max_iter=30)
    mstate, hist = Solver.read_checkpoint(tmp_path / "ck")
    assert "x" in mstate and mstate["x"].shape == (6,)
    # resume from checkpoint
    slv2 = PGD(f=f, g=g)
    slv2.fit(x0=jnp.asarray(mstate["x"]), stop_crit=MaxIter(30), max_iter=30)
    assert np.isfinite(np.asarray(slv2.solution())).all()


def test_next_fast_len():
    assert next_fast_len(17) >= 17
    n = next_fast_len(1000)
    while n % 2 == 0:
        n //= 2
    while n % 3 == 0:
        n //= 3
    while n % 5 == 0:
        n //= 5
    assert n == 1  # 5-smooth


def test_test_images():
    xx, yy = np.meshgrid(np.linspace(-3, 3, 32), np.linspace(-3, 3, 32))
    p = np.asarray(peaks(jnp.asarray(xx), jnp.asarray(yy)))
    assert p.shape == (32, 32) and np.isfinite(p).all()
    s = np.asarray(star_like_sample(32, 4, 0.7, 2, 0.6))
    assert s.shape == (32, 32)


def test_vectorize_decorator():
    """Reference pyxu.util.vectorize parity (util/operator.py:37-124)."""
    import numpy as np

    from pyxu_tpu.utils import vectorize

    @vectorize("x")
    def f(x):
        return x.sum(keepdims=True)

    x = np.arange(10.0).reshape((2, 5))
    np.testing.assert_allclose(np.asarray(f(x)).ravel(), [10.0, 35.0])
    np.testing.assert_allclose(np.asarray(f(x[0])).ravel(), [10.0])

    @vectorize("x", method="parallel", codim=1)
    def g(x, a=2.0):
        return (a * x).sum(keepdims=True)

    np.testing.assert_allclose(np.asarray(g(x, a=3.0)).ravel(),
                               [30.0, 105.0])

    import pytest as _pytest
    with _pytest.raises(ValueError):
        vectorize("y")(lambda x: x)
    with _pytest.raises(ValueError):
        vectorize("x", method="nope")
