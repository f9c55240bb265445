"""Stopping criteria + solver modes (reference:
src/pyxu_tests/opt/test_stop.py, opt/solver/conftest.py mode checks)."""

import time

import jax.numpy as jnp
import numpy as np

from pyxu_tpu import Mode, PGD
from pyxu_tpu.operator.func import L1Norm, SquaredL2Norm
from pyxu_tpu.opt.stop import (
    AbsError,
    ManualStop,
    MaxCarbon,
    MaxIter,
    Memorize,
    RelError,
)

rng0 = np.random.default_rng(131)


def _solver():
    y = jnp.asarray(rng0.standard_normal(10), jnp.float32)
    return PGD(f=0.5 * SquaredL2Norm((10,)).asloss(y), g=0.1 * L1Norm((10,)))


def test_memorize_records():
    slv = _solver()
    slv.fit(x0=jnp.zeros(10), stop_crit=Memorize("x") | MaxIter(25), max_iter=25)
    _, hist = slv.stats()
    assert "Memorize[x]" in hist.dtype.names
    assert len(hist) > 0


def test_abs_error_on_gradient():
    slv = _solver()
    crit = AbsError(eps=1e-5, var="x", rank=1,
                    f=lambda x: x - slv._g.prox(x - slv._f.grad(x), 1.0))
    slv.fit(x0=jnp.zeros(10), stop_crit=crit | MaxIter(5000), max_iter=5000)
    _, hist = slv.stats()
    assert hist["iteration"][-1] < 5000  # fixed-point residual converged


def test_combined_and():
    slv = _solver()
    crit = MaxIter(10) & MaxIter(20)  # both must fire -> stops at 20
    slv.fit(x0=jnp.zeros(10), stop_crit=crit, max_iter=100)
    _, hist = slv.stats()
    assert hist["iteration"][-1] == 20


def test_manual_stop_async():
    slv = _solver()
    slv.fit(x0=jnp.zeros(10), stop_crit=ManualStop(), max_iter=10**6,
            segment_size=200, mode=Mode.ASYNC)
    time.sleep(0.3)
    assert slv.busy()
    slv.stop()
    assert not slv.busy()
    assert np.isfinite(np.asarray(slv.solution())).all()


def test_max_carbon_budget():
    crit = MaxCarbon(budget_kg=1e-12)  # exhausted immediately
    crit.host_init()
    time.sleep(0.01)
    assert crit.host_check()
    assert "carbon_kg" in crit.host_metrics()


def test_vectorize_utils():
    from pyxu_tpu.utils.vectorize import batched_over, flatten_batch, unflatten_batch
    f = batched_over(lambda v: v[::-1], 1)
    x = jnp.asarray(rng0.standard_normal((3, 2, 5)))
    assert np.allclose(f(x), np.asarray(x)[..., ::-1])
    flat, b = flatten_batch(x, 1)
    assert flat.shape == (6, 5) and b == (3, 2)
    assert unflatten_batch(flat, b).shape == (3, 2, 5)
