"""Solver engine tests (reference: src/pyxu_tests/opt/solver/conftest.py:92-499
checks solution correctness vs ground truth + mode equivalence)."""

import datetime as dt

import jax.numpy as jnp
import numpy as np
import pytest

from pyxu_tpu import CG, PGD, Mode
from pyxu_tpu.math.cg import cg_solve
from pyxu_tpu.operator.func import L1Norm, SquaredL2Norm
from pyxu_tpu.operator.linop import ExplicitLinOp
from pyxu_tpu.opt.stop import AbsError, MaxDuration, MaxIter, RelError

rng0 = np.random.default_rng(23)
_A = rng0.standard_normal((12, 8))
_y = rng0.standard_normal(12)
_LAM = 0.5


def _lasso_ops():
    A = ExplicitLinOp(jnp.asarray(_A))
    f = SquaredL2Norm((12,)).asloss(jnp.asarray(_y)) * A  # ||Ax - y||^2
    g = _LAM * L1Norm((8,))
    return f, g


def _lasso_obj(x):
    return float(np.sum((_A @ x - _y) ** 2) + _LAM * np.abs(x).sum())


def _ref_lasso(n_iter=20000):
    """High-accuracy ISTA reference solution (float64 numpy)."""
    L = 2 * np.linalg.norm(_A, 2) ** 2
    tau = 1.0 / L
    x = np.zeros(8)
    for _ in range(n_iter):
        grad = 2 * _A.T @ (_A @ x - _y)
        z = x - tau * grad
        x = np.sign(z) * np.maximum(np.abs(z) - tau * _LAM, 0)
    return x


REF_X = _ref_lasso()


class TestPGD:
    def test_lasso_block(self):
        f, g = _lasso_ops()
        slv = PGD(f=f, g=g)
        slv.fit(x0=jnp.zeros(8), stop_crit=RelError(eps=1e-8) | MaxIter(20000))
        x = np.asarray(slv.solution())
        assert abs(_lasso_obj(x) - _lasso_obj(REF_X)) <= 1e-5 * max(1, _lasso_obj(REF_X))

    def test_mode_equivalence(self):
        f, g = _lasso_ops()
        crit = MaxIter(50)
        s1 = PGD(f=f, g=g)
        s1.fit(x0=jnp.zeros(8), stop_crit=crit, max_iter=50)
        s2 = PGD(f=f, g=g)
        gen = s2.fit(x0=jnp.zeros(8), stop_crit=MaxIter(50), max_iter=50, mode=Mode.MANUAL)
        for _ in gen:
            pass
        assert np.allclose(s1.solution(), s2.solution(), atol=1e-6)

    def test_async_mode(self):
        f, g = _lasso_ops()
        slv = PGD(f=f, g=g)
        slv.fit(x0=jnp.zeros(8), stop_crit=MaxIter(200), max_iter=200, mode=Mode.ASYNC)
        import time
        while slv.busy():
            time.sleep(0.01)
        assert slv.solution() is not None

    def test_history_tracked(self):
        f, g = _lasso_ops()
        slv = PGD(f=f, g=g)
        slv.fit(x0=jnp.zeros(8), stop_crit=MaxIter(30), max_iter=30, track_objective=True)
        _, hist = slv.stats()
        assert hist is not None and "objective" in hist.dtype.names
        assert hist["objective"][-1] <= hist["objective"][0]

    def test_batched_start_points(self):
        f, g = _lasso_ops()
        slv = PGD(f=f, g=g)
        x0 = jnp.zeros((3, 8)).at[1].set(1.0)
        slv.fit(x0=x0, stop_crit=MaxIter(2000), max_iter=2000)
        x = np.asarray(slv.solution())
        assert x.shape == (3, 8)
        for i in range(3):
            assert abs(_lasso_obj(x[i]) - _lasso_obj(REF_X)) <= 1e-3


class TestCG:
    def test_solves_posdef(self):
        Q = _A.T @ _A + 0.5 * np.eye(8)
        op = ExplicitLinOp(jnp.asarray(Q))
        b = rng0.standard_normal(8)
        slv = CG(op)
        slv.fit(b=jnp.asarray(b), stop_crit=AbsError(eps=1e-10, var="r", rank=1) | MaxIter(200))
        assert np.allclose(slv.solution(), np.linalg.solve(Q, b), atol=1e-5)

    def test_batched_rhs(self):
        Q = _A.T @ _A + 0.5 * np.eye(8)
        op = ExplicitLinOp(jnp.asarray(Q))
        B = rng0.standard_normal((4, 8))
        slv = CG(op)
        slv.fit(b=jnp.asarray(B), stop_crit=AbsError(eps=1e-10, var="r", rank=1) | MaxIter(200))
        assert np.allclose(slv.solution(), np.linalg.solve(Q, B.T).T, atol=1e-5)


def test_cg_solve_function():
    Q = _A.T @ _A + np.eye(8)
    b = rng0.standard_normal(8)
    x = cg_solve(lambda v: jnp.asarray(Q) @ v, jnp.asarray(b), rtol=1e-12, maxiter=100)
    assert np.allclose(x, np.linalg.solve(Q, b), atol=1e-6)


def test_cg_solve_preconditioned():
    """PCG: an exact-inverse preconditioner converges in O(1) iterations
    where plain CG needs many; identity preconditioner reproduces plain CG
    exactly (stop test stays on the true residual)."""
    Q = (_A.T @ _A + 20.0 * np.eye(8)).astype(np.float32)
    b = rng0.standard_normal(8).astype(np.float32)
    Qinv = np.linalg.inv(Q)
    xref = np.linalg.solve(Q, b)
    mv = lambda v: jnp.asarray(Q) @ v
    x_pcg = cg_solve(mv, jnp.asarray(b), maxiter=2, rtol=0.0,
                     precond=lambda r: jnp.asarray(Qinv) @ r)
    assert np.allclose(x_pcg, xref, atol=1e-4)
    x_cg2 = cg_solve(mv, jnp.asarray(b), maxiter=2, rtol=0.0)
    assert not np.allclose(x_cg2, xref, atol=1e-4)  # plain CG is not done yet
    x_id = cg_solve(mv, jnp.asarray(b), maxiter=6, rtol=0.0,
                    precond=lambda r: r)
    x_pl = cg_solve(mv, jnp.asarray(b), maxiter=6, rtol=0.0)
    assert np.allclose(x_id, x_pl, atol=1e-6)


def test_quadratic_prox_precond_hook():
    """QuadraticFunc.prox honors an opt-in ``_prox_precond(r, tau)`` hook
    and reaches the same minimizer (prox of a strongly convex quadratic)."""
    from pyxu_tpu.abc.operator import PosDefOp, QuadraticFunc
    from pyxu_tpu.operator.linop import ExplicitLinFunc
    Q = (_A.T @ _A + 5.0 * np.eye(8)).astype(np.float32)
    Qop = ExplicitLinOp(jnp.asarray(Q)).asop(PosDefOp)
    c = ExplicitLinFunc(jnp.asarray(rng0.standard_normal(8).astype(np.float32)))
    f = QuadraticFunc((8,), Q=Qop, c=c)
    x = jnp.asarray(rng0.standard_normal(8).astype(np.float32))
    p_ref = f.prox(x, 0.7)
    Minv = np.linalg.inv(np.eye(8) + 0.7 * Q).astype(np.float32)
    f._prox_precond = lambda r, tau: jnp.asarray(Minv) @ r
    f._prox_maxiter = 2
    p_pcg = f.prox(x, 0.7)
    assert np.allclose(p_pcg, p_ref, atol=1e-4)


def test_nufft_gram_circulant_precond_optin():
    """The NUFFT Toeplitz gram exposes an opt-in circulant approximate
    inverse: solve(r, 0) == r, and (I + a*C) o solve ~ identity on the
    circulant's own range (consistency of the spectrum it advertises)."""
    from pyxu_tpu.operator.linop.nufft import NUFFT
    from pyxu_tpu.utils.complex import view_as_complex, view_as_real
    rng = np.random.default_rng(5)
    pts = rng.uniform(-np.pi, np.pi, (300, 2)).astype(np.float32)
    G = NUFFT.type2(pts, (8, 8), eps=1e-6).gram()
    solve = G._circulant_precond()
    assert solve is not None
    r = jnp.asarray(rng.standard_normal((8, 8, 2)).astype(np.float32))
    assert np.allclose(solve(r, 0.0), r, atol=1e-5)
    lam = G._chan_lam()
    z = solve(r, 0.3)
    zc = view_as_complex(z)
    back = view_as_real(jnp.fft.ifftn(
        jnp.fft.fftn(zc, axes=(-2, -1)) * (1.0 + 0.3 * lam), axes=(-2, -1)))
    assert np.allclose(back, r, atol=1e-4)


def test_max_duration_stops():
    f, g = _lasso_ops()
    slv = PGD(f=f, g=g)
    slv.fit(x0=jnp.zeros(8), stop_crit=MaxDuration(dt.timedelta(seconds=0.5)) | MaxIter(10**6),
            max_iter=10**6, segment_size=500)
    _, hist = slv.stats()
    assert hist["iteration"][-1] < 10**6


def test_writeback(tmp_path):
    f, g = _lasso_ops()
    slv = PGD(f=f, g=g, folder=tmp_path / "wb", writeback_rate=20)
    slv.fit(x0=jnp.zeros(8), stop_crit=MaxIter(60), max_iter=60)
    data = np.load(tmp_path / "wb" / "data.npz")
    assert "mstate_x" in data
    assert np.allclose(data["mstate_x"], slv.solution(), atol=1e-6)


# ---------------------------------------------------------------------------
# precision_schedule (VERDICT r3 #9: the measured bf16-warm/f32-polish recipe
# as API — BASELINE rounds 2/6 quality guarantees)
# ---------------------------------------------------------------------------
class TestPrecisionSchedule:
    def _lasso(self):
        rng = np.random.default_rng(11)
        A = rng.standard_normal((40, 60)).astype(np.float32) / np.sqrt(60)
        x_true = np.zeros(60, np.float32)
        x_true[::9] = 1.0
        y = A @ x_true
        K = ExplicitLinOp(jnp.asarray(A))
        f = SquaredL2Norm((40,)).asloss(jnp.asarray(y)) * K
        g = 0.02 * L1Norm((60,))
        return f, g

    def _objective(self, f, g, x):
        return float(f.apply(x) + g.apply(x))

    def test_two_phase_recovers_f32_objective(self):
        f, g = self._lasso()
        x0 = jnp.zeros(60, jnp.float32)
        ref = PGD(f=f, g=g)
        ref.fit(x0=x0, stop_crit=MaxIter(400), max_iter=400)
        obj_f32 = self._objective(f, g, ref.solution())

        slv = PGD(f=f, g=g)
        slv.fit(x0=x0, stop_crit=MaxIter(400), max_iter=400,
                precision_schedule=[(jnp.bfloat16, 250), (jnp.float32, None)])
        assert slv.solution().dtype == jnp.float32
        obj_sched = self._objective(f, g, slv.solution())
        # the f32 polish recovers the f32 objective (round-6 guarantee)
        assert obj_sched <= obj_f32 * 1.02 + 1e-6, (obj_sched, obj_f32)

        # pure-bf16 run for contrast: must NOT beat the schedule's objective
        b16 = PGD(f=f, g=g)
        b16.fit(x0=x0.astype(jnp.bfloat16), stop_crit=MaxIter(400),
                max_iter=400)
        obj_b16 = self._objective(f, g, b16.solution().astype(jnp.float32))
        assert obj_sched <= obj_b16 + 1e-6

    def test_phase_iteration_budget_and_final_stop_crit(self):
        f, g = self._lasso()
        slv = PGD(f=f, g=g)
        # tight final stop criterion: the last phase may stop early; the
        # total must stay within max_iter
        slv.fit(x0=jnp.zeros(60, jnp.float32),
                stop_crit=RelError(eps=1e-3, var="x"), max_iter=300,
                precision_schedule=[(jnp.bfloat16, 50), (jnp.float32, None)])
        assert slv.stats()[1]["iteration"][-1] <= 300

    def test_validation(self):
        f, g = self._lasso()
        slv = PGD(f=f, g=g)
        with pytest.raises(ValueError, match="non-empty"):
            slv.fit(x0=jnp.zeros(60), precision_schedule=[])
        with pytest.raises(ValueError, match="positive iteration"):
            slv.fit(x0=jnp.zeros(60),
                    precision_schedule=[(jnp.bfloat16, None),
                                        (jnp.float32, None)])
        with pytest.raises(ValueError, match="BLOCK"):
            slv.fit(x0=jnp.zeros(60), mode=Mode.MANUAL,
                    precision_schedule=[(jnp.float32, None)])
        # phases must respect the documented hard max_iter cap
        with pytest.raises(ValueError, match="hard cap"):
            slv.fit(x0=jnp.zeros(60), max_iter=100,
                    precision_schedule=[(jnp.bfloat16, 80),
                                        (jnp.float32, 80)])

    def test_hard_cap_not_exceeded(self):
        f, g = self._lasso()
        slv = PGD(f=f, g=g)
        slv.fit(x0=jnp.zeros(60, jnp.float32), stop_crit=MaxIter(100),
                max_iter=100,
                precision_schedule=[(jnp.bfloat16, 100), (jnp.float32, None)])
        # the exhausted final phase is skipped -> exactly 100 iterations
        assert slv.stats()[1]["iteration"][-1] <= 100


def test_precision_schedule_reuses_compiled_segments():
    """Alternating phases must hit the (now dict-backed) segment cache:
    a second scheduled fit compiles nothing new."""
    rng = np.random.default_rng(5)
    A = rng.standard_normal((20, 30)).astype(np.float32)
    K = ExplicitLinOp(jnp.asarray(A))
    f = SquaredL2Norm((20,)).asloss(jnp.asarray(rng.standard_normal(20)
                                                .astype(np.float32))) * K
    g = 0.02 * L1Norm((30,))
    slv = PGD(f=f, g=g)
    kw = dict(stop_crit=MaxIter(40), max_iter=40,
              precision_schedule=[(jnp.bfloat16, 20), (jnp.float32, None)])
    slv.fit(x0=jnp.zeros(30), **kw)
    sizes = {k: fn._cache_size() for k, (fn, _) in slv._seg_cache.items()}
    assert len(sizes) >= 2          # one segment per phase, both retained
    slv.fit(x0=jnp.zeros(30), **kw)
    for k, (fn, _) in slv._seg_cache.items():
        assert fn._cache_size() == sizes[k], "second scheduled fit retraced"


def test_cg_restart_path_still_exact():
    """cg_solve with restart_rate < maxiter (the lax.cond refresh branch)
    solves as accurately as the static no-restart path (regression for the
    round-5 static-skip: both paths must remain live and correct)."""
    import numpy as np

    from pyxu_tpu.math.cg import cg_solve
    rng = np.random.default_rng(0)
    A = rng.standard_normal((24, 24))
    Q = A @ A.T + 24 * np.eye(24)
    b = rng.standard_normal(24)
    mv = lambda v: jnp.asarray(Q, jnp.float32) @ v
    x_ref = np.linalg.solve(Q, b)
    for rr in (5, 100):   # restart fires 4x / never
        x = np.asarray(cg_solve(mv, jnp.asarray(b, jnp.float32),
                                rtol=1e-7, maxiter=60, restart_rate=rr))
        assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-4, rr
