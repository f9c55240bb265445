"""NUFFT types 1/2/3 vs direct NUDFT evaluators (reference:
src/pyxu_tests/operator/linop/fft/test_nufft*.py validates against `_nudft`
the same way)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conformance import ConformanceSuite
from pyxu_tpu.operator.linop.nufft import NUFFT, nudft1, nudft2, nudft3
from pyxu_tpu.utils.complex import view_as_complex, view_as_real

rng0 = np.random.default_rng(83)


def _pts(M, d):
    return rng0.uniform(-np.pi, np.pi, (M, d))


def _rel(a, b):
    return np.linalg.norm(np.asarray(a).ravel() - np.asarray(b).ravel()) / \
        max(np.linalg.norm(np.asarray(b).ravel()), 1e-30)


@pytest.mark.parametrize("d,N", [(1, 16), (2, (8, 12)), (3, (6, 8, 5))])
@pytest.mark.parametrize("isign", [+1, -1])
def test_type1_accuracy(d, N, isign):
    M = 37
    x = _pts(M, d)
    c = rng0.standard_normal(M) + 1j * rng0.standard_normal(M)
    op = NUFFT.type1(jnp.asarray(x), N, isign=isign, eps=1e-7)
    got = view_as_complex(op.apply(view_as_real(jnp.asarray(c))))
    want = nudft1(c, x, N, isign=isign)
    assert _rel(got, want) < 1e-5


@pytest.mark.parametrize("d,N", [(1, 16), (2, (8, 12))])
def test_type2_accuracy(d, N):
    M = 29
    x = _pts(M, d)
    Nt = (N,) * d if isinstance(N, int) else N
    f = rng0.standard_normal(Nt) + 1j * rng0.standard_normal(Nt)
    op = NUFFT.type2(jnp.asarray(x), N, isign=-1, eps=1e-7)
    got = view_as_complex(op.apply(view_as_real(jnp.asarray(f))))
    want = nudft2(f, x, N, isign=-1)
    assert _rel(got, want) < 1e-5


@pytest.mark.parametrize("d", [1, 2])
def test_type3_accuracy(d):
    M, K = 23, 19
    x = rng0.uniform(-2.0, 2.0, (M, d))
    z = rng0.uniform(-8.0, 8.0, (K, d))
    c = rng0.standard_normal(M) + 1j * rng0.standard_normal(M)
    op = NUFFT.type3(jnp.asarray(x), jnp.asarray(z), isign=+1, eps=1e-7)
    got = view_as_complex(op.apply(view_as_real(jnp.asarray(c))))
    want = nudft3(c, x, z, isign=+1)
    assert _rel(got, want) < 1e-4


def test_eps_controls_error():
    M, N = 41, 32
    x = _pts(M, 1)
    c = rng0.standard_normal(M) + 1j * rng0.standard_normal(M)
    want = nudft1(c, x, N)
    errs = []
    for eps in (1e-3, 1e-6, 1e-9):
        op = NUFFT.type1(jnp.asarray(x), N, eps=eps)
        got = view_as_complex(op.apply(view_as_real(jnp.asarray(c))))
        errs.append(_rel(got, want))
    assert errs[0] > errs[2]
    assert errs[2] < 1e-7


class TestNUFFT1Conformance(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return NUFFT.type1(jnp.asarray(_pts(15, 2)), (6, 8), eps=1e-6)


class TestNUFFT2Conformance(ConformanceSuite):
    @pytest.fixture
    def op(self):
        return NUFFT.type2(jnp.asarray(_pts(15, 2)), (6, 8), eps=1e-6)


class TestNUFFT3Conformance(ConformanceSuite):
    @pytest.fixture
    def op(self):
        x = rng0.uniform(-1, 1, (10, 1))
        z = rng0.uniform(-5, 5, (8, 1))
        return NUFFT.type3(jnp.asarray(x), jnp.asarray(z), eps=1e-6)


def test_type1_real_input():
    M, N = 19, 12
    x = _pts(M, 1)
    c = rng0.standard_normal(M)
    op = NUFFT.type1(jnp.asarray(x), N, eps=1e-7, real=True)
    got = view_as_complex(op.apply(jnp.asarray(c)))
    want = nudft1(c.astype(complex), x, N)
    assert _rel(got, want) < 1e-5


def test_type1_batch():
    M, N = 17, 10
    x = _pts(M, 1)
    c = rng0.standard_normal((3, M)) + 1j * rng0.standard_normal((3, M))
    op = NUFFT.type1(jnp.asarray(x), N, eps=1e-6)
    got = op.apply(view_as_real(jnp.asarray(c)))
    assert got.shape == (3, N, 2)
    for b in range(3):
        want = nudft1(c[b], x, N)
        assert _rel(view_as_complex(got[b]), want) < 1e-4


class TestMM1SpreadInterp:
    """1-D dense one-hot MXU path (PYXU_TPU_NUFFT_MM) must agree with the
    XLA scatter/gather path and the direct NUDFT (at d=1 a dense (Mc, n1)
    tap matrix is cheap — no binned partition needed)."""

    def test_mm1_matches_scatter_and_direct(self, monkeypatch):
        M, N = 700, 48
        x = _pts(M, 1)
        op = NUFFT.type1(x, N, eps=1e-6)
        c = (rng0.standard_normal(M)
             + 1j * rng0.standard_normal(M)).astype(np.complex64)
        cr = jnp.asarray(view_as_real(c))
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "0")
        f_sc = np.asarray(op.apply(cr))
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "1")
        f_mm = np.asarray(op.apply(cr))
        assert _rel(f_mm, f_sc) < 1e-5
        assert _rel(view_as_complex(f_mm), nudft1(c, x, N)) < 1e-4
        fr = jnp.asarray(rng0.standard_normal(op.codim_shape), jnp.float32)
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "0")
        a_sc = np.asarray(op.adjoint(fr))
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "1")
        a_mm = np.asarray(op.adjoint(fr))
        assert _rel(a_mm, a_sc) < 1e-5


class TestMM3SpreadInterp:
    """3-D slab-binned MXU spreading path (PYXU_TPU_NUFFT_MM) must agree
    with the XLA scatter/gather path and the direct NUDFT."""

    def _op_and_data(self, M=900, N=(12, 10, 8)):
        x = _pts(M, 3)
        op = NUFFT.type1(x, N, eps=1e-6)
        c = rng0.standard_normal(M) + 1j * rng0.standard_normal(M)
        return op, x, c

    def test_plan_exists(self):
        op, _, _ = self._op_and_data()
        assert op._mm3 is not None
        S, Mp = op._mm3.perm.shape
        # every point appears exactly once in the partition
        ids = np.asarray(op._mm3.perm).ravel()
        real = ids[ids < op._M]
        assert len(np.unique(real)) == op._M == len(real)

    def test_spread_interp_match_scatter(self, monkeypatch):
        op, x, c = self._op_and_data()
        cr = jnp.asarray(view_as_real(c.astype(np.complex64)))
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "0")
        f_sc = np.asarray(op.apply(cr))
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "1")
        f_mm = np.asarray(op.apply(cr))
        assert _rel(f_mm, f_sc) < 1e-5
        fr = jnp.asarray(rng0.standard_normal(op.codim_shape), jnp.float32)
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "0")
        a_sc = np.asarray(op.adjoint(fr))
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "1")
        a_mm = np.asarray(op.adjoint(fr))
        assert _rel(a_mm, a_sc) < 1e-5

    def test_mm3_vs_direct(self, monkeypatch):
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "1")
        op, x, c = self._op_and_data(M=300, N=(10, 9, 7))
        f = view_as_complex(np.asarray(
            op.apply(jnp.asarray(view_as_real(c.astype(np.complex64))))))
        fd = nudft1(c, x, (10, 9, 7))
        assert _rel(f, fd) < 1e-4

    def test_clustered_points_fall_back(self):
        # all points in one slab -> padding blowup -> plan refused
        x = np.zeros((5000, 3)) + 0.01 * rng0.standard_normal((5000, 3))
        op = NUFFT.type1(np.mod(x, 2 * np.pi), (64, 8, 8), eps=1e-6)
        assert op._mm3 is None  # scatter fallback; apply still works
        cr = jnp.asarray(rng0.standard_normal((5000, 2)), jnp.float32)
        out = np.asarray(op.apply(cr))
        assert np.isfinite(out).all()

    def test_type3_3d_mm_paths(self, monkeypatch):
        x = _pts(500, 3)
        z = rng0.uniform(-8, 8, (400, 3))
        op = NUFFT.type3(x, z, eps=1e-6)
        assert op._mm3_x is not None and op._mm3_s is not None
        c = rng0.standard_normal(500) + 1j * rng0.standard_normal(500)
        cr = jnp.asarray(view_as_real(c.astype(np.complex64)))
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "0")
        f_sc = np.asarray(op.apply(cr))
        a_sc = np.asarray(op.adjoint(jnp.asarray(f_sc)))
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "1")
        f_mm = np.asarray(op.apply(cr))
        a_mm = np.asarray(op.adjoint(jnp.asarray(f_sc)))
        assert _rel(f_mm, f_sc) < 1e-5
        assert _rel(a_mm, a_sc) < 1e-5
        fd = nudft3(c, x, z)
        assert _rel(view_as_complex(f_mm), fd) < 1e-4


class TestSlab2Paths:
    """Slab-binned MXU spreading (`_SlabPlan`): batched-over-slabs
    kernels must agree with the scatter and dense-mm2 paths and with the
    direct NUDFT (the TPU fast path for type-1/2/3 in 2-D)."""

    def test_type12_slab2_vs_scatter(self, monkeypatch):
        from pyxu_tpu.operator.linop.nufft import _NUFFT12, _SlabPlan
        x = _pts(800, 2)
        op = NUFFT.type1(x, (24, 20), eps=1e-6)
        assert isinstance(op._mm3, _SlabPlan)
        c = rng0.standard_normal(800) + 1j * rng0.standard_normal(800)
        cr = jnp.asarray(view_as_real(c.astype(np.complex64)))
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "0")
        f_sc = np.asarray(op.apply(cr))
        a_sc = np.asarray(op.adjoint(jnp.asarray(f_sc)))
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "1")
        f_mm = np.asarray(op.apply(cr))
        a_mm = np.asarray(op.adjoint(jnp.asarray(f_sc)))
        assert _rel(f_mm, f_sc) < 1e-5
        assert _rel(a_mm, a_sc) < 1e-5
        fd = nudft1(c, x, (24, 20))
        assert _rel(view_as_complex(f_mm), fd) < 1e-4

    def test_type3_2d_slab2_vs_scatter(self, monkeypatch):
        from pyxu_tpu.operator.linop.nufft import _SlabPlan
        x = _pts(600, 2)
        z = rng0.uniform(-9, 9, (500, 2))
        op = NUFFT.type3(x, z, eps=1e-6)
        assert isinstance(op._mm3_x, _SlabPlan)
        assert isinstance(op._mm3_s, _SlabPlan)
        c = rng0.standard_normal(600) + 1j * rng0.standard_normal(600)
        cr = jnp.asarray(view_as_real(c.astype(np.complex64)))
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "0")
        f_sc = np.asarray(op.apply(cr))
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "1")
        f_mm = np.asarray(op.apply(cr))
        assert _rel(f_mm, f_sc) < 1e-5
        fd = nudft3(c, x, z)
        assert _rel(view_as_complex(f_mm), fd) < 1e-4

    def test_slab2_adjoint_dot(self, monkeypatch):
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "1")
        x = _pts(700, 2)
        op = NUFFT.type1(x, (20, 16), eps=1e-6)
        u = jnp.asarray(rng0.standard_normal((700, 2)), jnp.float32)
        f = jnp.asarray(rng0.standard_normal((20, 16, 2)), jnp.float32)
        d1 = float(jnp.vdot(op.apply(u), f))
        d2 = float(jnp.vdot(u, op.adjoint(f)))
        assert abs(d1 - d2) < 1e-4 * max(abs(d1), 1.0)

    def test_slab2_clustered_fallback(self, monkeypatch):
        # all points in one slab -> padding blowup -> plan refused ->
        # dense-mm2 fallback still correct
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "1")
        x = np.mod(np.zeros((4000, 2)) + 0.01 * rng0.standard_normal((4000, 2)),
                   2 * np.pi)
        op = NUFFT.type1(x, (64, 16), eps=1e-6)
        assert op._mm3 is None
        c = rng0.standard_normal(4000) + 1j * rng0.standard_normal(4000)
        cr = jnp.asarray(view_as_real(c.astype(np.complex64)))
        fd = nudft1(c, x, (64, 16))
        assert _rel(view_as_complex(np.asarray(op.apply(cr))), fd) < 1e-4


class TestUpsampfac:
    """FINUFFT-style low-oversampling option (sigma=1.25: ~4x/d smaller
    fine grid, wider kernel — reference exposes FINUFFT's upsampfac)."""

    @pytest.mark.parametrize("d,N", [(1, (40,)), (2, (30, 24)), (3, (12, 10, 8))])
    def test_sigma125_accuracy(self, d, N):
        x = _pts(600, d)
        c = rng0.standard_normal(600) + 1j * rng0.standard_normal(600)
        a = jnp.asarray(view_as_real(c.astype(np.complex64)))
        op = NUFFT.type1(x, N, eps=1e-4, upsampfac=1.25)
        assert all(nf < 2 * n for nf, n in zip(op._nf, N) if 2 * op._w + 1 < 2 * n)
        got = view_as_complex(np.asarray(op.apply(a)))
        fd = nudft1(c, x, N)
        assert _rel(got, fd) < 5e-4

    def test_sigma125_adjoint_consistent(self):
        x = _pts(500, 2)
        op = NUFFT.type1(x, (24, 20), eps=1e-4, upsampfac=1.25)
        u = jnp.asarray(rng0.standard_normal((500, 2)), jnp.float32)
        f = jnp.asarray(rng0.standard_normal((24, 20, 2)), jnp.float32)
        d1 = float(jnp.vdot(op.apply(u), f))
        d2 = float(jnp.vdot(u, op.adjoint(f)))
        assert abs(d1 - d2) < 1e-4 * max(abs(d1), 1.0)

    def test_sigma125_refuses_unreachable_eps(self):
        x = _pts(100, 2)
        import jax as _jax
        if _jax.config.jax_enable_x64:
            with pytest.raises(ValueError, match="cannot reach"):
                NUFFT.type1(x, (16, 16), eps=1e-10, upsampfac=1.25)
        else:
            with pytest.raises(ValueError, match="cannot reach"):
                NUFFT.type1(x, (16, 16), eps=1e-7, upsampfac=1.25)

    def test_only_calibrated_sigmas_accepted(self):
        x = _pts(50, 2)
        with pytest.raises(ValueError, match="1.25 or 2.0"):
            NUFFT.type1(x, (16, 16), eps=1e-4, upsampfac=1.1)

    def test_type2_sigma125(self):
        x = _pts(400, 2)
        op = NUFFT.type2(x, (20, 18), eps=1e-4, upsampfac=1.25)
        f = rng0.standard_normal(18 * 20) + 1j * rng0.standard_normal(18 * 20)
        f = f.reshape(20, 18)
        got = view_as_complex(np.asarray(op.apply(
            jnp.asarray(view_as_real(f.astype(np.complex64))))))
        fd = nudft2(f, x, (20, 18))
        assert _rel(got, fd) < 5e-4


class TestType3RealAndKwargs:
    """Round-2 parity: type-3 `real=` input (reference nufft.py:550-660) and
    tolerated FINUFFT-only plan options."""

    def test_type3_real_matches_dense(self):
        from pyxu_tpu.experimental._dev import NUFFT3_array
        rng = np.random.default_rng(0)
        x = rng.uniform(-2, 2, (25, 2))
        z = rng.uniform(-3, 3, (18, 2))
        A = NUFFT.type3(x, z, eps=1e-7, real=True)
        assert A.dim_shape == (25,)
        c = rng.normal(size=25).astype(np.float32)
        got = np.asarray(A.apply(jnp.asarray(c)))
        want = NUFFT3_array(x, z, +1) @ c
        gotc = got[:, 0] + 1j * got[:, 1]
        assert np.abs(gotc - want).max() / np.abs(want).max() < 1e-5
        # adjoint is real-valued and passes the dot test
        f = rng.normal(size=(18, 2)).astype(np.float32)
        adj = np.asarray(A.adjoint(jnp.asarray(f)))
        assert adj.shape == (25,)
        lhs = float(np.sum(got * f))
        rhs = float(np.sum(c * adj))
        assert abs(lhs - rhs) / abs(lhs) < 1e-4

    def test_finufft_only_kwargs_tolerated(self):
        import warnings
        from pyxu_tpu.info.warnings import PerformanceWarning
        x = np.random.default_rng(1).uniform(-np.pi, np.pi, (9, 1))
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            NUFFT.type1(x, 8, eps=1e-4, n_trans=3, nthreads=4)
        assert any(isinstance(r.message, PerformanceWarning) for r in rec)
        with pytest.raises(TypeError):
            NUFFT.type2(x, 8, not_an_option=True)


class TestToeplitzGram:
    """NUFFT normal operator via Toeplitz/circulant embedding: gram/cogram
    match the synthesized ``A.T * A`` composition (reference semantics,
    abc/operator.py:1618-1663) while applying with two FFTs and no
    spread/interp."""

    @pytest.mark.parametrize("d,N", [(1, (8,)), (2, (6, 7))])
    @pytest.mark.parametrize("isign", [+1, -1])
    def test_gram_cogram_match_dense(self, d, N, isign):
        from pyxu_tpu.operator.linop.nufft import _NUFFTToeplitz
        M = 23
        x = _pts(M, d)
        A2 = NUFFT.type2(x, N, isign=isign, eps=1e-7)
        G = A2.gram()
        assert isinstance(G, _NUFFTToeplitz)
        Gm = np.asarray(G.asarray()).reshape(G.codim_size, G.dim_size)
        ref = np.asarray((A2.T * A2).asarray()).reshape(G.codim_size, G.dim_size)
        assert np.abs(Gm - ref).max() / np.abs(ref).max() < 2e-4
        assert np.abs(Gm - Gm.T).max() / np.abs(ref).max() < 2e-4  # symmetric
        A1 = NUFFT.type1(x, N, isign=isign, eps=1e-7)
        C = A1.cogram()
        Cm = np.asarray(C.asarray()).reshape(C.codim_size, C.dim_size)
        ref1 = np.asarray((A1 * A1.T).asarray()).reshape(C.codim_size, C.dim_size)
        assert np.abs(Cm - ref1).max() / np.abs(ref1).max() < 2e-4

    def test_real_input_gram(self):
        M, N = 21, (6, 5)
        x = _pts(M, 2)
        A = NUFFT.type2(x, N, eps=1e-7, real=True)
        G = A.gram()
        assert G.dim_shape == N and G.codim_shape == N
        Gm = np.asarray(G.asarray()).reshape(G.codim_size, G.dim_size)
        ref = np.asarray((A.T * A).asarray()).reshape(G.codim_size, G.dim_size)
        assert np.abs(Gm - ref).max() / np.abs(ref).max() < 2e-4

    def test_quadratic_chain_picks_up_toeplitz(self):
        """0.5*||A x - y||^2 must carry the Toeplitz gram as its Q so
        QuadraticFunc.prox / ADMM x-updates run spread-free."""
        from pyxu_tpu.operator.func import SquaredL2Norm
        from pyxu_tpu.operator.linop.nufft import _NUFFTToeplitz
        M, N = 23, (8, 8)
        x = _pts(M, 2)
        A = NUFFT.type2(x, N, eps=1e-6)
        rng = np.random.default_rng(5)
        y = view_as_real(nudft2(
            rng.standard_normal(N) + 1j * rng.standard_normal(N), x, N))
        y = jnp.asarray(np.asarray(y, np.float32))
        f = 0.5 * SquaredL2Norm((M, 2)).asloss(y) * A
        Q, _, _ = f._quad_spec()
        leaf = Q
        while hasattr(leaf, "_op"):
            leaf = leaf._op
        assert isinstance(leaf, _NUFFTToeplitz)
        # grad through the Toeplitz path == A^H (A x - y)
        xt = jnp.asarray(rng.standard_normal(N + (2,)).astype(np.float32))
        g1 = np.asarray(f.grad(xt))
        g2 = np.asarray(A.adjoint(A.apply(xt) - y))
        assert np.abs(g1 - g2).max() / max(np.abs(g2).max(), 1e-30) < 1e-4
        # prox solves (I + tau Q)p = b: check optimality via the gradient
        tau = 0.37
        p = f.prox(xt, tau)
        resid = np.asarray(p + tau * f.grad(p) - xt)
        assert np.abs(resid).max() < 1e-3

    def test_trace_and_lipschitz(self):
        M, N = 19, (6, 6)
        A = NUFFT.type2(_pts(M, 2), N, eps=1e-6)
        G = A.gram()
        dense = np.asarray(G.asarray()).reshape(G.dim_size, G.dim_size)
        assert abs(G.trace() - np.trace(dense)) / abs(np.trace(dense)) < 1e-4
        # constructor bound is a valid upper bound; power iteration refines
        true_norm = np.linalg.norm(dense, 2)
        assert G.lipschitz >= true_norm * (1 - 1e-4)
        est = G.estimate_lipschitz(maxiter=128)
        assert est <= G.trace()  # sane
        assert abs(est - true_norm) / true_norm < 0.05

    def test_batched_apply(self):
        M, N = 17, (5, 6)
        A = NUFFT.type2(_pts(M, 2), N, eps=1e-6)
        G = A.gram()
        xb = jnp.asarray(np.random.default_rng(3)
                         .standard_normal((3, 2) + N + (2,)).astype(np.float32))
        out = np.asarray(G.apply(xb))
        assert out.shape == (3, 2) + N + (2,)
        one = np.asarray(G.apply(xb[1, 0]))
        assert np.abs(out[1, 0] - one).max() < 1e-5


class TestToeplitzGramReviewRegressions:
    """Round-3 review findings: real_in cogram must not drop the Re()
    restriction; shifted (Hankel) kernels must not claim the unshifted
    closed-form trace."""

    def test_real_in_cogram_matches_composition(self):
        M, N = 13, (10,)
        x = _pts(M, 1)
        A = NUFFT.type1(x, N, real=True, eps=1e-7)
        C = A.cogram()
        rng = np.random.default_rng(2)
        y = jnp.asarray(rng.standard_normal(N + (2,)).astype(np.float32))
        want = np.asarray(A.apply(A.adjoint(y)))
        got = np.asarray(C.apply(y))
        assert np.abs(got - want).max() / max(np.abs(want).max(), 1e-30) < 1e-4

    def test_shifted_kernel_trace(self):
        from pyxu_tpu.operator.linop.nufft import _NUFFTToeplitz
        x = _pts(9, 1)
        Hk = _NUFFTToeplitz(np.asarray(x, np.float64), (8,), +1, 1e-7,
                            real_in=True, kernel_shift=(-1,))
        dense = np.asarray(Hk.asarray()).reshape(8, 8)
        tr = Hk.trace()
        assert abs(tr - np.trace(dense)) / max(abs(np.trace(dense)), 1e-30) < 0.5

    def test_chan_cache_survives_pytree_roundtrip(self):
        """Advisor round-2 (medium): ``_chan_cache`` must survive pytree
        flatten/unflatten — it is a _VOLATILE_FIELDS entry (raw array on the
        instance, _Meta-wrapped only inside the aux treedef), so a gram op
        that passed through jit/vmap/solver-mstate keeps a working
        ``_chan_lam`` and its treedef stays hashable."""
        import jax.tree_util as jtu
        M, N = 19, (8, 6)
        x = _pts(M, 2)
        G = NUFFT.type2(x, N, real=True, eps=1e-6).gram()
        lam0 = np.asarray(G._chan_lam())          # populates the cache
        leaves, treedef = jtu.tree_flatten(G)
        hash(treedef)                             # aux must stay hashable
        G2 = jtu.tree_unflatten(treedef, leaves)
        lam1 = np.asarray(G2._chan_lam())         # raw array, not _Meta
        assert np.array_equal(lam0, lam1)
        # the rebuilt cache must also round-trip a second time
        leaves2, treedef2 = jtu.tree_flatten(G2)
        G3 = jtu.tree_unflatten(treedef2, leaves2)
        assert np.array_equal(np.asarray(G3._chan_lam()), lam0)
        # precond solve path stays functional after the round-trip
        solve = G2._circulant_precond()
        r = np.random.default_rng(0).standard_normal(N).astype(np.float32)
        out = np.asarray(solve(jnp.asarray(r), 0.5))
        assert out.shape == N and np.isfinite(out).all()


class TestNUFFTKnownAnswers(ConformanceSuite):
    """Hard-coded ground truth for the NUFFT (reference discipline:
    src/pyxu_tests/operator/examples/) — hand-computed sums of complex
    exponentials at convention-revealing points (0, ±pi/2), mode indices
    k = -N/2 .. N/2-1, isign=+1."""

    @pytest.fixture
    def op(self):
        x = np.asarray([0.0, np.pi / 2, -np.pi / 2])
        return NUFFT.type2(jnp.asarray(x), (4,), isign=+1, eps=1e-9)

    @pytest.fixture
    def data_apply(self):
        # f(x_j) = sum_k c_k e^{+i k x_j}, c = [1, 2, 0, -1] at k = -2..1:
        #   f(0)      = 1 + 2 + 0 - 1              = 2
        #   f(pi/2)   = -1·1 + (-i)·2 + 0 + i·(-1) = -1 - 3i
        #   f(-pi/2)  = -1·1 + i·2 + 0 + (-i)·(-1) = -1 + 3i
        c = np.asarray([[1.0, 0.0], [2.0, 0.0], [0.0, 0.0], [-1.0, 0.0]])
        want = np.asarray([[2.0, 0.0], [-1.0, -3.0], [-1.0, 3.0]])
        return c, want

    def test_type1_known_answer(self):
        # u_k = sum_j c_j e^{+i k x_j}, x = [0, pi/2], c = [1, i]:
        #   k=-2: 1 + i·e^{-i pi} = 1 - i      k=-1: 1 + i·(-i) = 2
        #   k= 0: 1 + i                        k= 1: 1 + i·i    = 0
        x = np.asarray([0.0, np.pi / 2])
        op = NUFFT.type1(jnp.asarray(x), (4,), isign=+1, eps=1e-9)
        c = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
        want = np.asarray([[1.0, -1.0], [2.0, 0.0], [1.0, 1.0], [0.0, 0.0]])
        got = np.asarray(op.apply(c))
        assert np.allclose(got, want, atol=1e-6), got


class TestPlanInvariants:
    """Plan-time invariant assertions (VERDICT r4 item 8): the sort-permute
    bijection and ragged step-list structure are checked by the PLANNERS at
    build time, not only by tests."""

    def test_valid_partition_passes(self):
        from pyxu_tpu.operator.linop.nufft import (_assert_perm_bijection,
                                                   _bin_partition_np)
        rng = np.random.default_rng(0)
        bins = rng.integers(0, 7, 500)
        perm, inv, _ = _bin_partition_np(bins, 7, 256, max_blowup=50.0)
        _assert_perm_bijection(perm, inv, 500)  # does not raise

    def test_duplicate_id_raises(self):
        from pyxu_tpu.operator.linop.nufft import _assert_perm_bijection
        perm = np.asarray([[0, 1, 2, 2], [3, 5, 5, 5]])  # 4 dup'd, 2 twice
        with pytest.raises(AssertionError, match="bijection"):
            _assert_perm_bijection(perm, None, 5)

    def test_bad_invperm_raises(self):
        from pyxu_tpu.operator.linop.nufft import _assert_perm_bijection
        perm = np.asarray([[1, 0], [2, 3]])
        bad_inv = np.asarray([0, 1, 2, 3])  # identity, but perm swaps 0/1
        with pytest.raises(AssertionError, match="invperm"):
            _assert_perm_bijection(perm, bad_inv, 4)

    def test_ragged_step_on_empty_slab_raises(self):
        from pyxu_tpu.operator.linop.nufft import _assert_ragged_steps
        occ = np.asarray([1.0, 0.0, 1.0], np.float32)
        with pytest.raises(AssertionError, match="unoccupied"):
            _assert_ragged_steps(np.asarray([0, 1]), np.asarray([1, 1]), occ)

    def test_ragged_step_first_mismatch_raises(self):
        from pyxu_tpu.operator.linop.nufft import _assert_ragged_steps
        occ = np.ones(3, np.float32)
        with pytest.raises(AssertionError, match="step_first"):
            _assert_ragged_steps(np.asarray([0, 0, 2]),
                                 np.asarray([1, 1, 1]), occ)

    def test_ragged_noncontiguous_slab_raises(self):
        from pyxu_tpu.operator.linop.nufft import _assert_ragged_steps
        occ = np.ones(3, np.float32)
        with pytest.raises(AssertionError, match="contiguous"):
            _assert_ragged_steps(np.asarray([0, 2, 0]),
                                 np.asarray([1, 1, 1]), occ)

    def test_ragged_partition_passes(self):
        from pyxu_tpu.operator.linop.nufft import _ragged_partition_np
        rng = np.random.default_rng(1)
        binid = rng.integers(0, 5, 2000, dtype=np.int64)
        out = _ragged_partition_np(binid, 8, 256)
        assert out is not None  # build-time assertions did not fire
