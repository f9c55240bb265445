"""Reference-API compat surface: backend registry (info/deps.py:25-204),
precision coercion state (runtime/_runtime.py:102-136,248-259), complex
matrix views (util/complex.py:143-322), introspection helpers
(util/inspect.py:12-43), shape inference (util/operator.py:21-35),
torch converters (interop/torch.py:53-105), DoG alias (filter.py:314)."""

import numpy as np
import jax.numpy as jnp
import pytest

import pyxu_tpu.info as info
import pyxu_tpu.operator as op
import pyxu_tpu.utils as ut
from pyxu_tpu.utils.complex import (
    view_as_complex_mat,
    view_as_real,
    view_as_real_mat,
)


class TestDepsRegistry:
    def test_from_obj(self):
        assert info.NDArrayInfo.from_obj(jnp.ones(3)) is info.NDArrayInfo.JAX
        assert info.NDArrayInfo.from_obj(np.ones(3)) is info.NDArrayInfo.NUMPY
        with pytest.raises(ValueError):
            info.NDArrayInfo.from_obj([1, 2])

    def test_modules_and_types(self):
        assert info.NDArrayInfo.JAX.module() is jnp
        assert info.NDArrayInfo.NUMPY.type() is np.ndarray
        assert np.ndarray in info.supported_array_types()
        assert np in info.supported_array_modules()

    def test_flags(self):
        assert info.CUPY_ENABLED is False
        assert info.JAX_SUPPORT is True
        assert info.NDArrayInfo.from_flag(gpu=True) is info.NDArrayInfo.JAX

    def test_sparse(self):
        import scipy.sparse as sp
        m = sp.eye(3).tocsr()
        assert info.SparseArrayInfo.from_obj(m) is info.SparseArrayInfo.SCIPY


class TestPrecisionState:
    def test_enforce_precision_toggle(self):
        x64 = jnp.ones(3, jnp.float64) if jnp.ones(3).dtype == jnp.float64 \
            else jnp.ones(3)
        assert info.getCoerceState()
        with info.EnforcePrecision(False):
            assert not info.getCoerceState()
            out = info.coerce(jnp.ones(3, jnp.float16))
            assert out.dtype == jnp.float16  # passthrough
        assert info.getCoerceState()
        assert info.coerce(jnp.ones(3, jnp.float16)).dtype == \
            info.default_fdtype()

    def test_get_precision(self):
        with info.Precision(info.Width.DOUBLE):
            assert info.getPrecision() is info.Width.DOUBLE


class TestComplexMatViews:
    def test_roundtrip_and_product(self):
        rng = np.random.default_rng(0)
        A = rng.standard_normal((4, 5)) + 1j * rng.standard_normal((4, 5))
        A = jnp.asarray(A.astype(np.complex64))
        B = view_as_real_mat(A)
        assert B.shape == (8, 10)
        x = jnp.asarray((rng.standard_normal(5) + 1j * rng.standard_normal(5))
                        .astype(np.complex64))
        lhs = np.asarray(view_as_real(A @ x)).ravel()
        rhs = np.asarray(B) @ np.asarray(view_as_real(x)).ravel()
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)
        np.testing.assert_allclose(np.asarray(view_as_complex_mat(B)),
                                   np.asarray(A), atol=1e-6)

    @pytest.mark.parametrize("ri,ro", [(True, False), (False, True)])
    def test_partial_views_roundtrip(self, ri, ro):
        rng = np.random.default_rng(1)
        A = jnp.asarray((rng.standard_normal((3, 4))
                         + 1j * rng.standard_normal((3, 4))).astype(np.complex64))
        B = view_as_real_mat(A, real_input=ri, real_output=ro)
        C = view_as_complex_mat(B, real_input=ri, real_output=ro)
        if ro:  # imaginary output rows dropped: only Re recoverable? no — cols
            np.testing.assert_allclose(np.asarray(C), np.asarray(A), atol=1e-6)
        else:
            np.testing.assert_allclose(np.asarray(C), np.asarray(A), atol=1e-6)

    def test_real_passthrough(self):
        R = jnp.ones((2, 2))
        assert view_as_real_mat(R) is R


class TestInspectHelpers:
    def test_parse_params(self):
        def f(a, b=2, *, c=3):
            return None
        assert ut.parse_params(f, 1, c=9) == {"a": 1, "b": 2, "c": 9}

    def test_import_module(self):
        assert ut.import_module("math").sqrt(4) == 2
        assert ut.import_module("definitely_missing_xyz",
                                fail_on_error=False) is None
        with pytest.raises(ModuleNotFoundError):
            ut.import_module("definitely_missing_xyz")


class TestShapeInference:
    def test_sum(self):
        assert ut.infer_sum_shape(((4,), (3,)), ((4,), (3,))) == ((4,), (3,))
        with pytest.raises(ValueError):
            ut.infer_sum_shape(((4,), (3,)), ((4,), (2,)))

    def test_composition(self):
        assert ut.infer_composition_shape(((4,), (3,)), ((3,), (5,))) == \
            ((4,), (5,))
        with pytest.raises(ValueError):
            ut.infer_composition_shape(((4,), (3,)), ((2,), (5,)))


class TestTorchConverters:
    def test_roundtrip(self):
        torch = pytest.importorskip("torch")
        from pyxu_tpu.operator.interop import asarray, astensor
        t = torch.arange(6.0).reshape(2, 3)
        a = asarray(t)
        np.testing.assert_allclose(np.asarray(a), t.numpy())
        t2 = astensor(a)
        assert torch.allclose(t2, t)


def test_dog_alias():
    assert op.DoG is op.DifferenceOfGaussians


def test_to_numpy_alias():
    assert ut.to_NUMPY is ut.to_numpy


class TestFlatAPICompat:
    """Round-2 parity: reference v1 flat-API aliases (abc/operator.py:108-128)."""

    def test_dim_codim_shape(self):
        g = op.Gradient((4, 5))
        assert g.dim == 20 and g.codim == 40
        assert g.shape == (40, 20)

    def test_ravel_unravel(self):
        g = op.Gradient((4, 5))
        y = g.apply(jnp.ones((3, 4, 5)))
        flat = g.ravel(y)
        assert flat.shape == (3, 40)
        assert g.unravel(flat).shape == (3, 2, 4, 5)
        np.testing.assert_allclose(np.asarray(g.unravel(flat)), np.asarray(y))

    def test_functional_shape(self):
        f = op.L1Norm((6,))
        assert f.shape == (1, 6) and f.dim == 6 and f.codim == 1


class TestStoppingCriterionEagerProtocol:
    """Reference clear/stop/info protocol (abc/solver.py:37-95) adapter."""

    def test_maxiter_stop_info(self):
        import pyxu_tpu.opt.stop as st
        sc = st.MaxIter(3)
        sc.clear()
        state = {"x": jnp.ones(4)}
        fires = [sc.stop(state) for _ in range(5)]
        assert fires == [False, False, False, True, True]
        assert sc.info()["N_iter"] == 4.0

    def test_combined_with_host_leg(self):
        import datetime as dt
        import pyxu_tpu.opt.stop as st
        sc = st.MaxDuration(dt.timedelta(seconds=1e4)) & st.MaxIter(1)
        sc.clear()
        assert sc.stop({"x": jnp.ones(2)}) is False
        assert sc.stop({"x": jnp.ones(2)}) is False  # duration leg not fired

    def test_relerror_eager(self):
        import pyxu_tpu.opt.stop as st
        sc = st.RelError(1e-9)
        sc.clear()
        assert not sc.stop({"x": jnp.ones(3)})
        assert sc.stop({"x": jnp.ones(3)})  # identical iterate => rel err 0


class TestStencilIntrospection:
    """relative_indices/visualize/configure_dispatcher (stencil.py:463-788)."""

    def test_relative_indices_separable(self):
        S = op.Stencil((5, 6), [np.r_[3.0, 2, 1], np.r_[2.0, -1, 3, 1]],
                       center=(1, 2))
        ri = S.relative_indices
        np.testing.assert_array_equal(ri[0], [-1, 0, 1])
        np.testing.assert_array_equal(ri[1], [-2, -1, 0, 1])

    def test_visualize_marks_center(self):
        S = op.Stencil((5, 6), [np.r_[3.0, 2, 1], np.r_[2.0, -1, 3, 1]],
                       center=(1, 2))
        s = S.visualize()
        assert "(6.0)" in s

    def test_configure_dispatcher_noop(self):
        S = op.Stencil((5,), np.r_[1.0, -2, 1], center=(1,))
        assert S.configure_dispatcher(threads_per_block=64) is S


class TestDevHelpers:
    """experimental._dev parity: Masking + dense NUDFT builders."""

    def test_masking(self):
        import pyxu_tpu.experimental._dev as dev
        m = dev.Masking(5, [True, False, True, False, True])
        y = m.apply(jnp.arange(5.0))
        np.testing.assert_allclose(np.asarray(y), [0, 2, 4])
        np.testing.assert_allclose(np.asarray(m.adjoint(y)), [0, 0, 2, 0, 4])

    def test_nudft_arrays(self):
        import pyxu_tpu.experimental._dev as dev
        x = np.random.default_rng(0).uniform(-np.pi, np.pi, (7, 2))
        A = dev.NUFFT1_array(x, (3, 4), +1)
        assert A.shape == (12, 7)
        assert dev.NUFFT2_array(x, (3, 4), -1).shape == (7, 12)
        z = np.random.default_rng(1).normal(size=(5, 2))
        assert dev.NUFFT3_array(x, z, +1).shape == (5, 7)


class TestNUFFTDiagnostics:
    """NUFFT params/mesh/plot_kernel/ascomplexarray (nufft.py:925-1123)."""

    def test_type1_dense_matches_apply(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(-np.pi, np.pi, (20, 2))
        A = op.NUFFT.type1(x, N=(5, 4), eps=1e-7)
        p = A.params()
        assert p.upsample_factor == 2.0 and p.kernel_width >= 2
        M = A.ascomplexarray()
        assert M.shape == (20, 20)
        c = rng.normal(size=20) + 1j * rng.normal(size=20)
        got = np.asarray(A.apply(
            jnp.stack([jnp.asarray(c.real), jnp.asarray(c.imag)], -1)
            .astype(jnp.float32)))
        gotc = got[..., 0] + 1j * got[..., 1]
        want = (M @ c).reshape(5, 4)
        assert np.abs(gotc - want).max() / np.abs(want).max() < 1e-5

    def test_mesh_scales(self):
        x = np.random.default_rng(0).uniform(-np.pi, np.pi, (9, 1))
        A = op.NUFFT.type1(x, N=3, eps=1e-3)
        np.testing.assert_array_equal(A.mesh()[..., 0], [-1, 0, 1])
        assert A.mesh(upsampled=True).shape[0] == A.params().fft_shape[0]

    def test_type3_params_and_dense(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(-2, 2, (15, 2))
        z = rng.uniform(-3, 3, (11, 2))
        A = op.NUFFT.type3(x, z, eps=1e-6)
        p = A.params()
        assert p.dilation_factor is not None and len(p.dilation_factor) == 2
        D = A.ascomplexarray()
        assert D.shape == (11, 15)
        c = rng.normal(size=15) + 1j * rng.normal(size=15)
        got = np.asarray(A.apply(
            jnp.stack([jnp.asarray(c.real), jnp.asarray(c.imag)], -1)
            .astype(jnp.float32)))
        gotc = got[..., 0] + 1j * got[..., 1]
        want = D @ c
        assert np.abs(gotc - want).max() / np.abs(want).max() < 1e-4

    def test_es_kernel_public(self):
        from pyxu_tpu.operator.linop.nufft import ES_kernel
        z = np.linspace(-1.5, 1.5, 11)
        phi = ES_kernel(z, 10.0)
        assert phi[0] == 0.0 and phi[-1] == 0.0 and phi[5] == 1.0


class TestSolverFileProps:
    def test_logfile_datafile(self, tmp_path):
        import pyxu_tpu.opt.solver as sol
        import pyxu_tpu.opt.stop as st
        f = op.SquaredL2Norm((4,)).asloss(jnp.zeros(4))
        g = op.L1Norm((4,))
        s = sol.PGD(f=f, g=g, folder=tmp_path / "w", exist_ok=True)
        s.fit(x0=jnp.ones(4), stop_crit=st.MaxIter(3))
        assert s.logfile is not None and s.logfile.name == "solver.log"
        assert s.datafile.name == "data.npz"


class TestPluginLoader:
    """FAIR-ecosystem entry-point loader (reference doc/fair/index.rst:219)."""

    class _EP:
        def __init__(self, name, obj, fail=False):
            self.name = name
            self._obj = obj
            self._fail = fail

        def load(self):
            if self._fail:
                raise RuntimeError("boom")
            return self._obj

    def test_inject_and_override_rules(self, monkeypatch):
        import pyxu_tpu.info.plugin as pl
        import pyxu_tpu.operator as mod
        sentinel = object()
        eps = {
            "pyxu_tpu.operator": {
                "BrandNewOp": self._EP("BrandNewOp", sentinel),
                "L1Norm": self._EP("L1Norm", sentinel),        # refused
                "_Gradient": self._EP("_Gradient", sentinel),  # override
                "Broken": self._EP("Broken", None, fail=True),
            },
        }
        monkeypatch.setattr(pl, "discover_plugins", lambda group=None: eps)
        orig_l1, orig_grad = mod.L1Norm, mod.Gradient
        try:
            with pytest.warns(info.warnings.BackendWarning):
                loaded = pl.load_plugins()
            assert mod.BrandNewOp is sentinel
            assert mod.L1Norm is orig_l1          # shadowing refused
            assert mod.Gradient is sentinel       # explicit override applied
            assert "pyxu_tpu.operator.BrandNewOp" in loaded
            assert "pyxu_tpu.operator.Broken" not in loaded
        finally:
            del mod.BrandNewOp
            mod.Gradient = orig_grad

    def test_discover_empty(self):
        import pyxu_tpu.info.plugin as pl
        found = pl.discover_plugins()
        assert set(found) == set(pl.PLUGIN_GROUPS)
        assert all(isinstance(v, dict) for v in found.values())
