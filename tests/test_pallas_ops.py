"""Pallas kernels, run in interpreter mode on CPU (compiled path exercises
the same kernel code on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.ndimage as snd

from pyxu_tpu.ops.pallas_stencil import separable_correlate2d


@pytest.mark.parametrize("shape", [(50, 70), (64, 128), (33, 257)])
@pytest.mark.parametrize("taps", [(3, 4), (9, 9), (1, 5)])
def test_separable_correlate2d(shape, taps):
    rng = np.random.default_rng(1)
    x = rng.standard_normal(shape).astype(np.float32)
    lh, lw = taps
    kh = rng.standard_normal(lh).astype(np.float32)
    kw = rng.standard_normal(lw).astype(np.float32)
    ch, cw = lh // 2, lw // 2
    got = np.asarray(separable_correlate2d(
        jnp.asarray(x), kh, kw, ch, cw, tile_rows=16, interpret=True))
    want = snd.correlate1d(
        snd.correlate1d(x.astype(np.float64), kh.astype(np.float64), axis=0,
                        origin=ch - lh // 2, mode="constant"),
        kw.astype(np.float64), axis=1, origin=cw - lw // 2, mode="constant")
    assert np.allclose(got, want, atol=1e-4)


# ---------------------------------------------------------------- NUFFT ----

class TestPallasSlabNUFFT:
    """Pallas slab spread/interp kernels (interpret mode on CPU; the
    compiled path runs the same kernel code on TPU) vs the XLA slab path
    and the direct NUDFT."""

    def _plan(self, M=4000, N=(56, 48), seed=0):
        rng = np.random.default_rng(seed)
        from pyxu_tpu.operator.linop.nufft import NUFFT
        x = rng.uniform(-np.pi, np.pi, (M, 2))
        op = NUFFT.type1(x, N, isign=+1, eps=1e-6)
        assert op._mm3 is not None
        assert op._mm3.l0T is not None or op._mm3.strip2 is not None
        return op, x, rng

    def test_spread_interp_match_xla(self, monkeypatch):
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "1")
        monkeypatch.setenv("PYXU_TPU_NUFFT_PALLAS", "1")
        monkeypatch.setenv("PYXU_TPU_NUFFT_STRIP2", "0")  # slab kernels
        from pyxu_tpu.operator.linop import nufft as nf
        op, _, rng = self._plan()
        plan = op._mm3
        c = (rng.standard_normal(op._M)
             + 1j * rng.standard_normal(op._M)).astype(np.complex64)
        cc = jnp.asarray(c)
        g_xla = np.asarray(nf._spread_slab(cc, op._nf, plan))
        g_pl = np.asarray(nf._spread_slab_pallas(cc, op._nf, plan))
        assert np.max(np.abs(g_xla - g_pl)) < 1e-5 * np.max(np.abs(g_xla))
        g = jnp.asarray((rng.standard_normal(op._nf)
                         + 1j * rng.standard_normal(op._nf))
                        .astype(np.complex64))
        v_xla = np.asarray(nf._interp_slab(g, plan))
        v_pl = np.asarray(nf._interp_slab_pallas(g, plan))
        assert np.max(np.abs(v_xla - v_pl)) < 1e-5 * np.max(np.abs(v_xla))

    def test_e2e_forced_pallas_vs_direct(self, monkeypatch):
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "1")
        monkeypatch.setenv("PYXU_TPU_NUFFT_PALLAS", "1")
        from pyxu_tpu.operator.linop.nufft import nudft1
        op, x, rng = self._plan(M=1500, N=(32, 40), seed=3)
        arr = rng.standard_normal((op._M, 2)).astype(np.float32)
        out = np.asarray(op.apply(jnp.asarray(arr)))
        ref = nudft1(arr[:, 0] + 1j * arr[:, 1], x, (32, 40), +1)
        err = np.max(np.abs(out[..., 0] + 1j * out[..., 1] - ref))
        assert err < 2e-5 * np.max(np.abs(ref))
        # batched apply exercises the pallas_call vmap batching rule
        barr = rng.standard_normal((2, op._M, 2)).astype(np.float32)
        bout = np.asarray(op.apply(jnp.asarray(barr)))
        for b in range(2):
            r = nudft1(barr[b, :, 0] + 1j * barr[b, :, 1], x, (32, 40), +1)
            e = np.max(np.abs(bout[b][..., 0] + 1j * bout[b][..., 1] - r))
            assert e < 2e-5 * np.max(np.abs(r))

    def test_adjoint_dot_forced_pallas(self, monkeypatch):
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "1")
        monkeypatch.setenv("PYXU_TPU_NUFFT_PALLAS", "1")
        op, _, rng = self._plan(M=1200, N=(24, 28), seed=5)
        u = jnp.asarray(rng.standard_normal((op._M, 2)), jnp.float32)
        f = jnp.asarray(rng.standard_normal((24, 28, 2)), jnp.float32)
        d1 = float(jnp.vdot(op.apply(u), f))
        d2 = float(jnp.vdot(u, op.adjoint(f)))
        assert abs(d1 - d2) < 1e-4 * max(abs(d1), 1.0)

    def test_3d_spread_interp_match_xla(self, monkeypatch):
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "1")
        monkeypatch.setenv("PYXU_TPU_NUFFT_PALLAS", "1")
        import numpy as _np
        from pyxu_tpu.operator.linop import nufft as nf
        from pyxu_tpu.operator.linop.nufft import NUFFT
        rng = _np.random.default_rng(7)
        M, N = 2500, (14, 12, 10)
        x = rng.uniform(-_np.pi, _np.pi, (M, 3))
        op = NUFFT.type1(x, N, isign=+1, eps=1e-6)
        plan = op._mm3
        assert plan is not None and plan.pencil is not None
        c = (rng.standard_normal(M)
             + 1j * rng.standard_normal(M)).astype(_np.complex64)
        cc = jnp.asarray(c)
        g_xla = np.asarray(nf._spread_slab(cc, op._nf, plan))
        g_pl = np.asarray(nf._spread_slab_pallas(cc, op._nf, plan))
        assert np.max(np.abs(g_xla - g_pl)) < 1e-5 * np.max(np.abs(g_xla))
        g = jnp.asarray((rng.standard_normal(op._nf)
                         + 1j * rng.standard_normal(op._nf))
                        .astype(np.complex64))
        v_xla = np.asarray(nf._interp_slab(g, plan))
        v_pl = np.asarray(nf._interp_slab_pallas(g, plan))
        assert np.max(np.abs(v_xla - v_pl)) < 1e-5 * np.max(np.abs(v_xla))

    def test_pencil_only_plan(self, monkeypatch):
        # clustered along axis 0 only: slab partition refused (blowup > 4)
        # but the pencil partition is fine -> pencil-only plan; Pallas
        # routes through it, Pallas-off paths fall back to scatter
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "1")
        monkeypatch.setenv("PYXU_TPU_NUFFT_PALLAS", "1")
        import numpy as _np
        from pyxu_tpu.operator.linop import nufft as nf
        from pyxu_tpu.operator.linop.nufft import NUFFT, nudft1
        rng = _np.random.default_rng(11)
        M, N = 3000, (16, 32, 8)
        x = _np.stack([0.05 * rng.standard_normal(M) + 1.0,
                       rng.uniform(0, 2 * _np.pi, M),
                       rng.uniform(0, 2 * _np.pi, M)], axis=1)
        op = NUFFT.type1(x, N, isign=+1, eps=1e-6)
        plan = op._mm3
        assert plan is not None and plan.l0 is None
        assert plan.pencil is not None
        arr = rng.standard_normal((M, 2)).astype(_np.float32)
        out = np.asarray(op.apply(jnp.asarray(arr)))
        ref = nudft1(arr[:, 0] + 1j * arr[:, 1], x, N, +1)
        err = np.max(np.abs(out[..., 0] + 1j * out[..., 1] - ref))
        assert err < 2e-5 * np.max(np.abs(ref))
        # Pallas off -> scatter fallback, same answer
        monkeypatch.setenv("PYXU_TPU_NUFFT_PALLAS", "0")
        out2 = np.asarray(op.apply(jnp.asarray(arr)))
        err2 = np.max(np.abs(out2[..., 0] + 1j * out2[..., 1] - ref))
        assert err2 < 2e-5 * np.max(np.abs(ref))


class TestPencilRoutes:
    """Both pencil kernel routes (strip-resident and grouped v1) match the
    XLA slab path elementwise."""

    def _check(self, monkeypatch, strip: str):
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "1")
        monkeypatch.setenv("PYXU_TPU_NUFFT_PALLAS", "1")
        monkeypatch.setenv("PYXU_TPU_NUFFT_STRIP", strip)
        import numpy as _np
        from pyxu_tpu.operator.linop import nufft as nf
        from pyxu_tpu.operator.linop.nufft import NUFFT
        rng = _np.random.default_rng(3)
        M, N = 2500, (14, 12, 10)
        x = rng.uniform(-_np.pi, _np.pi, (M, 3))
        op = NUFFT.type1(x, N, isign=+1, eps=1e-6)
        pp = op._mm3.pencil
        assert pp is not None and pp.strip == (strip == "1")
        if strip == "0":
            assert pp.group > 1      # the grouped route must be exercised
        c = (rng.standard_normal(M)
             + 1j * rng.standard_normal(M)).astype(_np.complex64)
        cc = jnp.asarray(c)
        g_xla = np.asarray(nf._spread_slab(cc, op._nf, op._mm3))
        g_pl = np.asarray(nf._spread_slab_pallas(cc, op._nf, op._mm3))
        assert np.max(np.abs(g_xla - g_pl)) < 1e-5 * np.max(np.abs(g_xla))
        g = jnp.asarray((rng.standard_normal(op._nf)
                         + 1j * rng.standard_normal(op._nf))
                        .astype(np.complex64))
        v_xla = np.asarray(nf._interp_slab(g, op._mm3))
        v_pl = np.asarray(nf._interp_slab_pallas(g, op._mm3))
        assert np.max(np.abs(v_xla - v_pl)) < 1e-5 * np.max(np.abs(v_xla))

    def test_strip_route(self, monkeypatch):
        self._check(monkeypatch, "1")

    def test_grouped_route(self, monkeypatch):
        self._check(monkeypatch, "0")


class TestStrip2Routes:
    """2-D strip-resident pencil kernels (interpret mode on CPU) vs the XLA
    slab oracle and the direct NUDFT."""

    def _plan(self, M=4000, N=(56, 48), seed=0, t1=None, monkeypatch=None):
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "1")
        monkeypatch.setenv("PYXU_TPU_NUFFT_PALLAS", "1")
        if t1:
            monkeypatch.setenv("PYXU_TPU_NUFFT_STRIP2_T1", str(t1))
        rng = np.random.default_rng(seed)
        from pyxu_tpu.operator.linop.nufft import NUFFT
        x = rng.uniform(-np.pi, np.pi, (M, 2))
        op = NUFFT.type1(x, N, isign=+1, eps=1e-6)
        assert op._mm3 is not None and op._mm3.strip2 is not None
        # hybrid routing: the slab-transposed arrays coexist with strip2
        # (slab kernel spreads, strip2 kernel interpolates)
        assert op._mm3.l0T is not None
        return op, x, rng

    @pytest.mark.parametrize("t1", [None, 32])
    def test_spread_interp_match_xla_slab(self, monkeypatch, t1):
        from pyxu_tpu.operator.linop import nufft as nf
        op, _, rng = self._plan(t1=t1, monkeypatch=monkeypatch)
        plan = op._mm3
        c = (rng.standard_normal(op._M)
             + 1j * rng.standard_normal(op._M)).astype(np.complex64)
        cc = jnp.asarray(c)
        g_xla = np.asarray(nf._spread_slab(cc, op._nf, plan))
        g_pl = np.asarray(nf._spread_slab_pallas(cc, op._nf, plan))
        assert np.max(np.abs(g_xla - g_pl)) < 1e-5 * np.max(np.abs(g_xla))
        # forced strip2 spread kernel (non-default): same numerics
        monkeypatch.setenv("PYXU_TPU_NUFFT_STRIP2_SPREAD", "1")
        g_sp = np.asarray(nf._spread_slab_pallas(cc, op._nf, plan))
        monkeypatch.delenv("PYXU_TPU_NUFFT_STRIP2_SPREAD")
        assert np.max(np.abs(g_xla - g_sp)) < 1e-5 * np.max(np.abs(g_xla))
        g = jnp.asarray((rng.standard_normal(op._nf)
                         + 1j * rng.standard_normal(op._nf))
                        .astype(np.complex64))
        v_xla = np.asarray(nf._interp_slab(g, plan))
        v_pl = np.asarray(nf._interp_slab_pallas(g, plan))
        assert np.max(np.abs(v_xla - v_pl)) < 1e-5 * np.max(np.abs(v_xla))

    def test_e2e_strip2_vs_direct(self, monkeypatch):
        from pyxu_tpu.operator.linop.nufft import nudft1
        op, x, rng = self._plan(M=1500, N=(32, 40), seed=3,
                                monkeypatch=monkeypatch)
        arr = rng.standard_normal((op._M, 2)).astype(np.float32)
        out = np.asarray(op.apply(jnp.asarray(arr)))
        ref = nudft1(arr[:, 0] + 1j * arr[:, 1], x, (32, 40), +1)
        err = np.max(np.abs(out[..., 0] + 1j * out[..., 1] - ref))
        assert err < 2e-5 * np.max(np.abs(ref))
        # adjoint dot test through the strip2 interp route
        u = jnp.asarray(rng.standard_normal((op._M, 2)), jnp.float32)
        f = jnp.asarray(rng.standard_normal((32, 40, 2)), jnp.float32)
        d1 = float(jnp.vdot(op.apply(u), f))
        d2 = float(jnp.vdot(u, op.adjoint(f)))
        assert abs(d1 - d2) < 1e-4 * max(abs(d1), 1.0)

    def test_strip2_only_plan(self, monkeypatch):
        # clustered along axis 0: slab partition refused but the 2-axis
        # strip2 partition may also refuse or accept; force acceptance by
        # clustering mildly.  Pallas-off falls back to dense mm2.
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "1")
        monkeypatch.setenv("PYXU_TPU_NUFFT_PALLAS", "1")
        from pyxu_tpu.operator.linop.nufft import NUFFT, nudft1
        rng = np.random.default_rng(11)
        M, N = 3000, (24, 40)
        x = np.stack([0.35 * rng.standard_normal(M),
                      rng.uniform(-np.pi, np.pi, M)], axis=1)
        op = NUFFT.type1(x, N, isign=+1, eps=1e-6)
        arr = rng.standard_normal((M, 2)).astype(np.float32)
        out = np.asarray(op.apply(jnp.asarray(arr)))
        ref = nudft1(arr[:, 0] + 1j * arr[:, 1], x, N, +1)
        err = np.max(np.abs(out[..., 0] + 1j * out[..., 1] - ref))
        assert err < 2e-5 * np.max(np.abs(ref))
        # off-switch: dense/slab fallback, same answer
        monkeypatch.setenv("PYXU_TPU_NUFFT_PALLAS", "0")
        out2 = np.asarray(op.apply(jnp.asarray(arr)))
        err2 = np.max(np.abs(out2[..., 0] + 1j * out2[..., 1] - ref))
        assert err2 < 2e-5 * np.max(np.abs(ref))


class TestRaggedRoutes:
    """Ragged flat-chunk-list 2-D slab kernels (interpret mode on CPU):
    built when the classic padded slab partition AND the strip2 partition
    refuse (clustered / partially occupying point sets — e.g. type-3 fine
    grids), replacing the ~30x-more-FLOPs dense one-hot fallback."""

    def _op(self, monkeypatch, M=5000, N=(64, 56), seed=0):
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "1")
        monkeypatch.setenv("PYXU_TPU_NUFFT_PALLAS", "1")
        rng = np.random.default_rng(seed)
        from pyxu_tpu.operator.linop.nufft import NUFFT
        x = np.clip(rng.normal(0.3, 0.35, (M, 2)), -np.pi, np.pi)
        op = NUFFT.type1(x, N, isign=+1, eps=1e-6)
        assert op._mm3 is not None and op._mm3.ragged is not None
        assert op._mm3.l0 is None      # classic partition refused
        return op, x, rng

    def test_ragged_vs_direct_and_adjoint(self, monkeypatch):
        from pyxu_tpu.operator.linop.nufft import nudft1
        op, x, rng = self._op(monkeypatch)
        arr = rng.standard_normal((op._M, 2)).astype(np.float32)
        out = np.asarray(op.apply(jnp.asarray(arr)))
        ref = nudft1(arr[:, 0] + 1j * arr[:, 1], x, op._N, +1)
        err = np.max(np.abs(out[..., 0] + 1j * out[..., 1] - ref))
        assert err < 2e-5 * np.max(np.abs(ref))
        u = jnp.asarray(rng.standard_normal((op._M, 2)), jnp.float32)
        f = jnp.asarray(rng.standard_normal(op._N + (2,)), jnp.float32)
        d1 = float(jnp.vdot(op.apply(u), f))
        d2 = float(jnp.vdot(u, op.adjoint(f)))
        assert abs(d1 - d2) < 1e-4 * max(abs(d1), 1.0)

    def test_ragged_matches_dense_fallback(self, monkeypatch):
        op, _, rng = self._op(monkeypatch, seed=3)
        arr = jnp.asarray(rng.standard_normal((op._M, 2)), jnp.float32)
        out_ragged = np.asarray(op.apply(arr))
        monkeypatch.setenv("PYXU_TPU_NUFFT_PALLAS", "0")  # dense mm2 path
        out_dense = np.asarray(op.apply(arr))
        assert np.max(np.abs(out_ragged - out_dense)) \
            < 1e-5 * np.max(np.abs(out_dense))

    def test_ragged_plan_jit_roundtrip(self, monkeypatch):
        # _RaggedPlan2 rides jit as a pytree inside the operator state
        op, _, rng = self._op(monkeypatch, M=2000, N=(40, 40), seed=5)
        arr = jnp.asarray(rng.standard_normal((op._M, 2)), jnp.float32)
        eager = np.asarray(op.apply(arr))
        jitted = np.asarray(jax.jit(op.apply)(arr))
        assert np.max(np.abs(eager - jitted)) < 1e-5 * np.max(np.abs(eager))

    def test_ragged_off_switch(self, monkeypatch):
        monkeypatch.setenv("PYXU_TPU_NUFFT_RAGGED", "0")
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "1")
        monkeypatch.setenv("PYXU_TPU_NUFFT_PALLAS", "1")
        rng = np.random.default_rng(0)
        from pyxu_tpu.operator.linop.nufft import NUFFT, nudft1
        x = np.clip(rng.normal(0.3, 0.35, (3000, 2)), -np.pi, np.pi)
        op = NUFFT.type1(x, (48, 48), isign=+1, eps=1e-6)
        assert op._mm3 is None or op._mm3.ragged is None
        arr = rng.standard_normal((3000, 2)).astype(np.float32)
        out = np.asarray(op.apply(jnp.asarray(arr)))   # dense fallback
        ref = nudft1(arr[:, 0] + 1j * arr[:, 1], x, (48, 48), +1)
        err = np.max(np.abs(out[..., 0] + 1j * out[..., 1] - ref))
        assert err < 2e-5 * np.max(np.abs(ref))

    @pytest.mark.parametrize("route", ["rpencil", "rslab"])
    def test_ragged3_vs_direct_and_adjoint(self, monkeypatch, route):
        # tight 3-D Gaussian cluster: slab AND pencil partitions refuse;
        # the ragged PENCIL partition is preferred ((2w)^2 n3 MACs/point),
        # the ragged 3-D slab is the fallback before XLA scatter
        # (PYXU_TPU_NUFFT_RPENCIL=0)
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "1")
        monkeypatch.setenv("PYXU_TPU_NUFFT_PALLAS", "1")
        if route == "rslab":
            monkeypatch.setenv("PYXU_TPU_NUFFT_RPENCIL", "0")
        rng = np.random.default_rng(0)
        from pyxu_tpu.operator.linop.nufft import NUFFT, nudft1
        M, N = 4000, (20, 18, 16)
        x = np.clip(rng.normal(0.5, 0.12, (M, 3)), -np.pi, np.pi)
        op = NUFFT.type1(x, N, isign=+1, eps=1e-6)
        p = op._mm3
        assert p is not None and p.l0 is None and p.pencil is None
        if route == "rpencil":
            assert p.rpencil is not None and p.ragged is None
        else:
            assert p.rpencil is None
            assert p.ragged is not None and p.ragged.i2T is not None
        arr = rng.standard_normal((M, 2)).astype(np.float32)
        out = np.asarray(op.apply(jnp.asarray(arr)))
        ref = nudft1(arr[:, 0] + 1j * arr[:, 1], x, N, +1)
        err = np.max(np.abs(out[..., 0] + 1j * out[..., 1] - ref))
        assert err < 2e-5 * np.max(np.abs(ref))
        u = jnp.asarray(rng.standard_normal((M, 2)), jnp.float32)
        f = jnp.asarray(rng.standard_normal(N + (2,)), jnp.float32)
        d1 = float(jnp.vdot(op.apply(u), f))
        d2 = float(jnp.vdot(u, op.adjoint(f)))
        assert abs(d1 - d2) < 1e-4 * max(abs(d1), 1.0)

    def test_ragged3_matches_scatter_fallback(self, monkeypatch):
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "1")
        monkeypatch.setenv("PYXU_TPU_NUFFT_PALLAS", "1")
        rng = np.random.default_rng(4)
        from pyxu_tpu.operator.linop.nufft import NUFFT
        M, N = 2500, (16, 14, 12)
        x = np.clip(rng.normal(-0.4, 0.1, (M, 3)), -np.pi, np.pi)
        op = NUFFT.type1(x, N, isign=+1, eps=1e-6)
        assert op._mm3 is not None and (op._mm3.rpencil is not None
                                        or op._mm3.ragged is not None)
        arr = jnp.asarray(rng.standard_normal((M, 2)), jnp.float32)
        out_ragged = np.asarray(op.apply(arr))
        monkeypatch.setenv("PYXU_TPU_NUFFT_PALLAS", "0")  # scatter path
        out_scatter = np.asarray(op.apply(arr))
        assert np.max(np.abs(out_ragged - out_scatter)) \
            < 1e-5 * np.max(np.abs(out_scatter))


class TestSortPermute:
    """The constant-key-sort point permutation (PYXU_TPU_NUFFT_SORTPERM;
    7.5x over XLA gather on v5e) must be bit-consistent with the gather
    on every plan route."""

    @pytest.mark.parametrize("cloud", ["uniform", "clustered"])
    def test_matches_gather(self, monkeypatch, cloud):
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "1")
        monkeypatch.setenv("PYXU_TPU_NUFFT_PALLAS", "1")
        rng = np.random.default_rng(11)
        from pyxu_tpu.operator.linop.nufft import NUFFT
        M, N = 3000, (32, 36)
        if cloud == "uniform":
            x = rng.uniform(-np.pi, np.pi, (M, 2))
        else:
            x = np.clip(rng.normal(0.4, 0.15, (M, 2)), -np.pi, np.pi)
        arr = jnp.asarray(rng.standard_normal((M, 2)), jnp.float32)
        g = jnp.asarray(rng.standard_normal(N + (2,)), jnp.float32)
        monkeypatch.setenv("PYXU_TPU_NUFFT_SORTPERM", "1")
        op = NUFFT.type1(x, N, isign=+1, eps=1e-6)
        out_sort = np.asarray(op.apply(arr))
        adj_sort = np.asarray(op.adjoint(g))
        monkeypatch.setenv("PYXU_TPU_NUFFT_SORTPERM", "0")
        op2 = NUFFT.type1(x, N, isign=+1, eps=1e-6)
        out_g = np.asarray(op2.apply(arr))
        adj_g = np.asarray(op2.adjoint(g))
        assert np.max(np.abs(out_sort - out_g)) < 1e-5 * np.abs(out_g).max()
        assert np.max(np.abs(adj_sort - adj_g)) < 1e-5 * np.abs(adj_g).max()

    @pytest.mark.parametrize("padded", [True, False])
    def test_helpers_direct(self, monkeypatch, padded):
        """_perm_pts/_unperm_pts vs the gather definitions on hand-built
        perms, including the pad-free case (perfectly balanced partition:
        no dummy slots at all)."""
        monkeypatch.setenv("PYXU_TPU_NUFFT_SORTPERM", "1")
        from pyxu_tpu.operator.linop.nufft import (_pad_pt, _perm_pts,
                                                   _unperm_pts)
        rng = np.random.default_rng(3)
        M = 96
        if padded:
            S, CH = 5, 24               # 120 slots: 24 dummy pads (id M)
            flat = np.full(S * CH, M, np.int64)
            flat[:M] = rng.permutation(M)
            rng.shuffle(flat)
        else:
            S, CH = 4, 24               # 96 slots: every slot a real point
            flat = rng.permutation(M).astype(np.int64)
        perm = jnp.asarray(flat.reshape(S, CH))
        invperm = jnp.asarray(np.array(
            [int(np.flatnonzero(flat == j)[0]) for j in range(M)], np.int32))
        c = jnp.asarray(rng.standard_normal(M) + 1j * rng.standard_normal(M),
                        jnp.complex64)
        want = np.asarray(_pad_pt(c)[perm])
        got = np.asarray(_perm_pts(c, perm))
        assert np.array_equal(got, want)
        v = jnp.asarray(rng.standard_normal(S * CH).astype(np.float32))
        want2 = np.asarray(v)[np.asarray(invperm)]
        got2 = np.asarray(_unperm_pts(v, perm, invperm))
        assert np.array_equal(got2, want2)
