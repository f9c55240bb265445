"""Parallel/sharding tests on the virtual 8-device CPU mesh (SURVEY §4:
multi-device-on-CPU fills the reference's Dask-threaded testing role)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyxu_tpu.operator.func import L1Norm, SquaredL2Norm
from pyxu_tpu.operator.linop import ExplicitLinOp, Gradient, Stencil
from pyxu_tpu.parallel import (
    ConsensusADMM,
    P,
    ShardedStencil,
    auto_mesh,
    shard,
    sharded_block_diag,
    with_sharding,
)
from pyxu_tpu.opt.stop import MaxIter, RelError

rng0 = np.random.default_rng(71)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)


def test_auto_mesh():
    m = auto_mesh()
    assert m.devices.size == 8
    m2 = auto_mesh(2, 4, axis_names=("dp", "sp"))
    assert m2.shape == {"dp": 2, "sp": 4}


@pytest.mark.parametrize("mode", ["constant", "wrap"])
def test_sharded_stencil_matches_dense(mode):
    mesh = auto_mesh()
    k = jnp.asarray([1.0, -2.0, 0.5])
    ref = Stencil((32, 8), k.reshape(3, 1), (1, 0), mode=mode)
    op = ShardedStencil((32, 8), k.reshape(3, 1), (1, 0), mesh, shard_axis=0,
                        mode=mode)
    x = jnp.asarray(rng0.standard_normal((32, 8)), jnp.float32)
    xs = shard(x, mesh, P("s", None))
    got = op.apply(xs)
    want = ref.apply(x)
    assert np.allclose(got, want, atol=1e-5)
    # adjoint matches too
    y = jnp.asarray(rng0.standard_normal((32, 8)), jnp.float32)
    assert np.allclose(op.adjoint(shard(y, mesh, P("s", None))),
                       ref.adjoint(y), atol=1e-5)


def test_sharded_stencil_2d_kernel():
    mesh = auto_mesh()
    k = jnp.asarray([[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]])
    ref = Stencil((16, 12), k, (1, 1), mode="constant")
    op = ShardedStencil((16, 12), k, (1, 1), mesh, shard_axis=0, mode="constant")
    x = jnp.asarray(rng0.standard_normal((16, 12)), jnp.float32)
    assert np.allclose(op.apply(shard(x, mesh, P("s", None))), ref.apply(x),
                       atol=1e-5)


def test_with_sharding_gspmd():
    mesh = auto_mesh()
    D = Gradient((32, 16), mode="symmetric")
    Ds = with_sharding(D, mesh, in_spec=("s", None), out_spec=(None, "s", None))
    x = jnp.asarray(rng0.standard_normal((32, 16)), jnp.float32)
    out = jax.jit(Ds.apply)(x)
    assert np.allclose(out, D.apply(x), atol=1e-5)


def test_sharded_block_diag():
    mesh = auto_mesh()
    ops = [ExplicitLinOp(jnp.asarray(rng0.standard_normal((4, 4)), jnp.float32))
           for _ in range(8)]
    op = sharded_block_diag(ops, mesh)
    x = jnp.asarray(rng0.standard_normal((8, 4)), jnp.float32)
    got = jax.jit(op.apply)(x)
    for i in range(8):
        want = np.asarray(ops[i].asarray()) @ np.asarray(x)[i]
        assert np.allclose(got[i], want, atol=1e-4)


def test_consensus_admm_mean_problem():
    """With f_b = ||x - y_b||^2 and no g, consensus yields the global mean."""
    mesh = auto_mesh()
    ys = [jnp.asarray(rng0.standard_normal(6), jnp.float32) for _ in range(8)]
    fs = [SquaredL2Norm((6,)).asloss(y) for y in ys]
    slv = ConsensusADMM(fs, mesh=mesh)
    slv.fit(z0=jnp.zeros(6, jnp.float32),
            stop_crit=RelError(eps=1e-7, var="z") | MaxIter(500), max_iter=500)
    want = np.mean([np.asarray(y) for y in ys], axis=0)
    assert np.allclose(slv.solution(), want, atol=1e-3)


def test_consensus_admm_with_g():
    """Consensus LASSO: mean-squared losses + L1 -> soft-thresholded mean."""
    mesh = auto_mesh()
    rng = np.random.default_rng(123)
    ys = [jnp.asarray(rng.standard_normal(6) + 1.0, jnp.float32)
          for _ in range(8)]
    fs = [SquaredL2Norm((6,)).asloss(y) for y in ys]
    lam = 0.5
    g = (8 * lam) * L1Norm((6,))
    slv = ConsensusADMM(fs, g=g, mesh=mesh)
    slv.fit(z0=jnp.zeros(6, jnp.float32),
            stop_crit=RelError(eps=1e-8, var="z") | MaxIter(2000), max_iter=2000)
    ybar = np.mean([np.asarray(y) for y in ys], axis=0)
    # min sum_b ||x-y_b||^2 + 8 lam ||x||_1  ==  min 8(||x-ybar||^2) + 8 lam |x|
    want = np.sign(ybar) * np.maximum(np.abs(ybar) - lam / 2, 0)
    assert np.allclose(slv.solution(), want, atol=1e-3)


class TestShardedNUFFT:
    """Point-sharded type-1/2 NUFFT over the virtual mesh (SURVEY §2.4:
    sharded NUFFT blocks with psum reductions; reference chunked type-3
    nufft.py:2027-2213 is the dask analog)."""

    def _setup(self, M=300, N=(12, 10)):
        from pyxu_tpu.operator.linop.nufft import NUFFT
        from pyxu_tpu.parallel import auto_mesh
        from pyxu_tpu.parallel.nufft import ShardedNUFFT
        rng = np.random.default_rng(5)
        x = rng.uniform(-np.pi, np.pi, (M, len(N)))
        mesh = auto_mesh()
        sh = ShardedNUFFT(x, N, mesh)
        ref = NUFFT.type1(x, N)
        return sh, ref, rng

    def test_matches_single_device(self):
        sh, ref, rng = self._setup()
        a = jnp.asarray(rng.standard_normal((300, 2)), jnp.float32)
        out_sh = np.asarray(sh.apply(a))
        out_ref = np.asarray(ref.apply(a))
        np.testing.assert_allclose(out_sh, out_ref, atol=1e-4)

    def test_adjoint_matches_and_dot_test(self):
        sh, ref, rng = self._setup()
        f = jnp.asarray(rng.standard_normal(sh.codim_shape), jnp.float32)
        a_sh = np.asarray(sh.adjoint(f))
        a_ref = np.asarray(ref.adjoint(f))
        np.testing.assert_allclose(a_sh, a_ref, atol=1e-4)
        u = jnp.asarray(rng.standard_normal(sh.dim_shape), jnp.float32)
        d1 = float(jnp.vdot(sh.apply(u), f))
        d2 = float(jnp.vdot(u, sh.adjoint(f)))
        assert abs(d1 - d2) < 1e-2 * max(abs(d1), 1.0)

    def test_point_count_not_divisible(self):
        # M=301 not divisible by 8 devices: internal padding must be exact
        sh, ref, rng = self._setup(M=301)
        a = jnp.asarray(rng.standard_normal((301, 2)), jnp.float32)
        np.testing.assert_allclose(np.asarray(sh.apply(a)),
                                   np.asarray(ref.apply(a)), atol=1e-4)

    def test_batched(self):
        sh, ref, rng = self._setup()
        a = jnp.asarray(rng.standard_normal((3, 300, 2)), jnp.float32)
        np.testing.assert_allclose(np.asarray(sh.apply(a)),
                                   np.asarray(ref.apply(a)), atol=1e-4)

    def test_inside_jitted_solver_step(self):
        # ride as jit argument through a solve (operators are pytrees)
        from pyxu_tpu.operator.func import SquaredL2Norm, L1Norm
        from pyxu_tpu.opt.solver import PGD
        from pyxu_tpu.opt.stop import MaxIter
        sh, _, rng = self._setup(M=160, N=(8, 8))
        yv = sh.apply(jnp.asarray(rng.standard_normal((160, 2)), jnp.float32))
        # solve min ||A c - yv||^2 + lam |c|_1 with A = sh
        f = 0.5 * SquaredL2Norm(sh.codim_shape).asloss(yv) * sh
        g = 0.01 * L1Norm(sh.dim_shape)
        slv = PGD(f=f, g=g)
        slv.fit(x0=jnp.zeros(sh.dim_shape), stop_crit=MaxIter(10),
                max_iter=10, tau=1.0 / (sh.lipschitz ** 2))
        assert np.isfinite(np.asarray(slv.solution())).all()


from conformance import ConformanceSuite
import pytest as _pytest


class TestShardedNUFFTConformance(ConformanceSuite):
    """Full property-driven conformance on the mesh-sharded operator
    (SURVEY §4: same harness, sharded leg)."""

    @_pytest.fixture
    def op(self):
        from pyxu_tpu.parallel import auto_mesh
        from pyxu_tpu.parallel.nufft import ShardedNUFFT
        rng = np.random.default_rng(7)
        return ShardedNUFFT(rng.uniform(-np.pi, np.pi, (24, 2)), (6, 8),
                            auto_mesh())


class TestShardedNUFFT3:
    """Mesh-parallel domain-partitioned type-3 (reference `_NUFFT3_chunked`
    dask block loop, nufft.py:2027-2213, rebuilt as one shard_map program:
    scan over z-blocks + psum over the x-block axis)."""

    def _setup(self, M=160, K=140, d=2, eps=1e-6, off=(0.0, 0.0, 0.0), **kw):
        from pyxu_tpu.parallel import auto_mesh
        from pyxu_tpu.parallel.nufft import ShardedNUFFT3
        rng = np.random.default_rng(11)
        x = rng.uniform(-1.5, 1.5, (M, d)) + np.asarray(off)[:d]
        z = rng.uniform(-20, 20, (K, d))
        op = ShardedNUFFT3(x, z, auto_mesh(), eps=eps, **kw)
        return op, x, z, rng

    @pytest.mark.parametrize("d", [1, 2, 3])
    def test_matches_direct(self, d):
        from pyxu_tpu.operator.linop.nufft import nudft3
        op, x, z, rng = self._setup(d=d)
        c = rng.standard_normal(160) + 1j * rng.standard_normal(160)
        a = jnp.asarray(np.stack([c.real, c.imag], axis=-1), jnp.float32)
        got = np.asarray(op.apply(a))
        want = nudft3(c, x, z)
        want = np.stack([want.real, want.imag], axis=-1)
        np.testing.assert_allclose(got, want, atol=2e-4 * np.abs(want).max())

    def test_multi_z_blocks_and_offcenter(self):
        # small budget forces Q>1; off-center cloud exercises the centering
        from pyxu_tpu.operator.linop.nufft import nudft3
        op, x, z, rng = self._setup(off=(30.0, -12.0), fft_mem_mb=1e-3)
        assert op.stats()["n_z_blocks"] > 1
        c = rng.standard_normal(160) + 1j * rng.standard_normal(160)
        a = jnp.asarray(np.stack([c.real, c.imag], axis=-1), jnp.float32)
        want = nudft3(c, x, z)
        want = np.stack([want.real, want.imag], axis=-1)
        np.testing.assert_allclose(np.asarray(op.apply(a)), want,
                                   atol=2e-4 * np.abs(want).max())

    def test_adjoint_dot_test(self):
        op, x, z, rng = self._setup()
        u = jnp.asarray(rng.standard_normal(op.dim_shape), jnp.float32)
        f = jnp.asarray(rng.standard_normal(op.codim_shape), jnp.float32)
        d1 = float(jnp.vdot(op.apply(u), f))
        d2 = float(jnp.vdot(u, op.adjoint(f)))
        assert abs(d1 - d2) < 1e-3 * max(abs(d1), abs(d2), 1.0)

    def test_adjoint_matches_single_chip(self):
        from pyxu_tpu.operator.linop.nufft import NUFFT
        op, x, z, rng = self._setup()
        ref = NUFFT.type3(jnp.asarray(x), jnp.asarray(z), eps=1e-6)
        f = jnp.asarray(rng.standard_normal(op.codim_shape), jnp.float32)
        got = np.asarray(op.adjoint(f))
        want = np.asarray(ref.adjoint(f))
        np.testing.assert_allclose(got, want, atol=2e-4 * np.abs(want).max())

    def test_batched_and_jitted(self):
        op, x, z, rng = self._setup(M=96, K=80)
        a = jnp.asarray(rng.standard_normal((3, 96, 2)), jnp.float32)
        out = np.asarray(op.apply(a))
        for b in range(3):
            np.testing.assert_allclose(
                out[b], np.asarray(op.apply(a[b])), atol=1e-5)
        fn = jax.jit(lambda o, v: o.apply(v))
        np.testing.assert_allclose(np.asarray(fn(op, a[0])),
                                   np.asarray(op.apply(a[0])), atol=1e-5)


class TestShardedNUFFT3Conformance(ConformanceSuite):
    """Full property-driven conformance on the mesh-parallel type-3
    (SURVEY §4: same harness, sharded leg)."""

    @_pytest.fixture
    def op(self):
        from pyxu_tpu.parallel import auto_mesh
        from pyxu_tpu.parallel.nufft import ShardedNUFFT3
        rng = np.random.default_rng(9)
        return ShardedNUFFT3(rng.uniform(-1.0, 1.0, (24, 2)),
                             rng.uniform(-9.0, 9.0, (20, 2)),
                             auto_mesh(), max_z_blocks=2, fft_mem_mb=1e-3)


class TestShardedNUFFT3Edges:
    """Constructor robustness (review findings): block counts exceeding the
    point counts must pad with empty blocks, and the z-block cap is exact."""

    def _direct_check(self, op, x, z, rng, M):
        from pyxu_tpu.operator.linop.nufft import nudft3
        c = rng.standard_normal(M) + 1j * rng.standard_normal(M)
        a = jnp.asarray(np.stack([c.real, c.imag], axis=-1), jnp.float32)
        want = nudft3(c, x, z)
        want = np.stack([want.real, want.imag], axis=-1)
        np.testing.assert_allclose(np.asarray(op.apply(a)), want,
                                   atol=2e-4 * max(np.abs(want).max(), 1.0))

    def test_fewer_x_points_than_devices(self):
        from pyxu_tpu.parallel import auto_mesh
        from pyxu_tpu.parallel.nufft import ShardedNUFFT3
        rng = np.random.default_rng(21)
        x = rng.uniform(-1, 1, (4, 2))          # M=4 < 8 devices
        z = rng.uniform(-9, 9, (30, 2))
        op = ShardedNUFFT3(x, z, auto_mesh())
        self._direct_check(op, x, z, rng, 4)

    def test_tiny_z_count_budget_overshoot(self):
        # K=5 with an unreachable budget: Q must clamp to K, not crash
        from pyxu_tpu.parallel import auto_mesh
        from pyxu_tpu.parallel.nufft import ShardedNUFFT3
        rng = np.random.default_rng(22)
        x = rng.uniform(-1, 1, (40, 2))
        z = rng.uniform(-9, 9, (5, 2))
        op = ShardedNUFFT3(x, z, auto_mesh(), fft_mem_mb=1e-9)
        assert op.stats()["n_z_blocks"] <= 5
        self._direct_check(op, x, z, rng, 40)

    def test_non_power_of_two_z_cap_is_exact(self):
        from pyxu_tpu.parallel import auto_mesh
        from pyxu_tpu.parallel.nufft import ShardedNUFFT3
        rng = np.random.default_rng(23)
        x = rng.uniform(-1, 1, (40, 2))
        z = rng.uniform(-30, 30, (64, 2))
        op = ShardedNUFFT3(x, z, auto_mesh(), fft_mem_mb=1e-9, max_z_blocks=6)
        assert op.stats()["n_z_blocks"] <= 6
        self._direct_check(op, x, z, rng, 40)


class TestShardedMMPath:
    """Force the MXU (one-hot matmul) kernels inside shard_map — the path a
    REAL TPU mesh takes (CPU default is scatter, so without forcing, the
    multi-chip MM route had zero coverage; scan-vma carries regressed once)."""

    def test_sharded_t12_mm(self, monkeypatch):
        from pyxu_tpu.operator.linop.nufft import NUFFT
        from pyxu_tpu.parallel.nufft import ShardedNUFFT
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "1")
        rng = np.random.default_rng(31)
        x = rng.uniform(-np.pi, np.pi, (300, 2))
        sh = ShardedNUFFT(x, (12, 10), auto_mesh())
        ref = NUFFT.type1(x, (12, 10))
        a = jnp.asarray(rng.standard_normal((300, 2)), jnp.float32)
        np.testing.assert_allclose(np.asarray(sh.apply(a)),
                                   np.asarray(ref.apply(a)), atol=1e-4)
        f = jnp.asarray(rng.standard_normal(sh.codim_shape), jnp.float32)
        np.testing.assert_allclose(np.asarray(sh.adjoint(f)),
                                   np.asarray(ref.adjoint(f)), atol=1e-4)

    def test_sharded_t3_mm(self, monkeypatch):
        from pyxu_tpu.operator.linop.nufft import nudft3
        from pyxu_tpu.parallel.nufft import ShardedNUFFT3
        monkeypatch.setenv("PYXU_TPU_NUFFT_MM", "1")
        rng = np.random.default_rng(32)
        x = rng.uniform(-1.5, 1.5, (160, 2))
        z = rng.uniform(-9, 9, (140, 2))
        op = ShardedNUFFT3(x, z, auto_mesh(), eps=1e-6, fft_mem_mb=1e-3)
        c = rng.standard_normal(160) + 1j * rng.standard_normal(160)
        a = jnp.asarray(np.stack([c.real, c.imag], -1), jnp.float32)
        want = nudft3(c, x, z)
        wr = np.stack([want.real, want.imag], -1)
        np.testing.assert_allclose(np.asarray(op.apply(a)), wr,
                                   atol=2e-4 * np.abs(wr).max())


class TestParallelReviewFixes:
    """Regression tests for the parallel-layer review findings."""

    def test_sharded_block_diag_rank_reducing_and_functional(self):
        from pyxu_tpu.operator.linop import Sum
        ops = [Sum((4, 3), axis=-1) for _ in range(8)]
        op = sharded_block_diag(ops, auto_mesh())
        x = jnp.asarray(rng0.standard_normal((8, 4, 3)), jnp.float32)
        got = np.asarray(jax.jit(op.apply)(x))
        want = np.asarray(x).sum(-1)
        np.testing.assert_allclose(got, want, atol=1e-5)
        fs = [SquaredL2Norm((4,)) for _ in range(8)]
        fop = sharded_block_diag(fs, auto_mesh())
        xf = jnp.asarray(rng0.standard_normal((8, 4)), jnp.float32)
        got_f = float(jax.jit(fop.apply)(xf))
        np.testing.assert_allclose(got_f, float((np.asarray(xf) ** 2).sum()),
                                   rtol=1e-5)

    def test_with_sharding_preserves_properties(self):
        from pyxu_tpu.abc.operator import Property
        mesh = auto_mesh()
        w = with_sharding(SquaredL2Norm((8,)), mesh, in_spec=("s",))
        assert not w.has(Property.LINEAR)
        assert w.has(Property.PROXIMABLE)
        assert w.has(Property.DIFFERENTIABLE)
        x = jnp.asarray(rng0.standard_normal(8), jnp.float32)
        np.testing.assert_allclose(np.asarray(jax.jit(w.grad)(x)),
                                   2 * np.asarray(x), atol=1e-5)
        p = np.asarray(jax.jit(lambda v: w.prox(v, 0.5))(x))
        np.testing.assert_allclose(p, np.asarray(x) / 2.0, atol=1e-5)

    def test_halo_exchange_rejects_unknown_mode(self):
        from pyxu_tpu.parallel import halo_exchange
        with pytest.raises(AssertionError, match="constant"):
            jax.shard_map(
                lambda x: halo_exchange(x, 1, 1, 0, "s", mode="reflect"),
                mesh=auto_mesh(), in_specs=P("s"), out_specs=P("s"),
            )(jnp.ones(16))

    def test_consensus_validates_block_count(self):
        fs = [SquaredL2Norm((4,)).asloss(jnp.ones(4)) for _ in range(6)]
        with pytest.raises(ValueError, match="divisible"):
            ConsensusADMM(fs, mesh=auto_mesh())
        with pytest.raises(ValueError, match="non-empty"):
            ConsensusADMM([], mesh=None)

    def test_auto_mesh_keeps_explicit_axis_name(self):
        m = auto_mesh(8, axis_names=("ax0",))
        assert m.axis_names == ("ax0",)


def test_init_distributed_idempotent():
    """Multi-host bring-up wrapper (SURVEY §2.4): single-process init works
    and a second call is a no-op.  Runs in a subprocess — distributed init
    must precede XLA backend init, which this pytest session already did."""
    import subprocess
    import sys
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from pyxu_tpu.parallel import init_distributed\n"
        "n = init_distributed(coordinator_address='localhost:12397',"
        " num_processes=1, process_id=0)\n"
        "assert n == len(jax.devices()), n\n"
        "assert init_distributed() == n\n"
        "print('OK')\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=120)
    assert out.returncode == 0 and "OK" in out.stdout, out.stderr
