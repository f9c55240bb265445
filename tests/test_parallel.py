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
