"""Scale-out imaging over a device mesh: the three distribution patterns
(SURVEY §2.4) in one script — the TPU replacement for the reference's Dask
story (chunked arrays, map_overlap halos, dask-delayed NUFFT blocks).

1. halo-exchange TV deconvolution: image rows sharded over the mesh,
   `ShardedStencil` exchanges kernel-radius halos with `ppermute`
   (reference: Stencil-on-Dask `map_overlap`, stencil/stencil.py:578-607);
2. consensus-ADMM: per-device losses, one `psum` mean per step
   (reference: distributed solves via dask.delayed block evaluation);
3. mesh-parallel type-3 NUFFT: domain-partitioned blocks, one SPMD
   program (reference: `_NUFFT3_chunked` dask block loop,
   nufft.py:2027-2213).

Run on any host (8 virtual devices):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/distributed.py
On a real TPU slice, drop the env vars — the same code rides ICI.
"""

import numpy as np
import jax
import jax.numpy as jnp


def tv_deconvolution_halo(mesh, n=256, lam=0.005):
    """Rows sharded over the mesh; the blur stencil halo-exchanges."""
    from pyxu_tpu.operator import Gradient, L21Norm, SquaredL2Norm
    from pyxu_tpu.parallel import P, ShardedStencil, shard
    from pyxu_tpu.opt.solver import CondatVu
    from pyxu_tpu.opt.stop import MaxIter
    from pyxu_tpu.utils.misc import peaks

    g = np.linspace(-2.5, 2.5, n)
    xx, yy = np.meshgrid(g, g, indexing="ij")
    x_true = jnp.asarray(np.asarray(peaks(jnp.asarray(xx), jnp.asarray(yy))),
                         jnp.float32)
    k = np.exp(-0.5 * ((np.arange(9) - 4) / 2.0) ** 2)
    k1 = jnp.asarray((k / k.sum()).astype(np.float32))
    K = ShardedStencil((n, n), [k1, k1], [4, 4], mesh, shard_axis=0,
                       mode="constant")
    y = K.apply(shard(x_true, mesh, P("s", None)))

    f = 0.5 * SquaredL2Norm((n, n)).asloss(y) * K
    D = Gradient((n, n), mode="symmetric")
    h = lam * L21Norm((2, n, n), l2_axis=0)
    slv = CondatVu(f=f, g=None, h=h, K=D)
    slv.fit(x0=jnp.zeros((n, n), jnp.float32), stop_crit=MaxIter(100),
            max_iter=100)
    rel = float(jnp.linalg.norm(slv.solution() - x_true)
                / jnp.linalg.norm(x_true))
    print(f"[halo TV]        rel. reconstruction error after 100 it: {rel:.3f}")


def consensus_lasso(mesh, n=64):
    """Each device owns a measurement block; consensus-ADMM agrees on x."""
    from pyxu_tpu.operator.func import L1Norm, SquaredL2Norm
    from pyxu_tpu.parallel import ConsensusADMM
    from pyxu_tpu.opt.stop import MaxIter, RelError

    n_dev = mesh.devices.size
    rng = np.random.default_rng(3)
    ys = [jnp.asarray(rng.standard_normal(n) + 1.0, jnp.float32)
          for _ in range(n_dev)]
    fs = [SquaredL2Norm((n,)).asloss(y) for y in ys]
    lam = 0.4
    slv = ConsensusADMM(fs, g=(n_dev * lam) * L1Norm((n,)), mesh=mesh)
    slv.fit(z0=jnp.zeros(n, jnp.float32),
            stop_crit=RelError(eps=1e-7, var="z") | MaxIter(1500),
            max_iter=1500)
    ybar = np.mean([np.asarray(y) for y in ys], axis=0)
    want = np.sign(ybar) * np.maximum(np.abs(ybar) - lam / 2, 0)
    err = float(np.abs(np.asarray(slv.solution()) - want).max())
    print(f"[consensus]      max |x - closed_form|: {err:.2e}")


def sharded_type3_nufft(mesh, M=4000, K=3000):
    """Blocks of a chunked type-3 NUFFT as one SPMD program."""
    from pyxu_tpu.operator.linop.nufft import nudft3
    from pyxu_tpu.parallel import ShardedNUFFT3

    rng = np.random.default_rng(5)
    x = rng.uniform(-1.0, 1.0, (M, 2)) + np.array([12.0, -7.0])  # off-center
    z = rng.uniform(-25.0, 25.0, (K, 2))
    op = ShardedNUFFT3(x, z, mesh, eps=1e-6, fft_mem_mb=0.05)
    c = rng.standard_normal(M) + 1j * rng.standard_normal(M)
    a = jnp.asarray(np.stack([c.real, c.imag], -1).astype(np.float32))
    got = np.asarray(op.apply(a))
    # verify against the O(MK) direct sum on a 500-source slice
    want = nudft3(c[:500], x[:500], z)
    ws = np.stack([want.real, want.imag], -1)
    got_slice = np.asarray(op.apply(a.at[500:].set(0.0)))
    rel = np.abs(got_slice - ws).max() / np.abs(ws).max()
    print(f"[sharded NUFFT3] {op.stats()}  rel err vs direct: {rel:.1e}")
    assert np.isfinite(got).all()


def main():
    from pyxu_tpu.parallel import auto_mesh
    mesh = auto_mesh()  # all visible devices on one axis "s"
    print(f"mesh: {dict(mesh.shape)} over {mesh.devices.size} devices")
    tv_deconvolution_halo(mesh)
    consensus_lasso(mesh)
    sharded_type3_nufft(mesh)


if __name__ == "__main__":
    main()
