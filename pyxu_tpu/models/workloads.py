"""The five benchmark workloads (BASELINE.md) as one-call factories."""

from __future__ import annotations

import math as _math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "lasso_deconvolution",
    "tv_deconvolution",
    "sparse_view_ct",
    "radio_interferometry",
    "consensus_tiles",
]


def _gauss1d(sigma, n):
    x = np.arange(n) - (n - 1) / 2
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur_op(shape, sigma=2.0, ksize=9, mode="symmetric"):
    from pyxu_tpu.operator.linop import Stencil
    k1 = jnp.asarray(_gauss1d(sigma, ksize))
    c = (ksize - 1) // 2
    return Stencil(shape, [k1, k1], [c, c], mode=mode)


def lasso_deconvolution(shape=(256, 256), lam=0.05, seed=0):
    """Workload 1: Gaussian-blur LinOp + L1 prox, FISTA."""
    from pyxu_tpu.operator.func import L1Norm, SquaredL2Norm
    from pyxu_tpu.opt.solver import PGD

    rng = np.random.default_rng(seed)
    x_true = (rng.random(shape) < 0.01).astype(np.float32)
    K = _blur_op(shape)
    y = K.apply(jnp.asarray(x_true))
    f = 0.5 * SquaredL2Norm(shape).asloss(y) * K
    g = lam * L1Norm(shape)
    slv = PGD(f=f, g=g)
    return slv, dict(x0=jnp.zeros(shape)), dict(x_true=x_true, y=y, K=K)


def tv_deconvolution(shape=(2160, 3840), lam=0.01, seed=0):
    """Workload 2 (north star): TV-regularized deconvolution, Condat-Vu."""
    from pyxu_tpu.operator.func import L21Norm, SquaredL2Norm
    from pyxu_tpu.operator.linop import Gradient
    from pyxu_tpu.opt.solver import CondatVu

    rng = np.random.default_rng(seed)
    x_true = rng.random(shape, dtype=np.float32)
    K = _blur_op(shape)
    y = K.apply(jnp.asarray(x_true))
    f = 0.5 * SquaredL2Norm(shape).asloss(y) * K
    D = Gradient(shape, mode="symmetric")
    h = lam * L21Norm((2,) + tuple(shape), l2_axis=0)
    slv = CondatVu(f=f, h=h, K=D)
    return slv, dict(x0=y), dict(x_true=x_true, y=y, K=K, D=D)


def sparse_view_ct(shape=(128, 128), n_angles=30, lam=0.05, seed=0,
                   method: str = "interp"):
    """Workload 3: sparse-view CT — Radon LinOp + PD3O with positivity + TV.

    ``method="interp"``: quadrature :class:`RadonTransform` (gather program —
    exact, but TPU gathers are slow at scale).  ``method="fourier"``:
    :class:`FourierRadon` on the NUFFT MXU fast path (preferred on TPU).
    """
    from pyxu_tpu.operator.func import L21Norm, PositiveOrthant, SquaredL2Norm
    from pyxu_tpu.operator.linop import Gradient
    from pyxu_tpu.operator.linop.xray import FourierRadon, RadonTransform
    from pyxu_tpu.opt.solver import PD3O
    from pyxu_tpu.utils.misc import peaks

    H, W = shape
    yy, xx = np.meshgrid(np.linspace(-2.5, 2.5, H), np.linspace(-2.5, 2.5, W),
                         indexing="ij")
    x_true = np.maximum(np.asarray(peaks(jnp.asarray(xx), jnp.asarray(yy))), 0)
    x_true = (x_true / x_true.max()).astype(np.float32)
    angles = np.linspace(0, np.pi, n_angles, endpoint=False)
    A = (FourierRadon if method == "fourier" else RadonTransform)(shape, angles)
    # the analytic bound is ~60x loose for Radon; PD3O steps scale with 1/L^2
    # so a tight power-iteration estimate pays for itself immediately
    A.estimate_lipschitz(maxiter=32)
    # jit the data-gen apply: FourierRadon's pipeline is complex-valued and
    # eager complex ops are UNIMPLEMENTED on some TPU runtimes (axon)
    y = jax.jit(A.apply)(jnp.asarray(x_true))
    f = 0.5 * SquaredL2Norm(A.codim_shape).asloss(y) * A
    g = PositiveOrthant(shape)
    D = Gradient(shape, mode="symmetric")
    h = lam * L21Norm((2,) + tuple(shape), l2_axis=0)
    slv = PD3O(f=f, g=g, h=h, K=D)
    return slv, dict(x0=jnp.zeros(shape)), dict(x_true=x_true, y=y, A=A)


def radio_interferometry(shape=(256, 256), n_vis=5000, lam=0.02, seed=0,
                         real_sky: bool = True):
    """Workload 4: NUFFT forward model + ADMM (CLEAN-style sparsity).

    ``real_sky=True`` (default) models the physically real sky-brightness
    image: real-input type-2 NUFFT (``NUFFT.type2(..., real=True)``), real
    L1 sparsity, and a real Toeplitz gram whose apply runs on the rfft fast
    path — the ADMM x-update CG then moves half the data per iteration.
    ``real_sky=False`` keeps the complex-image formulation (iterates are
    (..., 2) real views)."""
    from pyxu_tpu.operator.func import L1Norm, SquaredL2Norm
    from pyxu_tpu.operator.linop.nufft import NUFFT
    from pyxu_tpu.opt.solver import ADMM

    rng = np.random.default_rng(seed)
    x_true = np.zeros(shape, np.float32)
    rows = rng.integers(0, shape[0], 30)
    cols = rng.integers(0, shape[1], 30)
    x_true[rows, cols] = rng.random(30).astype(np.float32)
    # uv coverage: Gaussian-ish radial density
    uv = rng.normal(0, np.pi / 3, (n_vis, 2)).clip(-np.pi, np.pi)
    A = NUFFT.type2(uv.astype(np.float32), shape, eps=1e-6, real=real_sky)
    A.estimate_lipschitz(maxiter=32)
    # real view built host-side + jitted apply (eager complex is
    # UNIMPLEMENTED on some TPU runtimes)
    if real_sky:
        y = jax.jit(A.apply)(jnp.asarray(x_true))
        dom = tuple(shape)
    else:
        xr = np.stack([x_true, np.zeros_like(x_true)], axis=-1)
        y = jax.jit(A.apply)(jnp.asarray(xr))
        dom = tuple(shape) + (2,)
    f = 0.5 * SquaredL2Norm((n_vis, 2)).asloss(y) * A
    h = lam * L1Norm(dom)
    # (tau, inner CG maxiter) tuned jointly (tools/ri_sweep.py, CPU A/B at
    # the bench's exact 150-outer config): each outer costs maxiter+1
    # Toeplitz-gram applies (the dominant device cost), and a small tau
    # makes (I + tau Q) so well-conditioned that 4 CG steps solve the
    # x-update essentially exactly.  Measured rel-err at 150 outers:
    #   tau=1.00 mi=24 -> 0.0259%  (25 grams/outer — the old default)
    #   tau=0.05 mi=3  -> 0.0306%  ( 4 grams/outer — chosen: 6.3x fewer)
    #   tau=0.05 mi=4  -> 0.0293%, mi=6 -> 0.0256%, tau=0.03 mi=3 ->
    #   0.0357% (all neighbors pass; mi=2 at tau=0.03 fails 1.05% — mi=3
    #   keeps a full safety step off that cliff); tau<=0.02 collapses
    #   outer convergence (7-33% err) — the L1 threshold tau*lam gets too
    #   small to sparsify in 150 iterations.
    slv = ADMM(f=f, h=h, solver_kwargs=dict(maxiter=3))
    return slv, dict(x0=jnp.zeros(dom), tau=0.05), \
        dict(x_true=x_true, y=y, A=A)


def consensus_tiles(tile=(512, 512), n_tiles=8, lam=0.02, seed=0, mesh=None):
    """Workload 5: giga-pixel image as B tiles, consensus ADMM over a mesh."""
    from pyxu_tpu.operator.func import L1Norm, SquaredL2Norm
    from pyxu_tpu.parallel import ConsensusADMM, auto_mesh

    rng = np.random.default_rng(seed)
    mesh = mesh or auto_mesh()
    ys = [jnp.asarray(rng.random(tile, dtype=np.float32))
          for _ in range(n_tiles)]
    fs = [SquaredL2Norm(tile).asloss(y) for y in ys]
    g = (n_tiles * lam) * L1Norm(tile)
    slv = ConsensusADMM(fs, g=g, mesh=mesh)
    return slv, dict(z0=jnp.zeros(tile)), dict(ys=ys)
