"""Jit-compatible conjugate-gradient linear solve.

Used as the nested solver inside ``QuadraticFunc.prox`` / ``LinOp.pinv``
(reference nests its CG solver the same way: src/pyxu/abc/operator.py:1273-1291,
1664-1746) and by the ADMM x-minimisation step.  Pure ``lax.while_loop`` —
runs device-resident inside jitted solver loops, supports batched RHS with
per-batch step sizes (the reference batches RHS too: opt/solver/cg.py:124-165).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cg_solve"]


def cg_solve(matvec, b, x0=None, *, rtol: float = 1e-6, atol: float = 0.0,
             maxiter: int = None, core_ndim: int = None, restart_rate: int = None,
             precond=None):
    """Solve ``matvec(x) = b`` for symmetric positive-definite ``matvec``.

    Parameters
    ----------
    matvec: callable accepting/returning arrays shaped like ``b`` (batched ok).
    b: right-hand side ``(*batch, *core_shape)``.
    core_ndim: rank of the vector part (trailing axes); ``None`` = all of b.
    restart_rate: re-compute the true residual every so many iterations
        (reference restarts every N iters: opt/solver/cg.py:137-151).
    precond: optional SPD preconditioner ``z = M^{-1}(r)`` (arrays shaped
        like ``b``) — standard PCG recursion; the stopping test stays on the
        TRUE residual norm so tolerances mean the same thing with and
        without it.
    """
    b = jnp.asarray(b)
    core_ndim = b.ndim if core_ndim is None else core_ndim
    axes = tuple(range(b.ndim - core_ndim, b.ndim))
    if maxiter is None:
        maxiter = 10 * max(int(jnp.size(b)), 1)
    if restart_rate is None:
        restart_rate = max(maxiter, 1)

    def dot(u, v):
        return jnp.sum(u * v, axis=axes)

    def bcast(s):
        return s.reshape(s.shape + (1,) * core_ndim)

    from pyxu_tpu.utils.misc import asarray_astype
    x = jnp.zeros_like(b) if x0 is None else \
        jnp.broadcast_to(asarray_astype(x0, b.dtype), b.shape)
    M = precond if precond is not None else (lambda r: r)
    r = b - matvec(x)
    z = M(r)
    p = z
    rz = dot(r, z)
    rs = dot(r, r)
    b2 = dot(b, b)
    tol2 = jnp.maximum(rtol * rtol * b2, atol * atol)
    eps = jnp.finfo(b.dtype).tiny

    def cond(carry):
        k, x, r, p, rz, rs = carry
        return jnp.logical_and(k < maxiter, jnp.any(rs > tol2))

    def body(carry):
        k, x, r, p, rz, rs = carry
        Ap = matvec(p)
        denom = dot(p, Ap)
        alpha = jnp.where(denom > eps, rz / jnp.maximum(denom, eps), 0.0)
        x = x + bcast(alpha) * p
        # Periodic true-residual refresh fights FP32 drift.  STATIC skip
        # when the restart can never fire inside the budget: the lax.cond
        # would otherwise compile (and schedule around) a second matvec in
        # every iteration of every nested CG (ADMM x-updates run 3-24
        # iteration budgets — the refresh branch is pure dead weight there).
        if restart_rate < maxiter:
            r = jax.lax.cond(
                (k + 1) % restart_rate == 0,
                lambda: b - matvec(x),
                lambda: r - bcast(alpha) * Ap,
            )
        else:
            r = r - bcast(alpha) * Ap
        z = M(r)
        rz_new = dot(r, z)
        rs_new = dot(r, r)
        beta = jnp.where(rz > eps, rz_new / jnp.maximum(rz, eps), 0.0)
        p = z + bcast(beta) * p
        return (k + 1, x, r, p, rz_new, rs_new)

    _, x, _, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), x, r, p, rz, rs))
    return x
