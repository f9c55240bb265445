"""Conjugate Gradient solver (operator form).

Reference: src/pyxu/opt/solver/cg.py:12-187.  Solves ``A x = b`` for a
positive-definite LinOp, batched RHS, restart every ``restart_rate`` iters
(cg.py:137-151), default stop AbsError on the residual (cg.py:154-164).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pyxu_tpu.abc.solver import Solver
from pyxu_tpu.opt.stop import AbsError

__all__ = ["CG"]


class CG(Solver):
    def __init__(self, A, **kwargs):
        kwargs.setdefault("log_var", ("x",))
        super().__init__(**kwargs)
        self._A = A

    def m_init(self, b, x0=None, restart_rate: int = None):
        b = jnp.asarray(b)
        self._restart = int(restart_rate) if restart_rate else self._A.dim_size
        from pyxu_tpu.utils.misc import asarray_astype
        x = jnp.zeros_like(b) if x0 is None else \
            jnp.broadcast_to(asarray_astype(x0, b.dtype), b.shape)
        r = b - self._A.apply(x)
        return {"x": x, "b": b, "r": r, "p": r,
                "rs": self._dot(r, r), "k": jnp.asarray(0, jnp.int32)}

    def _dot(self, u, v):
        axes = tuple(range(u.ndim - self._A.dim_rank, u.ndim))
        return jnp.sum(u * v, axis=axes)

    def _bcast(self, s):
        return s.reshape(s.shape + (1,) * self._A.dim_rank)

    def m_step(self, mstate):
        x, b, r, p, rs, k = (mstate[n] for n in ("x", "b", "r", "p", "rs", "k"))
        eps = jnp.finfo(x.dtype).tiny
        Ap = self._A.apply(p)
        denom = self._dot(p, Ap)
        alpha = jnp.where(denom > eps, rs / jnp.maximum(denom, eps), 0.0)
        x = x + self._bcast(alpha) * p
        refresh = (k + 1) % self._restart == 0
        r = jax.lax.cond(
            refresh,
            lambda: b - self._A.apply(x),
            lambda: r - self._bcast(alpha) * Ap,
        )
        rs_new = self._dot(r, r)
        beta = jnp.where(rs > eps, rs_new / jnp.maximum(rs, eps), 0.0)
        p = r + self._bcast(beta) * p
        return {"x": x, "b": b, "r": r, "p": p, "rs": rs_new, "k": k + 1}

    def default_stop_crit(self):
        return AbsError(eps=1e-4, var="r", rank=self._A.dim_rank)

    def objective_func(self, mstate):
        # residual norm as the tracked objective
        return jnp.sqrt(jnp.max(mstate["rs"]))
