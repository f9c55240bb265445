"""Proximal Gradient Descent / FISTA.

Reference: src/pyxu/opt/solver/pgd.py:17-219.  Chambolle-Dossal acceleration
``a_k = k / (k + 1 + d)`` (pgd.py:164-171), default step ``tau = 1/beta``
with ``beta = f.diff_lipschitz``, default stop RelError(x) <= 1e-4
(pgd.py:193-203).  The whole iteration runs inside the jitted while-loop of
:class:`pyxu_tpu.abc.solver.Solver`.
"""

from __future__ import annotations

import math as _math

import jax.numpy as jnp

from pyxu_tpu.abc.solver import Solver
from pyxu_tpu.operator.linop.base import NullFunc
from pyxu_tpu.opt.stop import RelError

__all__ = ["PGD"]


class PGD(Solver):
    r"""min_x f(x) + g(x), f differentiable, g proximable."""

    def __init__(self, f=None, g=None, **kwargs):
        kwargs.setdefault("log_var", ("x",))
        super().__init__(**kwargs)
        if f is None and g is None:
            raise ValueError("at least one of f, g must be given")
        dim_shape = (f or g).dim_shape
        from pyxu_tpu.operator.linop.base import NullFunc as NF
        self._f = f if f is not None else NF(dim_shape)
        self._g = g
        self._dim_shape = dim_shape

    def m_init(self, x0, tau: float = None, acceleration: bool = True, d: float = 75.0):
        x0 = jnp.asarray(x0)
        if tau is None:
            beta = self._f.diff_lipschitz
            if not _math.isfinite(beta) or beta == 0:
                beta = self._f.estimate_diff_lipschitz()
            assert _math.isfinite(beta) and beta > 0, \
                "tau not given and f.diff_lipschitz unknown"
            tau = 1.0 / beta
        self._tau = float(tau)
        self._accel = bool(acceleration)
        self._d = float(d)
        # counter in f32 regardless of iterate dtype (bf16 would
        # freeze at k=256 and stall the momentum schedule)
        return {"x": x0, "x_prev": x0, "k": jnp.asarray(0.0, jnp.float32)}

    def m_step(self, mstate):
        x, x_prev, k = mstate["x"], mstate["x_prev"], mstate["k"]
        if self._accel:
            a = (k / (k + 1.0 + self._d)).astype(x.dtype)
        else:
            a = 0.0
        y = x + a * (x - x_prev)
        z = y - self._tau * self._f.grad(y)
        x_new = self._g.prox(z, self._tau) if self._g is not None else z
        return {"x": x_new, "x_prev": x, "k": k + 1.0}

    def default_stop_crit(self):
        return RelError(eps=1e-4, var="x")

    def objective_func(self, mstate):
        x = mstate["x"]
        val = self._f.apply(x)
        if self._g is not None:
            val = val + self._g.apply(x)
        return val
