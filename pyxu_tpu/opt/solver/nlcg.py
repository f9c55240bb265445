"""Nonlinear Conjugate Gradient.

Reference: src/pyxu/opt/solver/nlcg.py:14-271 — PR+ ("PR") and FR β variants
(:193-230), Armijo backtracking each step.  Everything (including the line
search) runs inside the jitted solver loop.
"""

from __future__ import annotations

import math as _math

import jax.numpy as jnp

from pyxu_tpu.abc.solver import Solver
from pyxu_tpu.math.linesearch import backtracking_linesearch
from pyxu_tpu.opt.stop import RelError

__all__ = ["NLCG"]


class NLCG(Solver):
    r"""min_x f(x), f differentiable (reference: nlcg.py:14-271)."""

    def __init__(self, f, **kwargs):
        kwargs.setdefault("log_var", ("x",))
        super().__init__(**kwargs)
        self._f = f

    def m_init(self, x0, variant: str = "PR", restart_rate: int = None,
               a0: float = None, r: float = 0.5, c: float = 1e-4):
        x0 = jnp.asarray(x0)
        assert variant in ("PR", "FR")
        self._variant = variant
        self._restart = int(restart_rate or self._f.dim_size)
        if a0 is None:
            beta = self._f.diff_lipschitz
            if not _math.isfinite(beta) or beta == 0:
                a0 = 1.0
            else:
                a0 = 1.0 / beta
        self._ls = dict(a0=float(a0), r=float(r), c=float(c))
        g = self._f.grad(x0)
        return {"x": x0, "g": g, "p": -g, "k": jnp.asarray(0, jnp.int32)}

    def _dot(self, u, v):
        axes = tuple(range(u.ndim - len(self._f.dim_shape), u.ndim))
        return jnp.sum(u * v, axis=axes)

    def m_step(self, mst):
        x, g, p, k = mst["x"], mst["g"], mst["p"], mst["k"]
        rank = len(self._f.dim_shape)
        a = backtracking_linesearch(self._f, x, p, gradient=g, **self._ls)
        xp = x + a.reshape(a.shape + (1,) * rank) * p
        gp = self._f.grad(xp)
        gg = self._dot(g, g)
        eps = jnp.finfo(x.dtype).tiny
        if self._variant == "FR":
            beta = self._dot(gp, gp) / jnp.maximum(gg, eps)
        else:  # PR+
            beta = jnp.maximum(self._dot(gp, gp - g) / jnp.maximum(gg, eps), 0.0)
        # periodic restart to steepest descent (reference: nlcg.py:231-245)
        beta = jnp.where((k + 1) % self._restart == 0, 0.0, beta)
        pp = -gp + beta.reshape(beta.shape + (1,) * rank) * p
        return {"x": xp, "g": gp, "p": pp, "k": k + 1}

    def default_stop_crit(self):
        return RelError(eps=1e-4, var="x", rank=len(self._f.dim_shape))

    def objective_func(self, mstate):
        return self._f.apply(mstate["x"])
