"""Proximal Adam / AMSGrad / PAdam.

Reference: src/pyxu/opt/solver/prox_adam.py:18-478.  Moment updates followed
by a **nested PGD sub-solve** of the weighted-metric prox sub-problem
``argmin_z g(z) + ‖z − y‖²_v / (2τ)`` (the reference's "Option 2" rationale,
prox_adam.py:395-416).  The inner PGD runs a fixed number of iterations so
the whole step stays jit-traceable.
"""

from __future__ import annotations

import math as _math

import jax.numpy as jnp

from pyxu_tpu.abc.solver import Solver
from pyxu_tpu.opt.stop import RelError

__all__ = ["ProxAdam"]


class ProxAdam(Solver):
    r"""min_x f(x) + g(x), f differentiable, g proximable
    (reference: prox_adam.py:18-478)."""

    def __init__(self, f, g=None, **kwargs):
        kwargs.setdefault("log_var", ("x",))
        super().__init__(**kwargs)
        self._f = f
        self._g = g

    def m_init(self, x0, variant: str = "adam", a: float = None,
               b1: float = 0.9, b2: float = 0.999, p: float = 0.5,
               eps_var: float = 1e-6, inner_iter: int = 10):
        x0 = jnp.asarray(x0)
        assert variant in ("adam", "amsgrad", "padam")
        self._variant = variant
        if a is None:
            beta = self._f.diff_lipschitz
            a = 1.0 / beta if (_math.isfinite(beta) and beta > 0) else 1e-3
        self._a = float(a)
        self._b1, self._b2 = float(b1), float(b2)
        self._p = float(p)
        self._eps = float(eps_var)
        self._inner = int(inner_iter)
        z = jnp.zeros_like(x0)
        # t in f32: bf16 counters freeze at 256 and wreck bias correction
        return {"x": x0, "m": z, "v": z, "v_hat": z,
                "t": jnp.asarray(0.0, jnp.float32)}

    def _phi_psi(self, mst, g):
        b1, b2 = self._b1, self._b2
        t = mst["t"] + 1.0
        m = b1 * mst["m"] + (1 - b1) * g
        v = b2 * mst["v"] + (1 - b2) * g * g
        if self._variant == "adam":
            mh = m / (1 - b1**t).astype(m.dtype)
            vh = v / (1 - b2**t).astype(v.dtype)
            phi, psi = mh, jnp.sqrt(vh) + self._eps
            v_hat = mst["v_hat"]
        elif self._variant == "amsgrad":
            v_hat = jnp.maximum(mst["v_hat"], v)
            phi, psi = m, jnp.sqrt(v_hat) + self._eps
        else:  # padam: denominator v_hat**p (reference prox_adam.py:471;
            # p=0.5 recovers AMSGrad)
            v_hat = jnp.maximum(mst["v_hat"], v)
            phi, psi = m, v_hat ** self._p + self._eps
        return phi, psi, m, v, v_hat, t

    def m_step(self, mst):
        x = mst["x"]
        grad = self._f.grad(x)
        phi, psi, m, v, v_hat, t = self._phi_psi(mst, grad)
        a = self._a
        y = x - a * phi / psi
        if self._g is None:
            xp = y
        else:
            # nested PGD on   argmin_z g(z) + ||z - y||^2_psi / (2a)
            # (reference: prox_adam.py:395-416)
            axes = tuple(range(-len(self._f.dim_shape), 0))
            lip = jnp.max(psi, axis=axes, keepdims=True) / a
            tau = 1.0 / lip
            z = y
            for _ in range(self._inner):
                gq = psi * (z - y) / a
                z = self._g.prox(z - tau * gq, tau)
            xp = z
        return {"x": xp, "m": m, "v": v, "v_hat": v_hat, "t": t}

    def default_stop_crit(self):
        return RelError(eps=1e-4, var="x", rank=len(self._f.dim_shape))

    def objective_func(self, mstate):
        x = mstate["x"]
        val = self._f.apply(x)
        if self._g is not None:
            val = val + self._g.apply(x)
        return val
