r"""Primal-dual splitting family.

Reference: src/pyxu/opt/solver/pds.py:210-1862 (`_PrimalDualSplitting` base,
CondatVu :210, PD3O :523, ChambollePock :867, LorisVerhoeven :970,
DavisYin :1102, DouglasRachford :1229, ADMM :1313, ForwardBackward :1690,
ProximalPoint :1789).

Problem: ``min_x f(x) + g(x) + h(K x)`` with f differentiable (Lipschitz
gradient β), g and h proximable, K a linear operator.

TPU design: each ``m_step`` is a handful of operator applies + proxes — a
pure jnp function folded into the solver's jitted while-loop; the dual prox
``prox_{σh*}`` is evaluated through Moreau's identity (no conjugate needed).
Step sizes are derived host-side at ``m_init`` from β and ``‖K‖`` with the
reference's three tuning strategies (pds.py:440-520).
"""

from __future__ import annotations

import math as _math
import warnings

import jax.numpy as jnp

from pyxu_tpu.abc.solver import Solver
from pyxu_tpu.opt.stop import RelError
from pyxu_tpu.utils.misc import asarray_astype as _asarray_astype

__all__ = [
    "CondatVu",
    "CV",
    "PD3O",
    "ChambollePock",
    "CP",
    "LorisVerhoeven",
    "LV",
    "DavisYin",
    "DY",
    "DouglasRachford",
    "DR",
    "ADMM",
    "ForwardBackward",
    "FB",
    "ProximalPoint",
    "PP",
]


class _PrimalDualSplitting(Solver):
    """Common problem spec + step-size machinery (reference: pds.py:210-520)."""

    def __init__(self, f=None, g=None, h=None, K=None, **kwargs):
        kwargs.setdefault("log_var", ("x", "z"))
        super().__init__(**kwargs)
        ref = f or g or (h if K is None else None)
        if ref is None and K is not None:
            dim_shape = K.dim_shape
        else:
            assert ref is not None, "at least one of f, g, h must be specified"
            dim_shape = ref.dim_shape
        from pyxu_tpu.operator.linop.base import NullFunc
        self._f = f if f is not None else NullFunc(dim_shape)
        self._g = g if g is not None else NullFunc(dim_shape)
        self._h = h
        self._K = K
        self._dim_shape = dim_shape

    # -- step sizes --------------------------------------------------------
    def _beta(self) -> float:
        b = self._f.diff_lipschitz
        if not _math.isfinite(b):
            b = self._f.estimate_diff_lipschitz()
        return float(b)

    def _norm_K(self) -> float:
        if self._K is None:
            return 1.0 if self._h is not None else 0.0
        L = self._K.lipschitz
        if not _math.isfinite(L):
            L = self._K.estimate_lipschitz()
        return float(L)

    def _set_steps(self, tau, sigma, rho, tuning_strategy):
        """Choose (τ, σ, ρ) satisfying 1/τ − σ‖K‖² ≥ γ with the reference's
        three tuning strategies (reference: pds.py:164-174, 444-520):
        1: γ=β, ρ=1 (safe); 2: γ=β/1.9 (large steps); 3: γ=β, ρ=δ−0.1."""
        beta = self._beta()
        L = self._norm_K()
        gamma = beta / 1.9 if tuning_strategy == 2 else beta
        from pyxu_tpu.abc.operator import Property
        if tau is not None and sigma is None:
            assert tau > 0
            if self._h is None:
                sigma = 0.0
            else:
                sigma = (1.0 / tau - gamma) / L**2
                assert sigma > 0, "given tau violates the convergence condition"
        elif tau is None and sigma is not None:
            assert sigma > 0
            tau = 1.0 / gamma if self._h is None else 1.0 / (gamma + sigma * L**2)
        elif tau is None and sigma is None:
            if beta > 0:
                if self._h is None:
                    tau, sigma = 1.0 / gamma, 0.0
                else:
                    tau = sigma = (1.0 / L**2) * (
                        -gamma / 2 + _math.sqrt(gamma**2 / 4 + L**2))
            else:
                tau, sigma = (1.0, 0.0) if self._h is None else (1.0 / L, 1.0 / L)
        self._tau = float(tau)
        self._sigma = float(sigma or 0.0)
        # over-relaxation bound δ (reference: pds.py:183-204, 516-519)
        quad = self._f.has(Property.QUADRATIC)
        if beta == 0 or (quad and gamma <= beta):
            delta = 2.0
        else:
            delta = 2.0 - beta / (2.0 * gamma)
        if rho is None:
            rho = max(delta - 0.1, 1.0) if tuning_strategy == 3 else 1.0
        assert rho <= delta + 1e-9, f"rho={rho} exceeds delta={delta}"
        self._rho = float(rho)

    def m_init(self, x0, z0=None, tau=None, sigma=None, rho=None,
               tuning_strategy: int = 1, dual_dtype=None):
        """``dual_dtype`` (e.g. ``jnp.bfloat16``) stores the dual state in a
        narrower dtype than the primal — a mixed-precision lever for
        bandwidth-bound iterations (the fused TV kernel reads/writes the
        dual as 4 of its 7 frame-traffics; bf16 storage halves them).
        Arithmetic stays at the primal precision: the dual is cast up per
        step and re-quantized on store.  No reference analog (the reference
        runs a global FP32/FP64 width, runtime/_runtime.py:24-64)."""
        x0 = jnp.asarray(x0)
        self._set_steps(tau, sigma, rho, tuning_strategy)
        mst = {"x": x0}
        if self._h is not None:
            zdt = x0.dtype if dual_dtype is None else jnp.dtype(dual_dtype)
            if z0 is None:
                zshape = (x0.shape[: x0.ndim - len(self._dim_shape)]
                          + tuple(self._K.codim_shape if self._K is not None
                                  else self._dim_shape))
                z0 = jnp.zeros(zshape, zdt)
            mst["z"] = _asarray_astype(z0, zdt)
        return self._m_init_extra(mst)

    def _m_init_extra(self, mst):
        return mst

    def default_stop_crit(self):
        crit = RelError(eps=1e-4, var="x", rank=len(self._dim_shape))
        if self._h is not None:
            crit = crit & RelError(
                eps=1e-4, var="z",
                rank=len(self._K.codim_shape if self._K is not None else self._dim_shape))
        return crit

    def objective_func(self, mstate):
        x = mstate["x"]
        val = self._f.apply(x) + self._g.apply(x)
        if self._h is not None:
            val = val + self._h.apply(self._K.apply(x) if self._K is not None else x)
        return val

    # -- shared pieces -----------------------------------------------------
    def _Kt(self, z):
        return self._K.adjoint(z) if self._K is not None else z

    def _Kf(self, x):
        return self._K.apply(x) if self._K is not None else x


class CondatVu(_PrimalDualSplitting):
    r"""Condat-Vu splitting (reference: pds.py:210-522, m_step :429).

    x⁺ = prox_{τg}(x − τ∇f(x) − τK^T z)
    z⁺ = prox_{σh*}(z + σK(2x⁺ − x))
    (x, z) ← (1−ρ)(x, z) + ρ(x⁺, z⁺)
    """

    def _m_init_extra(self, mst):
        # Fusion pass: when the problem is the TV-deconvolution family
        # (quadratic-of-separable-stencil data term, forward-diff gradient,
        # L21 dual prox), swap m_step for the single Pallas kernel that runs
        # the whole iteration VMEM-resident (pyxu_tpu.ops.fused_tv) —
        # numerics match the generic path (tests force both).  Skipped in
        # dynamic operand mode: the fused step bakes the linear term
        # b = c.grad(0) as a trace constant, which update_operands() could
        # silently leave stale (operand hot-swap rides jit ARGUMENTS).
        if getattr(self, "_operand_mode", "static") == "dynamic":
            self._fused_tv = None
            self._m_step2 = None
            self._m_step2_on = False
            return mst
        import os
        key = (self._tau, self._sigma, self._rho,
               os.environ.get("PYXU_TPU_FUSED", "auto"),
               os.environ.get("PYXU_TPU_FUSED2", "auto"),
               os.environ.get("PYXU_TPU_FUSED2_K", "3"),
               os.environ.get("PYXU_TPU_FUSED_G", "1"))
        cached = getattr(self, "_fused_tv_cache", None)
        if cached is not None and cached[0] == key:
            # re-fit with unchanged hyperparameters: reuse the matched step
            # (matching costs device round-trips — taps fetch + b compute —
            # which are seconds through tunneled TPU relays)
            self._fused_tv, fused2 = cached[1], cached[2]
        else:
            from pyxu_tpu.ops.fused_tv import match_fused_tv, match_fused_tv2
            self._fused_tv = match_fused_tv(
                self._f, self._g, self._h, self._K,
                tau=self._tau, sigma=self._sigma, rho=self._rho)
            fused2 = None
            if self._fused_tv is not None:
                fused2 = match_fused_tv2(
                    self._f, self._g, self._h, self._K,
                    tau=self._tau, sigma=self._sigma, rho=self._rho)
            self._fused_tv_cache = (key, self._fused_tv, fused2)
        # temporal-blocking hook for the engine (abc/solver.py segment
        # loop): one call = TWO exact iterations; trace-time failures
        # (dtype-tightened alignment, odd shapes) fall back to two m_steps
        if fused2 is not None and getattr(mst["x"], "ndim", 0) == 2:
            def _step2(s, _f2=fused2,
                       _k=int(getattr(fused2, "n_steps", 2))):
                x, z = s["x"], s["z"]
                okdt = (jnp.float32, jnp.bfloat16)
                if x.dtype in okdt and z.dtype in okdt:
                    try:
                        xn, zn = _f2(x, z)
                        return {"x": xn, "z": zn}
                    except (AssertionError, ValueError):
                        pass
                for _ in range(_k):
                    s = self.m_step(s)
                return s
            self._m_step2 = _step2
            self._m_step2_on = True
            self._m_step2_iters = int(getattr(fused2, "n_steps", 2))
        else:
            self._m_step2 = None
            self._m_step2_on = False
            self._m_step2_iters = 0
        return mst

    def m_step(self, mst):
        x = mst["x"]
        tau, sigma, rho = self._tau, self._sigma, self._rho
        if self._h is None:
            xp = self._g.prox(x - tau * self._f.grad(x), tau)
            return {"x": x + rho * (xp - x)}
        z = mst["z"]
        fused = getattr(self, "_fused_tv", None)
        okdt = (jnp.float32, jnp.bfloat16)
        if (fused is not None and x.ndim == 2
                and x.dtype in okdt and z.dtype in okdt):
            try:
                xn, zn = fused(x, z)
                return {"x": xn, "z": zn}
            except AssertionError:
                # bf16 storage tightens the kernel's DMA alignment (16-row
                # tiles); images whose divisors cannot satisfy it fall back
                # to the generic operator path (tracing is pure — nothing
                # was committed)
                pass
        # generic path: compute at the promoted precision, store back at
        # each variable's own dtype (keeps mixed-precision carries stable)
        zc = z.astype(x.dtype) if z.dtype != x.dtype else z
        xp = self._g.prox(x - tau * self._f.grad(x) - tau * self._Kt(zc), tau)
        zp = self._h.fenchel_prox(zc + sigma * self._Kf(2 * xp - x), sigma)
        return {"x": (x + rho * (xp - x)).astype(x.dtype),
                "z": (zc + rho * (zp - zc)).astype(z.dtype)}


CV = CondatVu


class PD3O(_PrimalDualSplitting):
    r"""Primal-Dual Three-Operator splitting (reference: pds.py:523-866,
    m_step :747).

    x  = prox_{τg}(u − τK^T z)
    u⁺ = (1−ρ)u + ρ(x − τ∇f(x))
    z⁺ = (1−ρ)z + ρ prox_{σh*}(z + σK(x + x − τ∇f(x) − u))

    (the reference's "one adjoint + one gradient per iteration" rewriting of
    [PSA] eq. 216 with M=1, pds.py:747-760)
    """

    def _m_init_extra(self, mst):
        # if x0 == u0 and g = h = Null, the first step is a no-op and the
        # stop criterion fires immediately (reference: pds.py:743-746)
        x0 = mst["x"]
        if self._h is None and type(self._g).__name__ == "NullFunc":
            # additive term too: x0 = 0 would make a multiplicative nudge a
            # no-op and the first RelError check would fire at x0
            mst["u"] = x0 * 1.01 + 0.01
        else:
            mst["u"] = x0
        return mst

    def m_step(self, mst):
        u = mst["u"]
        tau, sigma, rho = self._tau, self._sigma, self._rho
        if self._h is None:
            x = self._g.prox(u, tau)
            ut = x - tau * self._f.grad(x)
            return {"x": x, "u": u + rho * (ut - u)}
        z = mst["z"]
        x = self._g.prox(u - tau * self._Kt(z), tau)
        ut = x - tau * self._f.grad(x)
        zt = self._h.fenchel_prox(z + sigma * self._Kf(x + ut - u), sigma)
        return {"x": x, "u": u + rho * (ut - u), "z": z + rho * (zt - z)}


def ChambollePock(g=None, h=None, K=None, **kwargs):
    """CV with f = 0 (reference: pds.py:867-969)."""
    slv = CondatVu(f=None, g=g, h=h, K=K, **kwargs)
    slv._name = "ChambollePock"
    return slv


CP = ChambollePock


def LorisVerhoeven(f=None, h=None, K=None, **kwargs):
    """PD3O with g = 0 (reference: pds.py:970-1101)."""
    slv = PD3O(f=f, g=None, h=h, K=K, **kwargs)
    slv._name = "LorisVerhoeven"
    return slv


LV = LorisVerhoeven


def DavisYin(f=None, g=None, h=None, **kwargs):
    """PD3O with K = Identity (reference: pds.py:1102-1228)."""
    slv = PD3O(f=f, g=g, h=h, K=None, **kwargs)
    slv._name = "DavisYin"
    return slv


DY = DavisYin


class DouglasRachford(_PrimalDualSplitting):
    r"""CV(f=0, K=I, σ=1/τ) specialisation (reference: pds.py:1229-1312)."""

    def __init__(self, g=None, h=None, **kwargs):
        super().__init__(f=None, g=g, h=h, K=None, **kwargs)

    def m_init(self, x0, z0=None, tau: float = 1.0):
        x0 = jnp.asarray(x0)
        self._tau = float(tau)
        self._sigma = 1.0 / self._tau
        self._rho = 1.0
        z0 = x0 if z0 is None else _asarray_astype(z0, x0.dtype)
        return {"x": x0, "z": z0}

    def m_step(self, mst):
        x, z = mst["x"], mst["z"]
        tau = self._tau
        xp = self._g.prox(z, tau)
        zp = z + self._h.prox(2 * xp - z, tau) - xp
        return {"x": xp, "z": zp}

    def default_stop_crit(self):
        return RelError(eps=1e-4, var="x", rank=len(self._dim_shape))


DR = DouglasRachford


def ForwardBackward(f=None, g=None, **kwargs):
    """CV with h = 0 (reference: pds.py:1690-1788)."""
    slv = CondatVu(f=f, g=g, h=None, K=None, **kwargs)
    slv._name = "ForwardBackward"
    return slv


FB = ForwardBackward


def ProximalPoint(g=None, **kwargs):
    """CV with f = h = 0 (reference: pds.py:1789-1862)."""
    slv = CondatVu(f=None, g=g, h=None, K=None, **kwargs)
    slv._name = "ProximalPoint"
    return slv


PP = ProximalPoint


class ADMM(_PrimalDualSplitting):
    r"""ADMM for ``min_x f(x) + h(Kx)`` (reference: pds.py:1313-1689).

    K=None (classical prox-ADMM, m_step :1631):
        x⁺ = prox_{τf}(z − u)
        z⁺ = prox_{τh}(x⁺ + u)
        u⁺ = u + x⁺ − z⁺

    K given: the x-update is the sub-problem
    ``argmin_x f(x) + ‖Kx − (z−u)‖²/(2τ)``, solved with a nested
    fixed-iteration CG when f is quadratic (reference QuadraticFunc→CG
    :1498-1540) or gradient descent steps otherwise (reference uses NLCG).
    """

    def __init__(self, f=None, h=None, K=None, solver_kwargs=None, **kwargs):
        kwargs.setdefault("log_var", ("x", "z", "u"))
        Solver.__init__(self, **kwargs)
        from pyxu_tpu.abc.operator import Property
        from pyxu_tpu.operator.linop.base import NullFunc
        if f is None:
            dim_shape = K.dim_shape if K is not None else h.dim_shape
            f = NullFunc(dim_shape)
        self._f = f
        self._h = h
        self._K = K
        self._dim_shape = f.dim_shape
        self._g = NullFunc(self._dim_shape)
        self._solver_kwargs = dict(solver_kwargs or {})
        if K is not None:
            assert f.has(Property.QUADRATIC) or f.has(Property.DIFFERENTIABLE), \
                "with K, the x-update needs f quadratic (CG) or differentiable (GD)"
        elif self._solver_kwargs and f.has(Property.QUADRATIC):
            # classical branch solves the x-update through f.prox (a nested
            # CG for quadratics); honor solver_kwargs there too — warm-started
            # ADMM tolerates inexact x-minimisation (reference passes
            # solver_kwargs into its sub-solver the same way, pds.py:1498-1540).
            # The settings live on a PRIVATE shallow copy: stamping them onto
            # the caller's operator would change f.prox accuracy everywhere
            # that object is shared.
            import copy
            self._f = f = copy.copy(f)
            if "maxiter" in self._solver_kwargs:
                f._prox_maxiter = int(self._solver_kwargs["maxiter"])
            if "rtol" in self._solver_kwargs:
                f._prox_rtol = float(self._solver_kwargs["rtol"])

    def m_init(self, x0, z0=None, u0=None, tau: float = None):
        from pyxu_tpu.abc.operator import Property as P
        x0 = jnp.asarray(x0)
        if tau is None:
            tau = 1.0
        self._tau = float(tau)
        # GD x-update step size must be computed HOST-SIDE here: inside the
        # jitted segment self._f/self._K hold tracer leaves and the
        # estimate_*lipschitz power iterations would trace-crash (and be
        # swallowed by the crash-proof segment loop, returning x0)
        needs_gd = (not self._f.has(P.QUADRATIC)
                    and not (self._K is None and self._f.has(P.PROXIMABLE)))
        if needs_gd and self._f.has(P.DIFFERENTIABLE):
            beta = self._f.diff_lipschitz
            if not _math.isfinite(beta):
                beta = self._f.estimate_diff_lipschitz()
            LK = self._norm_K()
            self._gd_step = 1.0 / (max(float(beta), 1e-12)
                                   + float(LK) ** 2 / self._tau)
        Kx = self._K.apply(x0) if self._K is not None else x0
        z0 = Kx if z0 is None else _asarray_astype(z0, x0.dtype)
        u0 = jnp.zeros_like(z0) if u0 is None else _asarray_astype(u0, x0.dtype)
        return {"x": x0, "z": z0, "u": u0}

    def _x_update(self, x, v):
        """argmin_x f(x) + ‖Kx − v‖²/(2τ)."""
        from pyxu_tpu.abc.operator import Property
        tau = self._tau
        if self._K is None:
            from pyxu_tpu.abc.operator import Property as P
            # NOTE (measured, do not "optimize"): for quadratic f the prox
            # CG deliberately COLD-starts at v = z - u (f.prox's x0) rather
            # than warm-starting at the previous x-update solution.  A/B on
            # the RI workload (32^2, 200 outers): cold 1.9e-4 rel err at
            # maxiter=24 vs warm 4.2e-3 — v is already an excellent
            # initializer for sparse recovery (z is the thresholded image,
            # u a small dual), while previous-x carries accumulated CG
            # error that re-contaminates every solve.
            if self._f.has(P.PROXIMABLE):
                return self._f.prox(v, tau)
            # differentiable-only f: one gradient step cannot solve it; use
            # a fixed CG-like descent on the strongly-convex objective
        from pyxu_tpu.math.cg import cg_solve
        if self._f.has(Property.QUADRATIC):
            Q, c, _ = self._f._quad_spec()
            # (Q + K^T K / τ) x = K^T v / τ − c
            b = self._Kt(v) / tau - c.grad(jnp.zeros_like(x))
            mv = lambda p: Q.apply(p) + self._Kt(self._Kf(p)) / tau
            return cg_solve(mv, b, x0=x,
                            rtol=self._solver_kwargs.get("rtol", 1e-6),
                            maxiter=self._solver_kwargs.get("maxiter", 50),
                            core_ndim=len(self._dim_shape))
        # differentiable f: fixed number of gradient-descent steps on
        # F(x) = f(x) + ‖Kx − v‖²/(2τ); step size precomputed host-side in
        # m_init (Lipschitz estimation cannot run on traced operators)
        n_steps = self._solver_kwargs.get("maxiter", 20)
        step = self._gd_step
        for _ in range(n_steps):
            grad = self._f.grad(x) + self._Kt(self._Kf(x) - v) / tau
            x = x - step * grad
        return x

    def m_step(self, mst):
        x, z, u = mst["x"], mst["z"], mst["u"]
        tau = self._tau
        xp = self._x_update(x, z - u)
        Kx = self._Kf(xp)
        zp = self._h.prox(Kx + u, tau)
        up = u + Kx - zp
        return {"x": xp, "z": zp, "u": up}

    def default_stop_crit(self):
        return RelError(eps=1e-4, var="x", rank=len(self._dim_shape))

    def objective_func(self, mstate):
        x = mstate["x"]
        return self._f.apply(x) + self._h.apply(self._Kf(x))
