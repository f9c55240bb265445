"""Indicator functionals of convex sets; proxes = projections.

Reference: src/pyxu/operator/func/indicator.py:72-528 (L1Ball :72, L2Ball
:106, LInfinityBall :140, PositiveOrthant :174, HyperSlab :209, RangeSet
:280, AffineSet :336, ConvexSetIntersection/POCS :402).

Projections that the reference computes with host algorithms (sort-based
L1-ball, LSQR for RangeSet/AffineSet) are jit-compatible device programs here
(exact sort projection, fixed-iteration CG).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pyxu_tpu.abc.operator import ProxFunc
from pyxu_tpu.operator.func.norm import _project_l1_ball
from pyxu_tpu.utils.misc import as_canonical_shape

__all__ = [
    "L1Ball",
    "L2Ball",
    "LInfinityBall",
    "PositiveOrthant",
    "HyperSlab",
    "RangeSet",
    "AffineSet",
    "ConvexSetIntersection",
]


class _IndicatorFunc(ProxFunc):
    """0 on the set, +inf outside (membership checked with a dtype-aware
    tolerance, like the reference's `_IndicatorFunc`)."""

    def __init__(self, dim_shape):
        super().__init__(dim_shape)
        self._lipschitz = np.inf

    @property
    def _axes(self):
        return tuple(range(-self.dim_rank, 0))

    def _member(self, arr):  # -> bool per batch element
        raise NotImplementedError

    def apply(self, arr):
        arr = jnp.asarray(arr)
        ok = self._member(arr)
        zero = jnp.zeros(ok.shape, dtype=arr.dtype)
        return jnp.where(ok, zero, jnp.inf)

    def _tol(self, arr):
        return jnp.sqrt(jnp.finfo(arr.dtype).eps)


class L1Ball(_IndicatorFunc):
    """{x : ||x||_1 <= radius} (reference: indicator.py:72-105)."""

    def __init__(self, dim_shape, radius: float = 1.0):
        super().__init__(dim_shape)
        self._radius = float(radius)

    def _member(self, arr):
        return jnp.sum(jnp.abs(arr), axis=self._axes) <= self._radius * (1 + self._tol(arr))

    def prox(self, arr, tau):
        return _project_l1_ball(jnp.asarray(arr), self._radius, self.dim_rank)


class L2Ball(_IndicatorFunc):
    """{x : ||x||_2 <= radius} (reference: indicator.py:106-139)."""

    def __init__(self, dim_shape, radius: float = 1.0):
        super().__init__(dim_shape)
        self._radius = float(radius)

    def _member(self, arr):
        return jnp.sqrt(jnp.sum(arr * arr, axis=self._axes)) <= self._radius * (1 + self._tol(arr))

    def prox(self, arr, tau):
        arr = jnp.asarray(arr)
        n = jnp.sqrt(jnp.sum(arr * arr, axis=self._axes, keepdims=True))
        scale = jnp.minimum(1.0, self._radius / jnp.maximum(n, jnp.finfo(arr.dtype).tiny))
        return scale * arr


class LInfinityBall(_IndicatorFunc):
    """{x : ||x||_inf <= radius} (reference: indicator.py:140-173)."""

    def __init__(self, dim_shape, radius: float = 1.0):
        super().__init__(dim_shape)
        self._radius = float(radius)

    def _member(self, arr):
        return jnp.max(jnp.abs(arr), axis=self._axes) <= self._radius * (1 + self._tol(arr))

    def prox(self, arr, tau):
        return jnp.clip(jnp.asarray(arr), -self._radius, self._radius)


class PositiveOrthant(_IndicatorFunc):
    """{x : x >= 0} (reference: indicator.py:174-208)."""

    def _member(self, arr):
        return jnp.all(arr >= -self._tol(arr), axis=self._axes)

    def prox(self, arr, tau):
        return jnp.maximum(jnp.asarray(arr), 0.0)


class HyperSlab(_IndicatorFunc):
    """{x : lb <= <a, x> <= ub} (reference: indicator.py:209-279)."""

    _data_fields = ("_a",)

    def __init__(self, a, lb: float, ub: float):
        """``a``: a LinFunc or an array of the slab normal."""
        from pyxu_tpu.abc.operator import LinFunc
        if isinstance(a, LinFunc):
            vec = a.asarray()
        else:
            vec = jnp.asarray(a)
        super().__init__(vec.shape)
        assert lb < ub
        self._a = vec
        self._lb, self._ub = float(lb), float(ub)

    def _member(self, arr):
        ip = jnp.sum(arr * self._a, axis=self._axes)
        t = self._tol(arr)
        return (ip >= self._lb - t) & (ip <= self._ub + t)

    def prox(self, arr, tau):
        arr = jnp.asarray(arr)
        a = self._a.astype(arr.dtype)
        ip = jnp.sum(arr * a, axis=self._axes, keepdims=True)
        n2 = jnp.sum(a * a)
        shift_up = jnp.maximum(self._lb - ip, 0.0)   # below the slab
        shift_dn = jnp.minimum(self._ub - ip, 0.0)   # above the slab
        return arr + (shift_up + shift_dn) * a / n2


class RangeSet(_IndicatorFunc):
    """{x : x in range(A)} (reference: indicator.py:280-335).

    prox = orthogonal projection onto range(A) = A (A^T A)^+ A^T x, evaluated
    with a nested CG solve (the reference uses LSQR)."""

    _data_fields = ("_A",)

    def __init__(self, A, damp: float = 0.0, **cg_kwargs):
        super().__init__(A.codim_shape)
        self._A = A
        self._damp = float(damp)
        self._cg = dict(cg_kwargs)

    def _member(self, arr):
        p = self._project(arr)
        err = jnp.sqrt(jnp.sum((arr - p) ** 2, axis=self._axes))
        ref = jnp.sqrt(jnp.sum(arr * arr, axis=self._axes))
        return err <= self._tol(arr) * jnp.maximum(ref, 1.0)

    def _project(self, arr):
        from pyxu_tpu.math.cg import cg_solve
        arr = jnp.asarray(arr)
        b = self._A.adjoint(arr)
        gram = self._A.gram()
        mv = lambda v: gram.apply(v) + self._damp * v
        z = cg_solve(mv, b, rtol=self._cg.get("rtol", 1e-8),
                     maxiter=self._cg.get("maxiter", 2 * self._A.dim_size),
                     core_ndim=self._A.dim_rank)
        return self._A.apply(z)

    def prox(self, arr, tau):
        return self._project(arr)


class AffineSet(_IndicatorFunc):
    """{x : A x = b} (reference: indicator.py:336-401).

    prox = x - A^T (A A^T)^+ (A x - b) via nested CG on the cogram."""

    _data_fields = ("_A", "_b")

    def __init__(self, A, b, **cg_kwargs):
        super().__init__(A.dim_shape)
        self._A = A
        self._b = jnp.asarray(b)
        self._cg = dict(cg_kwargs)

    def _member(self, arr):
        r = self._A.apply(arr) - self._b
        axes = tuple(range(-self._A.codim_rank, 0))
        err = jnp.sqrt(jnp.sum(r * r, axis=axes))
        return err <= self._tol(arr) * jnp.maximum(
            jnp.linalg.norm(self._b.ravel()), 1.0)

    def prox(self, arr, tau):
        from pyxu_tpu.math.cg import cg_solve
        arr = jnp.asarray(arr)
        r = self._A.apply(arr) - self._b
        cogram = self._A.cogram()
        z = cg_solve(cogram.apply, r, rtol=self._cg.get("rtol", 1e-8),
                     maxiter=self._cg.get("maxiter", 2 * self._A.codim_size),
                     core_ndim=self._A.codim_rank)
        return arr - self._A.adjoint(z)


class ConvexSetIntersection(_IndicatorFunc):
    """Intersection of convex sets; prox by POCS (alternating projections,
    fixed iteration count — reference: indicator.py:402-528)."""

    _data_fields = ("_funcs",)

    def __init__(self, *funcs, n_iter: int = 32):
        assert len(funcs) >= 1
        super().__init__(funcs[0].dim_shape)
        self._funcs = tuple(funcs)
        self._n_iter = int(n_iter)

    def _member(self, arr):
        ok = None
        for f in self._funcs:
            m = f._member(arr)
            ok = m if ok is None else (ok & m)
        return ok

    def prox(self, arr, tau):
        x = jnp.asarray(arr)

        def body(_, x):
            for f in self._funcs:
                x = f.prox(x, 1.0)
            return x

        return jax.lax.fori_loop(0, self._n_iter, body, x)
