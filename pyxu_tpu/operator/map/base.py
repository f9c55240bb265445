"""Misc maps.

Reference: src/pyxu/operator/map/base.py:14-60 (`ConstantValued`).
"""

from __future__ import annotations

import jax.numpy as jnp

from pyxu_tpu.abc.operator import DiffMap, ProxDiffFunc
from pyxu_tpu.utils.misc import as_canonical_shape

__all__ = ["ConstantValued"]


class _ConstantFunc(ProxDiffFunc):
    def __init__(self, dim_shape, cst: float):
        super().__init__(dim_shape)
        self._cst = float(cst)
        self._lipschitz = 0.0
        self._diff_lipschitz = 0.0

    def apply(self, arr):
        arr = jnp.asarray(arr)
        batch = arr.shape[: arr.ndim - self.dim_rank]
        return jnp.full(batch, self._cst, dtype=arr.dtype)

    def grad(self, arr):
        return jnp.zeros_like(jnp.asarray(arr))

    def prox(self, arr, tau):
        return jnp.asarray(arr)


class _ConstantMap(DiffMap):
    def __init__(self, dim_shape, codim_shape, cst: float):
        super().__init__(dim_shape, codim_shape)
        self._cst = float(cst)
        self._lipschitz = 0.0
        self._diff_lipschitz = 0.0

    def apply(self, arr):
        arr = jnp.asarray(arr)
        batch = arr.shape[: arr.ndim - self.dim_rank]
        return jnp.full(batch + tuple(self.codim_shape), self._cst, dtype=arr.dtype)

    def jacobian(self, arr):
        from pyxu_tpu.operator.linop.base import NullOp
        return NullOp(self.dim_shape, self.codim_shape)


def ConstantValued(dim_shape, codim_shape, cst: float):
    """x -> cst (reference: map/base.py:14-60); a ProxDiffFunc when the
    codomain is scalar."""
    codim_shape = as_canonical_shape(codim_shape)
    if codim_shape in ((), (1,)):
        return _ConstantFunc(dim_shape, cst)
    return _ConstantMap(dim_shape, codim_shape, cst)
