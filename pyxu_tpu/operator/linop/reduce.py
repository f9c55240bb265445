"""Reduction operators.

Reference: src/pyxu/operator/linop/reduce.py:16-125 (`Sum`): sum over chosen
axes; adjoint = broadcast; L = sqrt(prod of reduced axis sizes).
"""

from __future__ import annotations

import math as _math

import jax.numpy as jnp
import numpy as np

from pyxu_tpu.abc.operator import LinOp
from pyxu_tpu.utils.misc import as_canonical_shape

__all__ = ["Sum"]


class Sum(LinOp):
    def __init__(self, dim_shape, axis=None):
        dim_shape = as_canonical_shape(dim_shape)
        rank = len(dim_shape)
        if axis is None:
            axis = tuple(range(rank))
        axis = (axis,) if isinstance(axis, (int, np.integer)) else tuple(axis)
        axis = tuple(sorted({a % rank for a in axis}))
        codim_shape = tuple(n for i, n in enumerate(dim_shape) if i not in axis)
        super().__init__(dim_shape, codim_shape)
        self._axis = axis
        self._lipschitz = _math.sqrt(float(np.prod([dim_shape[a] for a in axis])))
        self._name = "Sum"

    def apply(self, arr):
        arr = jnp.asarray(arr)
        nb = arr.ndim - self.dim_rank
        return jnp.sum(arr, axis=tuple(nb + a for a in self._axis))

    def adjoint(self, arr):
        arr = jnp.asarray(arr)
        nb = arr.ndim - self.codim_rank
        out = arr
        for a in self._axis:  # re-insert reduced axes in ascending order
            out = jnp.expand_dims(out, nb + a)
        return jnp.broadcast_to(out, out.shape[:nb] + tuple(self.dim_shape))

    def estimate_lipschitz(self, **kw):
        return self._lipschitz

    def _expr(self):
        return (f"Sum[axis={self._axis}]",)
