"""Wrap scipy.sparse.linalg.LinearOperator as a LinOp.

Reference: src/pyxu/operator/interop/sciop.py:18-91 (`from_sciop`).  SciPy
operators are host-side; applies cross into the XLA graph via
``jax.pure_callback`` (batched through matmat).
"""

from __future__ import annotations

import numpy as np

from pyxu_tpu.abc.operator import LinOp

__all__ = ["from_sciop"]


class _SciOp(LinOp):
    def __init__(self, sp_op):
        M, N = sp_op.shape
        super().__init__((N,), (M,))
        self._sp = sp_op
        self._name = "SciOp"

    def _call(self, fn, fn_mat, arr, n_in, n_out):
        import jax
        import jax.numpy as jnp
        arr = jnp.asarray(arr)
        batch = arr.shape[:-1]

        def host(a):
            flat = np.asarray(a).reshape(-1, n_in)
            if flat.shape[0] == 0:
                out = np.zeros((0, n_out), a.dtype)
            elif fn_mat is not None:
                # ONE matmat/rmatmat call (BLAS-level batching) instead of
                # a per-row python matvec loop
                out = np.asarray(fn_mat(flat.T)).T
            else:
                out = np.stack([np.asarray(fn(v)).ravel() for v in flat])
            return out.reshape(a.shape[:-1] + (n_out,)).astype(a.dtype)

        res = jax.ShapeDtypeStruct(tuple(batch) + (n_out,), arr.dtype)
        return jax.pure_callback(host, res, arr, vmap_method="sequential")

    def apply(self, arr):
        return self._call(self._sp.matvec, getattr(self._sp, "matmat", None),
                          arr, self.dim_size, self.codim_size)

    def adjoint(self, arr):
        return self._call(self._sp.rmatvec, getattr(self._sp, "rmatmat", None),
                          arr, self.codim_size, self.dim_size)


def from_sciop(sp_op) -> LinOp:
    return _SciOp(sp_op)
