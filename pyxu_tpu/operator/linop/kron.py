r"""Matrix-free Kronecker products.

Reference: src/pyxu/operator/linop/kron.py:16-382 (`kron` :16,
`khatri_rao` :239): apply via reshape-matmul identities, closed-form
svdvals/trace products.

``kron(A, B) x = vec(A X B^T)`` with ``X = x.reshape(Na, Nb)`` (row-major):
apply B along the trailing axis (native batching), then A along the leading
axis.  Both factors must be 1-D -> 1-D operators.
"""

from __future__ import annotations

import math as _math

import jax.numpy as jnp
import numpy as np

from pyxu_tpu.abc.operator import LinOp

__all__ = ["kron", "khatri_rao"]


class _Kron(LinOp):
    _data_fields = ("_A", "_B")

    def __init__(self, A: LinOp, B: LinOp):
        assert A.dim_rank == A.codim_rank == 1
        assert B.dim_rank == B.codim_rank == 1
        super().__init__((A.dim_size * B.dim_size,),
                         (A.codim_size * B.codim_size,))
        self._A, self._B = A, B
        if _math.isfinite(A.lipschitz) and _math.isfinite(B.lipschitz):
            self._lipschitz = A.lipschitz * B.lipschitz
        self._name = "Kron"

    def _eval(self, arr, fA, fB, na, nb, ma, mb):
        arr = jnp.asarray(arr)
        batch = arr.shape[:-1]
        X = arr.reshape(batch + (na, nb))
        Y = fB(X)                       # (*batch, na, mb): B on trailing axis
        Y = jnp.swapaxes(Y, -1, -2)     # (*batch, mb, na)
        Z = fA(Y)                       # (*batch, mb, ma)
        Z = jnp.swapaxes(Z, -1, -2)     # (*batch, ma, mb)
        return Z.reshape(batch + (ma * mb,))

    def apply(self, arr):
        A, B = self._A, self._B
        return self._eval(arr, A.apply, B.apply,
                          A.dim_size, B.dim_size, A.codim_size, B.codim_size)

    def adjoint(self, arr):
        A, B = self._A, self._B
        return self._eval(arr, A.adjoint, B.adjoint,
                          A.codim_size, B.codim_size, A.dim_size, B.dim_size)

    def trace(self, **kw):
        """tr(A (x) B) = tr(A) tr(B) (reference: kron.py:200-238)."""
        return float(self._A.trace(**kw)) * float(self._B.trace(**kw))

    def svdvals(self, k: int = 1, **kw):
        sa = jnp.asarray(self._A.svdvals(k=min(k, self._A.dim_size), **kw))
        sb = jnp.asarray(self._B.svdvals(k=min(k, self._B.dim_size), **kw))
        # top-k products, ascending (reference svds contract)
        return jnp.sort((sa[:, None] * sb[None, :]).ravel())[-k:]

    def estimate_lipschitz(self, **kw):
        L = self._A.estimate_lipschitz(**kw) * self._B.estimate_lipschitz(**kw)
        self._lipschitz = L
        return L

    def _expr(self):
        return ("kron", self._A, self._B)


def kron(A: LinOp, B: LinOp) -> LinOp:
    return _Kron(A, B)


class _KhatriRao(LinOp):
    r"""Column-wise Kronecker: (A (*) B) x = vec(A diag(x) B^T)
    (reference: kron.py:239-382)."""

    _data_fields = ("_A", "_B")

    def __init__(self, A: LinOp, B: LinOp):
        assert A.dim_rank == A.codim_rank == 1
        assert B.dim_rank == B.codim_rank == 1
        assert A.dim_size == B.dim_size, "khatri_rao factors share #columns"
        super().__init__((A.dim_size,), (A.codim_size * B.codim_size,))
        self._A, self._B = A, B
        self._name = "KhatriRao"

    def apply(self, arr):
        A, B = self._A, self._B
        arr = jnp.asarray(arr)
        batch = arr.shape[:-1]
        n = A.dim_size
        # columns of diag(x): x_j e_j -> B gives x_j b_j, rows of W
        E = jnp.eye(n, dtype=arr.dtype)
        X = arr[..., :, None] * E       # (*batch, n, n)
        W = B.apply(X)                  # (*batch, n, Mb): row j = x_j b_j
        W = jnp.swapaxes(W, -1, -2)     # (*batch, Mb, n)
        Y = A.apply(W)                  # (*batch, Mb, Ma)
        Y = jnp.swapaxes(Y, -1, -2)     # (*batch, Ma, Mb)
        return Y.reshape(batch + (A.codim_size * B.codim_size,))

    def adjoint(self, arr):
        A, B = self._A, self._B
        arr = jnp.asarray(arr)
        batch = arr.shape[:-1]
        Y = arr.reshape(batch + (A.codim_size, B.codim_size))
        T = A.adjoint(jnp.swapaxes(Y, -1, -2))  # (*batch, Mb, n)
        T = jnp.swapaxes(T, -1, -2)             # (*batch, n, Mb)
        G = B.adjoint(T)                        # (*batch, n, n): G[j] = B^T T[j]
        return jnp.diagonal(G, axis1=-2, axis2=-1)

    def _expr(self):
        return ("khatri_rao", self._A, self._B)


def khatri_rao(A: LinOp, B: LinOp) -> LinOp:
    return _KhatriRao(A, B)
