"""Elementary linear operators.

Reference: src/pyxu/operator/linop/base.py:24-512 (IdentityOp, NullOp,
NullFunc, HomothetyOp, DiagonalOp, _ExplicitLinOp).  All closed-form spectral
metadata (svdvals/trace/pinv/gram) is preserved; applies are trivially batched
jnp expressions that fuse under jit.
"""

from __future__ import annotations

import math as _math

import jax
import jax.numpy as jnp
import numpy as np

from pyxu_tpu.abc.operator import (
    LinFunc,
    LinOp,
    OrthProjOp,
    PosDefOp,
    SelfAdjointOp,
    SquareOp,
    UnitOp,
)
from pyxu_tpu.info.dtypes import default_fdtype
from pyxu_tpu.utils.misc import as_canonical_shape

__all__ = [
    "IdentityOp",
    "NullOp",
    "NullFunc",
    "HomothetyOp",
    "DiagonalOp",
    "ExplicitLinOp",
    "ExplicitLinFunc",
    "SparseExplicitLinOp",
    "_ExplicitLinOp",
]


class IdentityOp(OrthProjOp):
    """x -> x (reference: base.py:24-61). Also PosDef/Unit; kept OrthProj for
    the strongest class whose API (gram==self, pinv==apply) matches."""

    def __init__(self, dim_shape):
        super().__init__(dim_shape)
        self._lipschitz = 1.0

    def apply(self, arr):
        return jnp.asarray(arr)

    def adjoint(self, arr):
        return jnp.asarray(arr)

    def svdvals(self, k: int = 1, **kw):
        return jnp.ones(k, dtype=default_fdtype())

    def trace(self, **kw):
        return float(self.dim_size)

    def pinv(self, arr, damp: float = 0.0, **kw):
        return jnp.asarray(arr) / (1.0 + damp)

    def asarray(self, dtype=None):
        dtype = dtype or default_fdtype()
        return jnp.eye(self.dim_size, dtype=dtype).reshape(
            tuple(self.codim_shape) + tuple(self.dim_shape)
        )


class NullOp(LinOp):
    """x -> 0 (reference: base.py:62-115)."""

    def __init__(self, dim_shape, codim_shape):
        super().__init__(dim_shape, codim_shape)
        self._lipschitz = 0.0

    def apply(self, arr):
        arr = jnp.asarray(arr)
        batch = arr.shape[: arr.ndim - self.dim_rank]
        return jnp.zeros(batch + tuple(self.codim_shape), dtype=arr.dtype)

    def adjoint(self, arr):
        arr = jnp.asarray(arr)
        batch = arr.shape[: arr.ndim - self.codim_rank]
        return jnp.zeros(batch + tuple(self.dim_shape), dtype=arr.dtype)

    def svdvals(self, k: int = 1, **kw):
        return jnp.zeros(k, dtype=default_fdtype())

    def estimate_lipschitz(self, **kw):
        return 0.0

    def asarray(self, dtype=None):
        dtype = dtype or default_fdtype()
        return jnp.zeros(tuple(self.codim_shape) + tuple(self.dim_shape), dtype=dtype)


class NullFunc(LinFunc):
    """x -> 0 functional (reference: base.py:116-126)."""

    def __init__(self, dim_shape):
        super().__init__(dim_shape)
        self._lipschitz = 0.0

    def apply(self, arr):
        arr = jnp.asarray(arr)
        batch = arr.shape[: arr.ndim - self.dim_rank]
        return jnp.zeros(batch, dtype=arr.dtype)

    def adjoint(self, arr):
        arr = jnp.asarray(arr)
        return jnp.zeros(arr.shape + tuple(self.dim_shape), dtype=arr.dtype)

    def grad(self, arr):
        return jnp.zeros_like(jnp.asarray(arr))

    def prox(self, arr, tau):
        return jnp.asarray(arr)

    def estimate_lipschitz(self, **kw):
        return 0.0


class HomothetyOp(SelfAdjointOp):
    """x -> cst * x (reference: base.py:127-212).  PosDef for cst>0 — use
    the factory below which picks the tightest class."""

    def __new__(cls, dim_shape, cst: float):
        if cls is HomothetyOp and float(cst) > 0:
            obj = object.__new__(_PosDefHomothetyOp)
        else:
            obj = object.__new__(cls)
        return obj

    def __init__(self, dim_shape, cst: float):
        super().__init__(dim_shape)
        self._cst = float(cst)
        self._lipschitz = abs(self._cst)

    def apply(self, arr):
        return self._cst * jnp.asarray(arr)

    def svdvals(self, k: int = 1, **kw):
        return jnp.full(k, abs(self._cst), dtype=default_fdtype())

    def trace(self, **kw):
        return self._cst * self.dim_size

    def pinv(self, arr, damp: float = 0.0, **kw):
        scale = self._cst / (self._cst**2 + damp)
        return scale * jnp.asarray(arr)

    def estimate_lipschitz(self, **kw):
        return abs(self._cst)

    def asarray(self, dtype=None):
        dtype = dtype or default_fdtype()
        return self._cst * jnp.eye(self.dim_size, dtype=dtype).reshape(
            tuple(self.codim_shape) + tuple(self.dim_shape)
        )

    def _expr(self):
        return (f"Homothety[{self._cst}]",)


class _PosDefHomothetyOp(HomothetyOp, PosDefOp):
    pass


class DiagonalOp(SelfAdjointOp):
    """x -> v * x (reference: base.py:213-333).  PosDef when v > 0 — checked
    eagerly at build time (host-side) like the reference."""

    _data_fields = ("_vec",)

    def __new__(cls, vec, dim_shape=None, enable_warnings: bool = True):
        if cls is DiagonalOp and not isinstance(vec, jax.core.Tracer):
            # eager posdef probe (host-side, like the reference) — skipped
            # for TRACED inputs (jacobian of a ufunc inside jit): a
            # device_get on a tracer crashes, and class selection must be
            # static anyway
            v = np.asarray(jax.device_get(jnp.asarray(vec)))
            if v.size and np.all(v > 0):
                return object.__new__(_PosDefDiagonalOp)
        return object.__new__(cls)

    def __init__(self, vec, dim_shape=None, enable_warnings: bool = True):
        vec = jnp.asarray(vec)
        dim_shape = vec.shape if dim_shape is None else as_canonical_shape(dim_shape)
        super().__init__(dim_shape)
        self._vec = jnp.broadcast_to(vec, dim_shape)
        self._name = "DiagonalOp"

    def apply(self, arr):
        return self._vec * jnp.asarray(arr)

    def svdvals(self, k: int = 1, **kw):
        # top-k magnitudes, ascending (reference svds contract)
        return jnp.sort(jnp.abs(self._vec).ravel())[-k:]

    def trace(self, **kw):
        return float(jnp.sum(self._vec))

    def estimate_lipschitz(self, **kw):
        self._lipschitz = float(jnp.max(jnp.abs(self._vec)))
        return self._lipschitz

    def pinv(self, arr, damp: float = 0.0, **kw):
        scale = self._vec / (self._vec**2 + damp)
        scale = jnp.where(jnp.isfinite(scale), scale, 0.0)
        return scale * jnp.asarray(arr)

    def asarray(self, dtype=None):
        dtype = dtype or default_fdtype()
        return jnp.diag(self._vec.ravel().astype(dtype)).reshape(
            tuple(self.codim_shape) + tuple(self.dim_shape)
        )


class _PosDefDiagonalOp(DiagonalOp, PosDefOp):
    pass


class ExplicitLinOp(LinOp):
    """Dense-matrix operator (reference: base.py:334-512).

    ``mat`` has shape ``(*codim_shape, *dim_shape)``; apply is a tensordot
    over the trailing ``dim_rank`` axes — a plain MXU matmul after reshape.
    """

    _data_fields = ("_mat",)

    def __init__(self, mat, dim_rank: int = 1):
        if _is_sparse(mat):
            raise TypeError(
                "ExplicitLinOp is dense-only; wrap sparse matrices with "
                "SparseExplicitLinOp (or LinOp.from_array, which dispatches "
                "on the input type)."
            )
        mat = jnp.asarray(mat)
        dim_shape = mat.shape[mat.ndim - dim_rank:]
        codim_shape = mat.shape[: mat.ndim - dim_rank]
        super().__init__(dim_shape, codim_shape)
        self._mat = mat
        self._name = "ExplicitLinOp"

    def apply(self, arr):
        arr = jnp.asarray(arr)
        batch = arr.shape[: arr.ndim - self.dim_rank]
        M = self._mat.reshape(self.codim_size, self.dim_size)
        x = arr.reshape(batch + (self.dim_size,))
        y = jnp.einsum("...j,ij->...i", x, M)
        return y.reshape(batch + tuple(self.codim_shape))

    def adjoint(self, arr):
        arr = jnp.asarray(arr)
        batch = arr.shape[: arr.ndim - self.codim_rank]
        M = self._mat.reshape(self.codim_size, self.dim_size)
        y = arr.reshape(batch + (self.codim_size,))
        x = jnp.einsum("...i,ij->...j", y, M)
        return x.reshape(batch + tuple(self.dim_shape))

    def asarray(self, dtype=None):
        return self._mat.astype(dtype) if dtype is not None else self._mat

    def trace(self, **kw):
        assert self.dim_size == self.codim_size
        return float(jnp.trace(self._mat.reshape(self.dim_size, self.dim_size)))

    def estimate_lipschitz(self, method: str = "svd", **kw):
        M = self._mat.reshape(self.codim_size, self.dim_size)
        if method in ("svd", "power"):
            self._lipschitz = float(jnp.linalg.matrix_norm(M, ord=2))
        else:
            self._lipschitz = float(jnp.linalg.norm(M))
        return self._lipschitz

    def svdvals(self, k: int = 1, **kw):
        M = self._mat.reshape(self.codim_size, self.dim_size)
        s = jnp.linalg.svd(M, compute_uv=False)
        return s[:k][::-1]  # top-k, ascending (reference svds contract)


class ExplicitLinFunc(LinFunc):
    """f(x) = <w, x> from an explicit vector (reference: base.py:334-512,
    functional specialisation)."""

    _data_fields = ("_vec",)

    def __init__(self, vec):
        vec = jnp.asarray(vec)
        super().__init__(vec.shape)
        self._vec = vec
        self._name = "ExplicitLinFunc"

    def apply(self, arr):
        arr = jnp.asarray(arr)
        axes = tuple(range(-self.dim_rank, 0))
        return jnp.sum(arr * self._vec, axis=axes)

    def adjoint(self, arr):
        arr = jnp.asarray(arr)
        return arr.reshape(arr.shape + (1,) * self.dim_rank) * self._vec

    def grad(self, arr):
        return jnp.broadcast_to(self._vec, jnp.shape(arr))

    def prox(self, arr, tau):
        return jnp.asarray(arr) - jnp.asarray(tau) * self._vec

    def estimate_lipschitz(self, **kw):
        self._lipschitz = float(jnp.linalg.norm(self._vec.ravel()))
        return self._lipschitz

    def asarray(self, dtype=None):
        return self._vec.astype(dtype) if dtype is not None else self._vec


def _is_sparse(obj) -> bool:
    """True for scipy.sparse matrices and jax.experimental.sparse arrays."""
    try:
        import scipy.sparse as sp
        if sp.issparse(obj):
            return True
    except ImportError:  # pragma: no cover
        pass
    try:
        from jax.experimental.sparse import JAXSparse
        return isinstance(obj, JAXSparse)
    except ImportError:  # pragma: no cover
        return False


class SparseExplicitLinOp(LinOp):
    """Sparse-matrix operator backed by ``jax.experimental.sparse.BCOO``.

    TPU analog of the reference's sparse ``_ExplicitLinOp`` branch
    (reference: src/pyxu/operator/linop/base.py:334-512 keeps
    scipy.sparse / pydata-sparse / cupyx matrices and dispatches matmuls to
    the sparse backend; ``SparseArrayInfo`` registry deps.py:91-146).  Here
    the matrix is stored once as a flattened ``(codim_size, dim_size)``
    BCOO (plus its transpose, so the adjoint is also a sparse-lhs matvec —
    BCOO has no fast dense@sparse path) and applies run through
    ``bcoo_dot_general``.

    Notes
    -----
    * XLA has no first-class sparse support: on TPU ``bcoo_dot_general``
      lowers to gather/segment-sum programs, which are latency-bound —
      prefer :class:`ExplicitLinOp` (dense MXU matmul) unless the matrix is
      too large to densify.  This operator's value is MEMORY, not speed.
    * Real dtypes only: the framework's complex convention is trailing-axis
      ``(..., 2)`` real views (eager complex poisons some TPU runtimes).
    """

    _data_fields = ("_mat", "_matT")

    def __init__(self, mat, dim_rank: int = 1, dim_shape=None,
                 codim_shape=None):
        from jax.experimental import sparse as jsp
        try:
            import scipy.sparse as sp
            is_scipy = sp.issparse(mat)
        except ImportError:  # pragma: no cover
            is_scipy = False
        if is_scipy:
            coo = mat.tocoo()
            if np.iscomplexobj(coo.data):
                raise TypeError(
                    "complex sparse matrices are unsupported: use the "
                    "framework's real (..., 2) view convention "
                    "(utils.complex) and two real operators")
            full_shape = tuple(coo.shape)
            if dim_shape is None:
                dim_shape = full_shape[len(full_shape) - dim_rank:]
            if codim_shape is None:
                codim_shape = full_shape[: len(full_shape) - dim_rank]
            data = jnp.asarray(coo.data.astype(default_fdtype()
                                               if coo.data.dtype.kind == "f"
                                               else coo.data.dtype))
            idx = jnp.asarray(
                np.stack([coo.row, coo.col], axis=1).astype(np.int32))
            flat = jsp.BCOO((data, idx), shape=full_shape)
        elif isinstance(mat, jsp.BCOO):
            if jnp.iscomplexobj(mat.data):
                raise TypeError(
                    "complex sparse matrices are unsupported: use the "
                    "framework's real (..., 2) view convention")
            if dim_shape is None:
                dim_shape = mat.shape[mat.ndim - dim_rank:]
            if codim_shape is None:
                codim_shape = mat.shape[: mat.ndim - dim_rank]
            flat = mat
        else:
            raise TypeError(
                f"expected a scipy.sparse matrix or jax BCOO, got "
                f"{type(mat).__name__} (dense arrays -> ExplicitLinOp)")
        super().__init__(tuple(dim_shape), tuple(codim_shape))
        if flat.ndim != 2 or flat.shape != (self.codim_size, self.dim_size):
            flat = flat.reshape(self.codim_size, self.dim_size)
        self._mat = flat
        # Host-side transpose at plan time: swapping COO index columns is
        # free; bcoo_dot_general over a transposed *dense rhs* would need a
        # gather-heavy rhs-contraction instead.
        self._matT = jsp.BCOO(
            (flat.data, flat.indices[:, ::-1]),
            shape=(self.dim_size, self.codim_size))
        self._name = "SparseExplicitLinOp"

    @staticmethod
    def _smv(M, x):
        """Batched sparse (m,n) @ dense (*batch, n) -> (*batch, m)."""
        from jax.experimental import sparse as jsp
        y = jsp.bcoo_dot_general(
            M, x,
            dimension_numbers=(((1,), (x.ndim - 1,)), ((), ())))
        # result axes: (m, *batch) -> (*batch, m)
        return jnp.moveaxis(y, 0, -1)

    def apply(self, arr):
        arr = jnp.asarray(arr)
        batch = arr.shape[: arr.ndim - self.dim_rank]
        x = arr.reshape(batch + (self.dim_size,))
        y = self._smv(self._mat, x)
        return y.reshape(batch + tuple(self.codim_shape))

    def adjoint(self, arr):
        arr = jnp.asarray(arr)
        batch = arr.shape[: arr.ndim - self.codim_rank]
        y = arr.reshape(batch + (self.codim_size,))
        x = self._smv(self._matT, y)
        return x.reshape(batch + tuple(self.dim_shape))

    def asarray(self, dtype=None):
        dense = self._mat.todense().reshape(
            tuple(self.codim_shape) + tuple(self.dim_shape))
        return dense.astype(dtype) if dtype is not None else dense

    def trace(self, **kw):
        assert self.dim_size == self.codim_size
        idx = np.asarray(jax.device_get(self._mat.indices))
        dat = np.asarray(jax.device_get(self._mat.data))
        return float(dat[idx[:, 0] == idx[:, 1]].sum())


#: Reference-private alias (``pyxu.operator.linop.base._ExplicitLinOp``,
#: base.py:334): downstream plugins reference the dense-matrix operator
#: under this name.
_ExplicitLinOp = ExplicitLinOp
