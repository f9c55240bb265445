"""Backend registry (reference: src/pyxu/info/deps.py:25-204).

The reference enumerates four dense backends (NumPy/CuPy/Dask) plus sparse
families; this framework has exactly one compute backend — JAX on XLA — with
NumPy as the host-side staging module.  The registry survives as a thin
migration shim: code written against ``NDArrayInfo.from_obj(x).module()``
keeps working, and capability flags answer the same questions the
reference's did (GPU/TPU presence, optional-dep availability).
"""

from __future__ import annotations

import enum
import importlib.util

import jax
import numpy as np

__all__ = [
    "NDArrayInfo",
    "SparseArrayInfo",
    "supported_array_types",
    "supported_array_modules",
    "supported_sparse_types",
    "supported_sparse_modules",
    "CUPY_ENABLED",
    "JAX_SUPPORT",
    "PYTORCH_SUPPORT",
]

CUPY_ENABLED: bool = False  # CUDA backends do not exist here (TPU/XLA build)
JAX_SUPPORT: bool = True
PYTORCH_SUPPORT: bool = importlib.util.find_spec("torch") is not None


class NDArrayInfo(enum.Enum):
    """Dense-backend registry (reference `NDArrayInfo`, deps.py:25-87)."""

    NUMPY = enum.auto()  # host staging arrays
    JAX = enum.auto()    # the compute backend (CPU/TPU via XLA)

    def module(self):
        if self is NDArrayInfo.NUMPY:
            return np
        import jax.numpy as jnp
        return jnp

    def type(self) -> type:
        if self is NDArrayInfo.NUMPY:
            return np.ndarray
        return jax.Array

    @classmethod
    def from_obj(cls, obj) -> "NDArrayInfo":
        if isinstance(obj, jax.Array):
            return cls.JAX
        if isinstance(obj, np.ndarray):
            return cls.NUMPY
        raise ValueError(f"unsupported array type {type(obj)}")

    @classmethod
    def from_flag(cls, gpu: bool = False) -> "NDArrayInfo":
        # reference keys on gpu=True -> CUPY; every accelerator here is JAX
        return cls.JAX


class SparseArrayInfo(enum.Enum):
    """Sparse-backend registry (reference `SparseArrayInfo`, deps.py:91-146).
    XLA has no first-class sparse arrays; BCOO is the experimental analog."""

    SCIPY = enum.auto()
    JAX_BCOO = enum.auto()

    def module(self):
        if self is SparseArrayInfo.SCIPY:
            import scipy.sparse as sp
            return sp
        from jax.experimental import sparse as jsparse
        return jsparse

    @classmethod
    def from_obj(cls, obj) -> "SparseArrayInfo":
        import scipy.sparse as sp
        if sp.issparse(obj):
            return cls.SCIPY
        from jax.experimental.sparse import JAXSparse
        if isinstance(obj, JAXSparse):
            return cls.JAX_BCOO
        raise ValueError(f"unsupported sparse type {type(obj)}")


def supported_array_types() -> tuple:
    return tuple(info.type() for info in NDArrayInfo)


def supported_array_modules() -> tuple:
    return tuple(info.module() for info in NDArrayInfo)


def supported_sparse_types() -> tuple:
    import scipy.sparse as sp
    from jax.experimental.sparse import JAXSparse
    return (sp.spmatrix, JAXSparse)


def supported_sparse_modules() -> tuple:
    return tuple(info.module() for info in SparseArrayInfo)
