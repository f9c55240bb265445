"""Type vocabulary for annotating the public API.

Reference: src/pyxu/info/ptype.py:19-81 (`NDArray, ArrayModule, OpT, OpC,
SolverT, OpShape, Real, Integer, DType, Path, VarName`).  On TPU there is a
single array type (jax.Array), so several reference aliases collapse.
"""

from __future__ import annotations

import numbers
import os
import typing as typ

import jax
import numpy as np

__all__ = [
    "NDArray",
    "ArrayModule",
    "OpT",
    "OpC",
    "SolverT",
    "SolverC",
    "SolverM",
    "OpShape",
    "NDArrayAxis",
    "NDArrayShape",
    "Integer",
    "Real",
    "DType",
    "Path",
    "VarName",
]

NDArray = jax.Array
ArrayModule = typ.Any  # single backend: jax.numpy
OpT = typ.TypeVar("OpT", bound="pyxu_tpu.abc.operator.Operator")  # noqa: F821
OpC = typ.Type[OpT]
SolverT = typ.TypeVar("SolverT", bound="pyxu_tpu.abc.solver.Solver")  # noqa: F821
SolverC = typ.Type[SolverT]
SolverM = typ.Any  # pyxu_tpu.abc.solver.Mode
OpShape = typ.Tuple[int, ...]
NDArrayAxis = typ.Union[int, typ.Tuple[int, ...]]
NDArrayShape = typ.Union[int, typ.Tuple[int, ...]]
Integer = numbers.Integral
Real = numbers.Real
DType = typ.Union[str, type, np.dtype]
Path = typ.Union[str, os.PathLike]
VarName = typ.Union[str, typ.Collection[str]]
