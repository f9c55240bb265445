"""Element-wise universal-function operators.

Reference: src/pyxu/operator/map/ufunc.py:33-1061 — 27 ufunc wrappers, each a
Map/DiffMap with a hand-written diagonal Jacobian and Lipschitz /
diff-Lipschitz constants, plus functional forms ``f(op) = F() * op``.

TPU design: one generic :class:`ElementWiseMap` parameterized by
``(fn, dfn, L, dL)`` — ``fn`` is a jnp scalar-ufunc that XLA fuses into
neighbouring ops; the Jacobian at a point is a :class:`DiagonalOp` of
``dfn(arr)``.  Functional forms compose through the ChainRule exactly like
the reference (``ufunc.py:82-101``).
"""

from __future__ import annotations

import functools
import math as _math

import jax
import jax.numpy as jnp
import numpy as np

from pyxu_tpu.abc.operator import DiffMap, Map
from pyxu_tpu.operator.linop.base import DiagonalOp

# like the reference (ufunc.py:33-61), only the lowercase functional forms
# are re-exported into the operator namespace; the CamelCase classes stay
# accessible as module attributes (pyxu_tpu.operator.map.ufunc.Sin)
__all__ = [
    "sin", "cos", "tan", "arcsin", "arccos", "arctan",
    "sinh", "cosh", "tanh", "arcsinh", "arccosh", "arctanh",
    "exp", "log", "clip", "sqrt", "cbrt", "square", "abs", "sign",
    "gaussian", "sigmoid", "softplus", "leakyrelu", "relu", "silu", "softmax",
]


class ElementWiseMap(DiffMap):
    """Generic x -> fn.(x) with diagonal Jacobian dfn.(x)."""

    _fn = staticmethod(lambda x: x)
    _dfn = None  # None => autodiff element-wise derivative
    _L = _math.inf
    _dL = _math.inf

    def __init__(self, dim_shape):
        super().__init__(dim_shape, dim_shape)
        self._lipschitz = float(self._L)
        self._diff_lipschitz = float(self._dL)

    def apply(self, arr):
        return type(self)._fn(jnp.asarray(arr))

    def _deriv(self, arr):
        if type(self)._dfn is not None:
            return type(self)._dfn(arr)
        df = jax.grad(lambda t: type(self)._fn(t))
        for _ in range(jnp.ndim(arr)):
            df = jax.vmap(df)
        return df(arr)

    def jacobian(self, arr):
        return DiagonalOp(self._deriv(jnp.asarray(arr)), dim_shape=self.dim_shape)


class _NonDiffElementWise(Map):
    _fn = staticmethod(lambda x: x)
    _L = _math.inf

    def __init__(self, dim_shape):
        super().__init__(dim_shape, dim_shape)
        self._lipschitz = float(self._L)

    def apply(self, arr):
        return type(self)._fn(jnp.asarray(arr))


def _diff(name, fn, dfn, L, dL, doc):
    cls = type(name, (ElementWiseMap,), {
        "_fn": staticmethod(fn), "_dfn": staticmethod(dfn),
        "_L": L, "_dL": dL, "__doc__": doc,
    })
    return cls


_2R3 = 2.0 / (3.0 * _math.sqrt(3.0))  # max |d/dx sin_like| bounds etc.

# name, fn, dfn, L, dL   (constants: reference ufunc.py per-class headers)
Sin = _diff("Sin", jnp.sin, jnp.cos, 1.0, 1.0, "reference: ufunc.py:65-81")
Cos = _diff("Cos", jnp.cos, lambda x: -jnp.sin(x), 1.0, 1.0, "reference: ufunc.py:102-118")
Tan = _diff("Tan", jnp.tan, lambda x: 1.0 / jnp.cos(x) ** 2, _math.inf, _math.inf,
            "reference: ufunc.py:140-158")
ArcSin = _diff("ArcSin", jnp.arcsin, lambda x: 1.0 / jnp.sqrt(1 - x * x),
               _math.inf, _math.inf, "reference: ufunc.py:178-198")
ArcCos = _diff("ArcCos", jnp.arccos, lambda x: -1.0 / jnp.sqrt(1 - x * x),
               _math.inf, _math.inf, "reference: ufunc.py:218-236")
ArcTan = _diff("ArcTan", jnp.arctan, lambda x: 1.0 / (1 + x * x),
               1.0, 3 * _math.sqrt(3) / 8, "reference: ufunc.py:256-276")
Sinh = _diff("Sinh", jnp.sinh, jnp.cosh, _math.inf, _math.inf, "reference: ufunc.py:297-313")
Cosh = _diff("Cosh", jnp.cosh, jnp.sinh, _math.inf, _math.inf, "reference: ufunc.py:333-349")
Tanh = _diff("Tanh", jnp.tanh, lambda x: 1.0 / jnp.cosh(x) ** 2,
             1.0, 4 / (3 * _math.sqrt(3)), "reference: ufunc.py:369-391")
ArcSinh = _diff("ArcSinh", jnp.arcsinh, lambda x: 1.0 / jnp.sqrt(x * x + 1),
                1.0, _2R3, "reference: ufunc.py:412-434")
ArcCosh = _diff("ArcCosh", jnp.arccosh, lambda x: 1.0 / jnp.sqrt(x * x - 1),
                _math.inf, _math.inf, "reference: ufunc.py:454-473")
ArcTanh = _diff("ArcTanh", jnp.arctanh, lambda x: 1.0 / (1 - x * x),
                _math.inf, _math.inf, "reference: ufunc.py:493-511")
Exp = _diff("Exp", jnp.exp, jnp.exp, _math.inf, _math.inf, "reference: ufunc.py:532-556")
Log = _diff("Log", jnp.log, lambda x: 1.0 / x, _math.inf, _math.inf,
            "reference: ufunc.py:576-598")
Sqrt = _diff("Sqrt", jnp.sqrt, lambda x: 0.5 / jnp.sqrt(x), _math.inf, _math.inf,
             "reference: ufunc.py:660-677")
Cbrt = _diff("Cbrt", jnp.cbrt, lambda x: 1.0 / (3.0 * jnp.cbrt(x * x)),
             _math.inf, _math.inf, "reference: ufunc.py:697-715")
Square = _diff("Square", jnp.square, lambda x: 2.0 * x, _math.inf, 2.0,
               "reference: ufunc.py:735-753")
Gaussian = _diff("Gaussian", lambda x: jnp.exp(-x * x),
                 lambda x: -2.0 * x * jnp.exp(-x * x),
                 _math.sqrt(2 / _math.e), 2.0, "reference: ufunc.py:820-842")
Sigmoid = _diff("Sigmoid", jax.nn.sigmoid,
                lambda x: jax.nn.sigmoid(x) * (1 - jax.nn.sigmoid(x)),
                0.25, 1 / (6 * _math.sqrt(3)), "reference: ufunc.py:862-884")
SoftPlus = _diff("SoftPlus", jax.nn.softplus, jax.nn.sigmoid, 1.0, 0.25,
                 "reference: ufunc.py:904-921")
SiLU = _diff("SiLU", jax.nn.silu,
             lambda x: jax.nn.sigmoid(x) * (1 + x * (1 - jax.nn.sigmoid(x))),
             1.1, 0.5, "reference: ufunc.py:983-1007")


class Abs(_NonDiffElementWise):
    """reference: ufunc.py:773-783"""
    _fn = staticmethod(jnp.abs)
    _L = 1.0


class Sign(_NonDiffElementWise):
    """reference: ufunc.py:796-806"""
    _fn = staticmethod(jnp.sign)
    _L = _math.inf


class Clip(_NonDiffElementWise):
    """reference: ufunc.py:619-640"""
    _L = 1.0

    def __init__(self, dim_shape, a_min=None, a_max=None):
        super().__init__(dim_shape)
        assert not (a_min is None and a_max is None)
        self._amin, self._amax = a_min, a_max

    def apply(self, arr):
        return jnp.clip(jnp.asarray(arr), self._amin, self._amax)


class LeakyReLU(_NonDiffElementWise):
    """reference: ufunc.py:941-953"""

    def __init__(self, dim_shape, alpha: float):
        super().__init__(dim_shape)
        self._alpha = float(alpha)
        self._lipschitz = max(1.0, _math.fabs(self._alpha))

    def apply(self, arr):
        arr = jnp.asarray(arr)
        return jnp.where(arr >= 0, arr, self._alpha * arr)


class ReLU(LeakyReLU):
    """reference: ufunc.py:966-970"""

    def __init__(self, dim_shape):
        super().__init__(dim_shape, alpha=0.0)


class SoftMax(DiffMap):
    """Softmax over all core axes; Jacobian diag(p) - p p^T
    (reference: ufunc.py:1027-1048)."""

    def __init__(self, dim_shape):
        super().__init__(dim_shape, dim_shape)
        self._lipschitz = 1.0
        self._diff_lipschitz = 1.0

    def apply(self, arr):
        arr = jnp.asarray(arr)
        axes = tuple(range(arr.ndim - self.dim_rank, arr.ndim))
        m = jnp.max(arr, axis=axes, keepdims=True)
        e = jnp.exp(arr - m)
        return e / jnp.sum(e, axis=axes, keepdims=True)

    def jacobian(self, arr):
        return _SoftMaxJac(self, jnp.asarray(arr))


from pyxu_tpu.abc.operator import SelfAdjointOp as _SelfAdjointOp  # noqa: E402


class _SoftMaxJac(_SelfAdjointOp):
    _data_fields = ("_p",)

    def __init__(self, op: SoftMax, at):
        super().__init__(op.dim_shape)
        self._p = op.apply(at)
        self._name = "SoftMaxJacobian"

    def apply(self, arr):
        arr = jnp.asarray(arr)
        axes = tuple(range(arr.ndim - self.dim_rank, arr.ndim))
        ip = jnp.sum(self._p * arr, axis=axes, keepdims=True)
        return self._p * (arr - ip)


def _functional(cls):
    @functools.wraps(cls, updated=())
    def f(op, *args, **kwargs):
        from pyxu_tpu.abc.operator import Operator
        if isinstance(op, Operator):
            return cls(op.codim_shape, *args, **kwargs) * op
        return cls(op, *args, **kwargs)  # called with a shape
    return f


sin = _functional(Sin)
cos = _functional(Cos)
tan = _functional(Tan)
arcsin = _functional(ArcSin)
arccos = _functional(ArcCos)
arctan = _functional(ArcTan)
sinh = _functional(Sinh)
cosh = _functional(Cosh)
tanh = _functional(Tanh)
arcsinh = _functional(ArcSinh)
arccosh = _functional(ArcCosh)
arctanh = _functional(ArcTanh)
exp = _functional(Exp)
log = _functional(Log)
clip = _functional(Clip)
sqrt = _functional(Sqrt)
cbrt = _functional(Cbrt)
square = _functional(Square)
abs = _functional(Abs)  # noqa: A001
sign = _functional(Sign)
gaussian = _functional(Gaussian)
sigmoid = _functional(Sigmoid)
softplus = _functional(SoftPlus)
leakyrelu = _functional(LeakyReLU)
relu = _functional(ReLU)
silu = _functional(SiLU)
softmax = _functional(SoftMax)
