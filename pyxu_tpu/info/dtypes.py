"""Runtime precision policy.

TPU-native re-design of the reference's global-precision runtime
(reference: src/pyxu/runtime/_runtime.py:24-263).  The reference wraps every
arithmetic method in an ``@enforce_precision`` decorator driven by mutable
module-global state; under ``jax.jit`` that pattern is untraceable and forces
recompiles.  Here precision is an explicit *policy object* resolved at trace
time:

* ``Width`` / ``CWidth`` enums mirror the reference's (``_runtime.py:24-64``)
  with an extra ``HALF``/bfloat16 member for the MXU-native dtype.
* ``Precision(width)`` is a context manager that sets the default real width
  used by operator constructors when no explicit ``dtype`` is given.
* float64 requires ``jax.config.update("jax_enable_x64", True)`` — use
  :func:`enable_x64`.

MXU note: jnp matmul/conv default to bf16 multiplication on TPU.  To meet the
reference's FP32 conformance tolerance (atol 2e-4; pyxu_tests/conftest.py:44-54)
the library sets ``jax_default_matmul_precision=highest`` on import; benches
may locally relax it for speed via ``lowered_matmul_precision``.
"""

from __future__ import annotations

import contextlib
import enum
import threading

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Width",
    "CWidth",
    "Precision",
    "default_fdtype",
    "default_cdtype",
    "set_default_width",
    "enable_x64",
    "lowered_matmul_precision",
    "coerce",
    "enforce_precision",
    "EnforcePrecision",
    "getPrecision",
    "getCoerceState",
    "atol_for",
]


class Width(enum.Enum):
    """Real floating-point widths (reference: runtime/_runtime.py:24-44)."""

    HALF = np.dtype(jnp.bfloat16)
    SINGLE = np.dtype(np.float32)
    DOUBLE = np.dtype(np.float64)

    @property
    def complex(self) -> "CWidth":
        if self is Width.DOUBLE:
            return CWidth.DOUBLE
        return CWidth.SINGLE

    @property
    def eps(self) -> float:
        return float(jnp.finfo(self.value).eps)


class CWidth(enum.Enum):
    """Complex floating-point widths (reference: runtime/_runtime.py:47-64)."""

    SINGLE = np.dtype(np.complex64)
    DOUBLE = np.dtype(np.complex128)

    @property
    def real(self) -> Width:
        return Width.SINGLE if self is CWidth.SINGLE else Width.DOUBLE


_state = threading.local()


def _width() -> Width:
    return getattr(_state, "width", Width.SINGLE)


def set_default_width(width: Width) -> None:
    _state.width = width


def default_fdtype() -> np.dtype:
    """Default real dtype for newly built operators/arrays."""
    return _width().value


def default_cdtype() -> np.dtype:
    """Default complex dtype (paired with :func:`default_fdtype`)."""
    return _width().complex.value


class Precision(contextlib.AbstractContextManager):
    """Scoped default-precision override (reference: runtime/_runtime.py:67-99).

    >>> with Precision(Width.DOUBLE):
    ...     op = SquaredL2Norm(dim_shape=(8,))   # built with float64 defaults
    """

    def __init__(self, width: Width = Width.SINGLE):
        self._width = width
        self._prev = None

    def __enter__(self):
        self._prev = _width()
        set_default_width(self._width)
        return self

    def __exit__(self, *exc):
        set_default_width(self._prev)
        return False


def enable_x64() -> None:
    """Turn on float64 support process-wide (must run before tracing)."""
    jax.config.update("jax_enable_x64", True)


@contextlib.contextmanager
def lowered_matmul_precision(precision: str = "default"):
    """Locally relax matmul precision (e.g. bf16 MXU passes) for speed."""
    with jax.default_matmul_precision(precision):
        yield


def getPrecision() -> Width:
    """Current default width (reference `getPrecision`,
    runtime/_runtime.py:248-252)."""
    return _width()


def getCoerceState() -> bool:
    """Whether :func:`coerce` currently casts (reference `getCoerceState`,
    runtime/_runtime.py:255-259)."""
    return getattr(_state, "coerce", True)


class EnforcePrecision(contextlib.AbstractContextManager):
    """Scoped toggle of precision coercion (reference `EnforcePrecision`,
    runtime/_runtime.py:102-136): inside ``EnforcePrecision(False)`` blocks,
    :func:`coerce` and ``@enforce_precision``-wrapped methods pass arrays
    through unchanged."""

    def __init__(self, state: bool = True):
        self._new = bool(state)
        self._prev = None

    def __enter__(self):
        self._prev = getCoerceState()
        _state.coerce = self._new
        return self

    def __exit__(self, *exc):
        _state.coerce = self._prev
        return False


def coerce(arr):
    """Cast an array to the current default width (reference
    `coerce`, runtime/_runtime.py:213-245): floats -> default_fdtype,
    complex -> default_cdtype, integers/bools promoted to the real width.
    A no-op inside ``EnforcePrecision(False)`` scopes."""
    arr = jnp.asarray(arr)
    if not getCoerceState():
        return arr
    if jnp.issubdtype(arr.dtype, jnp.complexfloating):
        return arr.astype(default_cdtype())
    return arr.astype(default_fdtype())


def enforce_precision(i=(), o: bool = True):
    """Decorator coercing chosen arguments (by name) and the output to the
    active precision (reference `@enforce_precision`,
    runtime/_runtime.py:139-200).  Inside jit the casts trace to no-ops when
    dtypes already match.

    >>> @enforce_precision(i="arr")
    ... def apply(self, arr): ...
    """
    import functools
    import inspect as _inspect

    names = (i,) if isinstance(i, str) else tuple(i)

    def deco(fn):
        sig = _inspect.signature(fn)

        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            ba = sig.bind(*args, **kwargs)
            for n in names:
                if n in ba.arguments and ba.arguments[n] is not None:
                    ba.arguments[n] = coerce(ba.arguments[n])
            out = fn(*ba.args, **ba.kwargs)
            return coerce(out) if o else out

        return wrapped

    return deco


def atol_for(dtype) -> float:
    """Conformance tolerance per dtype (reference: pyxu_tests/conftest.py:44-54)."""
    dtype = np.dtype(dtype)
    return {
        np.dtype(jnp.bfloat16): 1e-2,
        np.dtype(np.float32): 2e-4,
        np.dtype(np.float64): 1e-8,
        np.dtype(np.complex64): 2e-4,
        np.dtype(np.complex128): 1e-8,
    }[dtype]


# FP32 conformance by default: see module docstring.
jax.config.update("jax_default_matmul_precision", "highest")
