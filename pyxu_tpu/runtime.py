"""Reference-compatible ``pyxu.runtime`` namespace.

The reference exposes its precision machinery as ``pyxu.runtime``
(``src/pyxu/runtime/_runtime.py:24-263``: ``Width``/``CWidth`` enums, the
``Precision``/``EnforcePrecision`` context managers, the
``enforce_precision`` decorator, ``coerce``, ``getPrecision`` and
``getCoerceState``).  Our implementation lives in
:mod:`pyxu_tpu.info.dtypes` (dtype policy instead of global mutable
state, see that module); this shim re-exports it under the reference's
module path so ``import pyxu_tpu.runtime as pxrt`` ports verbatim.
"""

from pyxu_tpu.info.dtypes import (  # noqa: F401
    CWidth,
    EnforcePrecision,
    Precision,
    Width,
    atol_for,
    coerce,
    default_cdtype,
    default_fdtype,
    enable_x64,
    enforce_precision,
    getCoerceState,
    getPrecision,
    set_default_width,
)

__all__ = [
    "Width",
    "CWidth",
    "Precision",
    "EnforcePrecision",
    "enforce_precision",
    "coerce",
    "getPrecision",
    "getCoerceState",
    "default_fdtype",
    "default_cdtype",
    "set_default_width",
    "enable_x64",
    "atol_for",
]
