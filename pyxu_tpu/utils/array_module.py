"""Backend-generic array helpers.

Reference: src/pyxu/util/array_module.py:20-254 (`get_array_module`,
`compute`, `to_NUMPY`, `redirect`, `copy_if_unsafe`, `read_only`).  The
reference juggles four array backends; here there is exactly one (jax.Array),
so several helpers collapse to their honest TPU meanings — kept because user
code written against the reference's vocabulary should port line-for-line.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "get_array_module",
    "compute",
    "to_numpy",
    "copy_if_unsafe",
    "read_only",
    "redirect",
]


def get_array_module(arr=None):
    """The active array namespace — always ``jax.numpy``
    (reference: array_module.py:20-49 dispatches over numpy/cupy/dask)."""
    return jnp


def compute(*arrs, mode: str = "compute"):
    """Materialise pending computation (reference: array_module.py:52-82
    calls dask compute/persist).  On TPU dispatch is async — this blocks
    until the given arrays are ready and returns them."""
    out = tuple(jax.block_until_ready(jnp.asarray(a)) for a in arrs)
    return out[0] if len(out) == 1 else out


def to_numpy(arr):
    """Device -> host copy (reference `to_NUMPY`, array_module.py:85-114).

    NOTE: on tunneled TPU backends this transfer can be very slow for large
    arrays — prefer keeping results on device."""
    return np.asarray(jax.device_get(arr))


def copy_if_unsafe(arr):
    """jax arrays are immutable: in-place aliasing hazards (the reason for
    the reference's defensive copies, array_module.py:194-225) cannot occur.
    Returns the input unchanged."""
    return jnp.asarray(arr)


def read_only(arr):
    """jax arrays are already immutable (reference: array_module.py:228-254
    sets writeable=False on numpy views).  Returns the input unchanged."""
    return jnp.asarray(arr)


def redirect(**target_fns):
    """Decorator: dispatch to an alternative implementation by array type
    (reference: array_module.py:117-191).  With a single backend this keeps
    only the NUMPY/JAX split: host numpy arrays can take a specialised
    host implementation, everything else uses the decorated function.

    >>> @redirect(NUMPY=my_host_impl)
    ... def f(arr): ...
    """

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(arr, *a, **kw):
            if isinstance(arr, np.ndarray) and "NUMPY" in target_fns:
                return target_fns["NUMPY"](arr, *a, **kw)
            return fn(arr, *a, **kw)
        return wrapped

    return deco
