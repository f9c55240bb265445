"""Batching helpers.

Reference: src/pyxu/util/operator.py:21-269 implements `vectorize` with three
Dask strategies to map an unbatched callable over stacking dims.  On TPU the
idiomatic equivalent is `jax.vmap` composed over however many leading batch
axes the input carries; everything fuses under jit, so no scheduler knobs are
needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["batched_over", "flatten_batch", "unflatten_batch", "vectorize"]


def flatten_batch(arr, core_ndim: int):
    """Collapse all leading batch axes into one; returns (arr2, batch_shape)."""
    arr = jnp.asarray(arr)
    if core_ndim == 0:
        batch_shape = arr.shape
        return arr.reshape((-1,) if arr.size else (0,)), batch_shape
    batch_shape = arr.shape[: arr.ndim - core_ndim]
    core_shape = arr.shape[arr.ndim - core_ndim :]
    return arr.reshape((-1,) + core_shape), batch_shape


def unflatten_batch(arr, batch_shape: tuple):
    """Inverse of :func:`flatten_batch` on the result's leading axis."""
    return arr.reshape(tuple(batch_shape) + arr.shape[1:])


def batched_over(fn, core_ndim: int):
    """Lift ``fn`` (defined on a single ``core_ndim``-rank sample) to accept
    arbitrary leading batch dims, via vmap over a flattened batch axis.
    """

    def wrapped(arr, *args, **kwargs):
        arr = jnp.asarray(arr)
        if arr.ndim < core_ndim:
            raise ValueError(
                f"input rank {arr.ndim} < core rank {core_ndim}")
        n_batch = arr.ndim - core_ndim
        if n_batch == 0:
            return fn(arr, *args, **kwargs)
        flat, batch_shape = flatten_batch(arr, core_ndim)
        out = jax.vmap(lambda a: fn(a, *args, **kwargs))(flat)
        return unflatten_batch(out, batch_shape)

    return wrapped


def vectorize(i: str, method: str = "scan", codim: int = None):
    """Decorator: auto-vectorize an array function over stacking dims of
    parameter ``i`` (reference ``pyxu.util.vectorize``,
    util/operator.py:37-124).

    The reference offers three Dask scheduling strategies; on TPU the
    distinctions collapse — ``scan`` maps to :func:`jax.lax.map`-free
    ``vmap`` (fused, parallel under jit) and the two Dask modes are
    accepted aliases.  ``codim`` is accepted for signature compatibility
    (output shape is inferred by tracing, so it is never needed).

    The wrapped function must map a 1-D core input to a 1-D core output
    (the reference's Property-API contract); leading axes are batched.
    """
    import functools as _functools
    import inspect as _inspect

    method = method.strip().lower()
    if method not in ("scan", "scan_dask", "parallel"):
        raise ValueError(f"Unknown vectorization method '{method}'.")

    def decorator(func):
        sig = _inspect.signature(func)
        if i not in sig.parameters:
            raise ValueError(
                f"Parameter[{i}] not part of {func.__qualname__}() "
                f"parameter list.")

        @_functools.wraps(func)
        def wrapper(*args, **kwargs):
            bound = sig.bind(*args, **kwargs)
            bound.apply_defaults()
            x = jnp.asarray(bound.arguments.pop(i))
            rest = bound.arguments

            def f1(xi):
                return func(**{i: xi, **rest})

            *sh, dim = x.shape
            flat = x.reshape((-1, dim))
            out = jax.vmap(f1)(flat)
            return out.reshape(tuple(sh) + (-1,))

        return wrapper

    return decorator
