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

__all__ = ["batched_over", "flatten_batch", "unflatten_batch"]


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
