"""Bijections C^N <-> R^(N x 2).

Reference: src/pyxu/util/complex.py:13-322.  The reference interleaves
real/imag on a *doubled last axis* (C^N <-> R^{2N}); here we use a trailing
axis of size 2 instead — it maps onto TPU lanes without a strided gather and
plays well with multi-dimensional ``dim_shape``s.  ``view_as_real(z)`` of a
``(..., *sh)`` complex array is a ``(..., *sh, 2)`` real array.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["view_as_real", "view_as_complex", "real_dtype", "complex_dtype"]


def real_dtype(cdtype) -> np.dtype:
    return np.dtype({
        np.dtype(np.complex64): np.float32,
        np.dtype(np.complex128): np.float64,
    }[np.dtype(cdtype)])


def complex_dtype(fdtype) -> np.dtype:
    table = {
        np.dtype(np.float32): np.complex64,
        np.dtype(np.float64): np.complex128,
        np.dtype(jnp.bfloat16): np.complex64,  # promote: no complex-bf16
        np.dtype(np.float16): np.complex64,
    }
    fdtype = np.dtype(fdtype)
    if fdtype not in table:
        raise ValueError(f"no complex counterpart for dtype {fdtype}")
    return np.dtype(table[fdtype])


def view_as_real(z):
    """C^sh -> R^(sh, 2) (reference: util/complex.py:69-142)."""
    z = jnp.asarray(z)
    if not jnp.iscomplexobj(z):
        raise ValueError("view_as_real expects a complex array")
    return jnp.stack([z.real, z.imag], axis=-1)


def view_as_complex(x):
    """R^(sh, 2) -> C^sh (reference: util/complex.py:13-68)."""
    x = jnp.asarray(x)
    if jnp.iscomplexobj(x) or x.shape[-1] != 2:
        raise ValueError("view_as_complex expects a real array with trailing axis 2")
    return (x[..., 0] + 1j * x[..., 1]).astype(complex_dtype(x.dtype))
