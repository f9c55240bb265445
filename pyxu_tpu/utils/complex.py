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

__all__ = [
    "view_as_real", "view_as_complex", "real_dtype", "complex_dtype",
    "view_as_real_mat", "view_as_complex_mat",
]


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
    """C^sh -> R^(sh, 2) (reference: util/complex.py:69-142).

    Host (numpy) inputs are converted host-side: an EAGER complex device
    transfer / complex arithmetic is UNIMPLEMENTED on some TPU runtimes
    (axon) and poisons the client (CLAUDE.md), and this is the designated
    boundary utility for exactly that conversion."""
    import jax as _jax
    if not isinstance(z, _jax.Array):
        zn = np.asarray(z)
        if not np.iscomplexobj(zn):
            raise ValueError("view_as_real expects a complex array")
        return jnp.asarray(np.stack([zn.real, zn.imag], axis=-1))
    if not jnp.iscomplexobj(z):
        raise ValueError("view_as_real expects a complex array")
    return jnp.stack([z.real, z.imag], axis=-1)


def view_as_complex(x):
    """R^(sh, 2) -> C^sh (reference: util/complex.py:13-68).

    NOTE: forming a complex device array is only safe inside jit on some
    TPU runtimes; host inputs return a host numpy complex array."""
    import jax as _jax
    if not isinstance(x, _jax.Array):
        xn = np.asarray(x)
        if np.iscomplexobj(xn) or xn.shape[-1] != 2:
            raise ValueError(
                "view_as_complex expects a real array with trailing axis 2")
        return (xn[..., 0] + 1j * xn[..., 1]).astype(complex_dtype(xn.dtype))
    if jnp.iscomplexobj(x) or x.shape[-1] != 2:
        raise ValueError("view_as_complex expects a real array with trailing axis 2")
    return (x[..., 0] + 1j * x[..., 1]).astype(complex_dtype(x.dtype))


def view_as_real_mat(cmat, real_input: bool = False, real_output: bool = False):
    r"""Real block form of a complex matrix (reference `view_as_real_mat`,
    util/complex.py:143-233): A in C^{MxN} maps to Ahat in R^{2Mx2N} with
    2x2 blocks [[Re, -Im], [Im, Re]], so that

        view_as_real(A @ x).ravel() == view_as_real_mat(A) @ view_as_real(x).ravel()

    (the trailing-axis-2 real view raveled is exactly the reference's
    interleaved layout).  ``real_input``/``real_output`` drop the imaginary
    columns/rows.  Real matrices pass through unchanged."""
    cmat = jnp.asarray(cmat)
    assert cmat.ndim == 2, f"expected 2-D, got {cmat.ndim}-D"
    if not jnp.issubdtype(cmat.dtype, jnp.complexfloating):
        return cmat
    M, N = cmat.shape
    # (M, 2, N, 2) block tensor -> (2M, 2N)
    blk = jnp.stack([
        jnp.stack([cmat.real, -cmat.imag], axis=-1),
        jnp.stack([cmat.imag, cmat.real], axis=-1),
    ], axis=1)  # (M, 2, N, 2)
    rmat = blk.reshape(2 * M, 2 * N)
    if real_input:
        rmat = rmat[:, ::2]
    if real_output:
        rmat = rmat[::2, :]
    return rmat


def view_as_complex_mat(rmat, real_input: bool = False, real_output: bool = False):
    """Inverse of :func:`view_as_real_mat` (reference `view_as_complex_mat`,
    util/complex.py:234-322).  Complex matrices pass through unchanged."""
    rmat = jnp.asarray(rmat)
    assert rmat.ndim == 2, f"expected 2-D, got {rmat.ndim}-D"
    if jnp.issubdtype(rmat.dtype, jnp.complexfloating):
        return rmat
    if real_input and real_output:
        return rmat.astype(complex_dtype(rmat.dtype))
    if real_input:       # imaginary columns were dropped: Re/Im live on rows
        return rmat[::2, :] + 1j * rmat[1::2, :]
    if real_output:      # imaginary rows were dropped: Im on odd cols, negated
        return rmat[:, ::2] - 1j * rmat[:, 1::2]
    return rmat[::2, ::2] + 1j * rmat[1::2, ::2]
