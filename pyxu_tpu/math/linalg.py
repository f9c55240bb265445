"""Spectral machinery: power iteration, subspace-iteration SVD, traces.

TPU-native replacements for the reference's ARPACK/cuSOLVER paths
(reference: src/pyxu/abc/operator.py:1440-1579 `estimate_lipschitz/svdvals`,
src/pyxu/math/linalg.py:14-117 `norm/trace/hutchpp`).  Everything here is a
fixed-iteration jax program (static shapes, `fori_loop`) so it compiles once
and runs device-resident; results are pulled to host only by the caller.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pyxu_tpu.info.dtypes import default_fdtype

__all__ = ["spectral_norm", "svdvals", "trace", "hutchpp", "norm"]


def _op_dtype(op, dtype):
    """Working dtype: explicit ``dtype``, else the widest floating dtype among
    the operator's array leaves (falls back to the global default)."""
    if dtype is not None:
        return np.dtype(dtype)
    dts = [l.dtype for l in jax.tree_util.tree_leaves(op)
           if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]
    return np.dtype(jnp.result_type(default_fdtype(), *dts)) if dts \
        else np.dtype(default_fdtype())


def _flat_apply(op, core_shape):
    """Lift op.apply to matrices of flattened probe columns: (m, N) -> (m, M)."""
    def fn(V):  # V: (m, prod(core_shape))
        X = V.reshape((V.shape[0],) + tuple(core_shape))
        Y = op.apply(X)
        return Y.reshape(V.shape[0], -1)
    return fn


def spectral_norm(op, key=None, maxiter: int = 64, dtype=None) -> float:
    """||op||_2 via power iteration on the Gram operator.

    Replaces the reference's svds(k=1) ARPACK call
    (abc/operator.py:1509-1579).  Fixed iteration count keeps the program
    shape-static; 64 Gram applies give ~1e-3 relative accuracy for the
    well-separated spectra typical of imaging operators.
    """
    dtype = _op_dtype(op, dtype)
    key = jax.random.PRNGKey(17) if key is None else key
    gram = op.gram()

    @jax.jit
    def run(key):
        v = jax.random.normal(key, op.dim_shape, dtype=dtype)
        v = v / jnp.linalg.norm(v.ravel())

        def body(_, v):
            w = gram.apply(v).astype(dtype)  # carry dtype must stay fixed
            return w / jnp.maximum(jnp.linalg.norm(w.ravel()), jnp.finfo(dtype).tiny)

        v = jax.lax.fori_loop(0, maxiter, body, v)
        w = gram.apply(v)
        lam = jnp.vdot(v.ravel(), w.ravel())
        return jnp.sqrt(jnp.maximum(lam, 0.0))

    return float(run(key))


def svdvals(op, k: int = 1, key=None, maxiter: int = 96, dtype=None):
    """Top-k singular values (descending) via subspace iteration + QR on the
    Gram operator (replaces ARPACK svds; reference abc/operator.py:1509-1579).
    """
    dtype = _op_dtype(op, dtype)
    key = jax.random.PRNGKey(19) if key is None else key
    n = op.dim_size
    k = min(k, n)
    gram_flat = _flat_apply(op.gram(), op.dim_shape)

    @jax.jit
    def run(key):
        V = jax.random.normal(key, (k, n), dtype=dtype)  # rows = probes
        V, _ = jnp.linalg.qr(V.T)  # (n, k) orthonormal columns

        def body(_, V):
            W = gram_flat(V.T).T.astype(dtype)  # (n, k); carry dtype fixed
            Q, _ = jnp.linalg.qr(W)
            return Q

        V = jax.lax.fori_loop(0, maxiter, body, V)
        B = gram_flat(V.T).T  # (n, k)
        H = V.T @ B  # (k, k) ~ V^T A^T A V
        lam = jnp.linalg.eigvalsh((H + H.T) / 2)
        # ascending order — the reference's svds contract
        # (abc/operator.py:1509-1579 documents ascending; scipy returns so)
        return jnp.sqrt(jnp.maximum(lam, 0.0))

    return run(key)


def trace(op, dtype=None, block: int = 2048):
    """Exact trace by basis probing in fixed-size blocks (reference:
    math/linalg.py:25-59; blocked so image-scale operators never
    materialise an n x n identity)."""
    if op.dim_size != op.codim_size:
        raise ValueError(
            f"trace requires a square operator, got dim {op.dim_size} != "
            f"codim {op.codim_size}")
    dtype = _op_dtype(op, dtype)
    n = op.dim_size
    flat = _flat_apply(op, op.dim_shape)
    c = min(block, n)

    @jax.jit
    def run_block(i0):
        rows = jnp.arange(c)
        E = jnp.zeros((c, n), dtype).at[rows, i0 + rows].set(1.0)
        Y = flat(E)  # (c, n): row j = A e_{i0+j}
        # only in-range rows contribute (the tail block may overhang)
        diag = Y[rows, i0 + rows]
        valid = (i0 + rows) < n
        return jnp.sum(jnp.where(valid, diag, 0.0))

    total = 0.0
    for i0 in range(0, n, c):
        total += float(run_block(jnp.asarray(i0)))
    return jnp.asarray(total, dtype)


def hutchpp(op, m: int = 126, key=None, dtype=None):
    """Hutch++ stochastic trace estimator (reference: math/linalg.py:62-117,
    default m=126 when called from estimate_lipschitz).

    tr(A) ~= tr(Q^T A Q) + (3/m) tr(G^T (I-QQ^T) A (I-QQ^T) G),
    Q = qr(A S), S/G Rademacher probes of m/3 columns each.
    """
    dtype = _op_dtype(op, dtype)
    key = jax.random.PRNGKey(23) if key is None else key
    n = op.dim_size
    c = max(min(m // 3, n), 1)
    flat = _flat_apply(op, op.dim_shape)

    @jax.jit
    def run(key):
        kS, kG = jax.random.split(key)
        S = jax.random.rademacher(kS, (n, c), dtype=dtype)
        G = jax.random.rademacher(kG, (n, c), dtype=dtype)
        AS = flat(S.T).T  # (n, c)
        Q, _ = jnp.linalg.qr(AS)
        AQ = flat(Q.T).T
        t1 = jnp.trace(Q.T @ AQ)
        Gp = G - Q @ (Q.T @ G)
        AGp = flat(Gp.T).T
        PAGp = AGp - Q @ (Q.T @ AGp)
        t2 = jnp.trace(Gp.T @ PAGp) / c
        return t1 + t2

    return run(key)


def norm(arr, **kwargs):
    """Convenience wrapper (reference: math/linalg.py:14-22)."""
    return jnp.linalg.norm(jnp.asarray(arr).ravel(), **kwargs)
