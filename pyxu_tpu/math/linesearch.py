"""Armijo backtracking line search, batched + jit-compatible.

Reference: src/pyxu/math/linesearch.py:19-94 (`backtracking_linesearch`,
mask-refine loop :90-94).  The reference loops host-side shrinking only the
still-violating batch elements; here the same mask-refinement runs as a
``lax.while_loop`` with a hard iteration cap so it folds into jitted solver
steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["backtracking_linesearch"]

LINESEARCH_DEFAULT_R = 0.5
LINESEARCH_DEFAULT_C = 1e-4


def backtracking_linesearch(f, x, direction, gradient=None, a0: float = None,
                            r: float = LINESEARCH_DEFAULT_R,
                            c: float = LINESEARCH_DEFAULT_C,
                            maxiter: int = 30, core_ndim: int = None):
    r"""Find step ``a`` with f(x + a d) <= f(x) + c a <∇f(x), d> (batched).

    Parameters mirror the reference; ``f`` is a DiffFunc-like object with
    ``apply``/``grad``.  ``a0=None`` auto-sets 1/diff_lipschitz like the
    reference (linesearch.py:62-64; falls back to 1.0 when the constant is
    unknown/infinite).  Returns per-batch-element step sizes shaped like
    ``f.apply(x)``.
    """
    import math as _math
    if a0 is None:
        dl = getattr(f, "diff_lipschitz", _math.inf)
        try:
            dl = float(dl)
        except Exception:
            dl = _math.inf
        a0 = 1.0 / dl if _math.isfinite(dl) and dl > 0 else 1.0
    x = jnp.asarray(x)
    d = jnp.asarray(direction)
    core_ndim = (len(f.dim_shape) if core_ndim is None else core_ndim)
    axes = tuple(range(x.ndim - core_ndim, x.ndim))
    g = f.grad(x) if gradient is None else jnp.asarray(gradient)
    f0 = f.apply(x)
    slope = c * jnp.sum(g * d, axis=axes)

    a_init = jnp.full_like(f0, a0)
    fa_init = f.apply(x + _bc(a_init, core_ndim) * d)

    def cond(carry):
        a, fa, k = carry
        bad = ~(fa <= f0 + a * slope)   # True for NaN oversteps too
        return jnp.logical_and(jnp.any(bad), k < maxiter)

    def body(carry):
        a, fa, k = carry
        bad = ~(fa <= f0 + a * slope)
        a = jnp.where(bad, r * a, a)
        fa = f.apply(x + _bc(a, core_ndim) * d)  # one eval per shrink
        return a, fa, k + 1

    a, _, _ = jax.lax.while_loop(cond, body, (a_init, fa_init, 0))
    return a


def _bc(a, core_ndim: int):
    return a.reshape(a.shape + (1,) * core_ndim)
