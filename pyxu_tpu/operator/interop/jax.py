"""Wrap JAX callables as operators.

Reference: src/pyxu/operator/interop/jax.py:106-246 (`from_jax`): wraps JAX
functions with missing methods auto-derived via autodiff (grad→``jax.grad``,
adjoint→``jax.vjp``) and dlpack zero-copy.

In this framework JAX *is* the native substrate, so the bridge is thin:
``from_jax == from_source`` plus the autodiff defaults already built into the
class tower (``LinOp.adjoint`` via ``jax.linear_transpose``,
``DiffFunc.grad`` via ``jax.grad``, ``DiffMap.jacobian`` via JVP/VJP —
abc/operator.py).  No copies, no conversion.
"""

from __future__ import annotations

from pyxu_tpu.operator.interop.source import from_source

__all__ = ["from_jax"]


def from_jax(cls, dim_shape, codim_shape=None, vectorize=(), jit: bool = False,
             **kwargs):
    """Build an operator of class ``cls`` from JAX callables.

    ``jit=True`` wraps each callable in ``jax.jit`` (the reference offers the
    same toggle); inside solver loops everything is jitted anyway.
    """
    if jit:
        import jax as _jax
        # only array-in/array-out methods can be jitted: svdvals/trace/
        # estimate_lipschitz/pinv/asarray take int/str/dtype kwargs that
        # would be traced (k used as a shape -> TypeError)
        _jittable = {"apply", "adjoint", "grad", "prox", "jacobian"}
        kwargs = {
            k: (_jax.jit(v) if callable(v) and k in _jittable else v)
            for k, v in kwargs.items()
        }
    return from_source(cls, dim_shape, codim_shape, vectorize=vectorize, **kwargs)
