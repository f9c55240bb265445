"""Wrap PyTorch callables as operators.

Reference: src/pyxu/operator/interop/torch.py:53-185 (`from_torch`,
`_FromTorch.op()` pipeline `_infer_missing -> _compile -> _auto_vectorize ->
_interface`): missing methods derived via ``torch.func`` (vmap/grad/vjp),
zero-copy NumPy<->Torch.

TPU design: torch runs host-side (CPU wheel) — calls cross the device
boundary through ``jax.pure_callback``, so a torch-backed operator composes
and jits like any other (XLA stages a host callback).  Gradients/adjoints are
derived with ``torch.func.grad`` / ``torch.func.vjp`` before wrapping, so
autodiff happens in torch on the host, exactly like the reference.
"""

from __future__ import annotations

import numpy as np

from pyxu_tpu.operator.interop.source import from_source
from pyxu_tpu.utils.misc import as_canonical_shape

__all__ = ["from_torch"]


def _require_torch():
    try:
        import torch  # noqa: F401
        import torch.func  # noqa: F401
        return torch
    except ImportError as e:  # pragma: no cover
        raise ImportError("from_torch requires PyTorch") from e


def _callback(torch_fn, out_shape, out_dtype_of):
    """Host-callback wrapper: jnp array(s) -> numpy -> torch -> numpy."""
    import jax
    import jax.numpy as jnp
    torch = _require_torch()

    def host(arr):
        t = torch.from_numpy(np.ascontiguousarray(arr))
        with torch.no_grad():
            out = torch_fn(t)
        return np.asarray(out.detach().cpu().numpy())

    def fn(arr):
        arr = jnp.asarray(arr)
        batch = arr.shape[: arr.ndim - fn._in_rank]
        res = jax.ShapeDtypeStruct(tuple(batch) + tuple(out_shape), arr.dtype)
        return jax.pure_callback(host, res, arr, vmap_method="sequential")

    return fn


def from_torch(cls, dim_shape, codim_shape=None, vectorize=(),
               infer_missing: bool = True, **kwargs):
    """Build an operator of class ``cls`` from torch callables
    (``apply=``, optionally ``grad=``, ``adjoint=``, ``prox=``).

    Torch callables take/return ``torch.Tensor`` and must be batched over
    leading axes (use ``torch.func.vmap`` otherwise — mirrors the
    reference's `_auto_vectorize`, torch.py:151-185).
    """
    torch = _require_torch()
    from pyxu_tpu.abc.operator import Property

    dim_shape = as_canonical_shape(dim_shape)
    if Property.FUNCTIONAL in cls.properties():
        codim_shape = ()
    codim = as_canonical_shape(codim_shape) if codim_shape is not None else None
    t_apply = kwargs.pop("apply", None)
    assert t_apply is not None, "from_torch requires apply="

    methods = {}
    # --- infer missing methods in torch-land (reference: torch.py:106-150)
    if infer_missing:
        props = cls.properties()
        if Property.DIFFERENTIABLE_FUNCTION in props and "grad" not in kwargs:
            tg = torch.func.grad(lambda x: t_apply(x).sum())
            kwargs["grad"] = tg
        if Property.LINEAR in props and "adjoint" not in kwargs:
            def t_adjoint(y, _f=t_apply):
                x0 = torch.zeros(dim_shape, dtype=y.dtype)
                _, vjp_fn = torch.func.vjp(_f, x0)
                return vjp_fn(y)[0]
            kwargs["adjoint"] = t_adjoint

    # --- wrap every torch callable as a host callback
    ap = _callback(t_apply, codim, None)
    ap._in_rank = len(dim_shape)
    methods["apply"] = ap
    if "grad" in kwargs:
        g = _callback(kwargs["grad"], dim_shape, None)
        g._in_rank = len(dim_shape)
        methods["grad"] = g
    if "adjoint" in kwargs:
        adj = _callback(kwargs["adjoint"], dim_shape, None)
        adj._in_rank = len(codim)
        methods["adjoint"] = adj
    if "prox" in kwargs:
        t_prox = kwargs["prox"]

        def prox(arr, tau):
            p = _callback(lambda t: t_prox(t, float(tau)), dim_shape, None)
            p._in_rank = len(dim_shape)
            return p(arr)

        methods["prox"] = prox

    return from_source(cls, dim_shape, codim_shape, **methods)
