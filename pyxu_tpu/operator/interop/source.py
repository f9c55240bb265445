"""Build operators from plain callables.

Reference: src/pyxu/operator/interop/source.py:15-262 (`from_source`) — the
backbone used by the reference to synthesize most of its operator library.
The reference binds callables with ``types.MethodType`` onto a bare instance;
here a composite class ``Source[<cls>]`` holds the callables as static aux
attributes so the resulting operator is still a well-formed pytree (callables
that close over jnp arrays keep working under jit — the closed-over arrays
become trace constants).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from pyxu_tpu.abc.operator import Operator
from pyxu_tpu.utils.misc import as_canonical_shape

__all__ = ["from_source"]

_FORWARDABLE = (
    "apply", "adjoint", "grad", "prox", "jacobian", "_quad_spec",
    "estimate_lipschitz", "estimate_diff_lipschitz", "pinv", "trace",
    "svdvals", "asarray",
)


class SourceMixin:
    """Delegates arithmetic methods to user callables stored on the instance.

    Callables live in ``_method_items`` — a sorted tuple of (name, fn) pairs,
    hashable so Source operators remain valid jit arguments (pytree aux must
    be hashable)."""

    @property
    def _methods(self):
        return dict(self._method_items)

    def _src(self, name):
        fn = self._methods.get(name)
        if fn is None:
            raise NotImplementedError(f"{self._name}.{name} not provided")
        return fn

    def apply(self, arr):
        return self._src("apply")(jnp.asarray(arr))

    def adjoint(self, arr):
        fn = self._methods.get("adjoint")
        if fn is None:  # exact default via linear transpose (LinOp classes)
            return super().adjoint(arr)
        return fn(jnp.asarray(arr))

    def grad(self, arr):
        fn = self._methods.get("grad")
        if fn is None:
            qs = self._methods.get("_quad_spec")
            if qs is not None:
                # derive from the quadratic spec like the reference
                # (source.py:15-148 forwards _quad_spec; QuadraticFunc
                # grad = Qx + c): the Source instance has no _Q/_c state
                Q, c, _ = qs()
                return Q.apply(jnp.asarray(arr)) + c.grad(jnp.asarray(arr))
            return super().grad(arr)
        return fn(jnp.asarray(arr))

    def prox(self, arr, tau):
        fn = self._methods.get("prox")
        if fn is None:
            qs = self._methods.get("_quad_spec")
            if qs is not None:
                # prox of (1/2)<x,Qx>+<c,x>+t via the QuadraticFunc CG path
                from pyxu_tpu.abc.operator import QuadraticFunc
                Q, c, t = qs()
                qf = QuadraticFunc(self.dim_shape, Q=Q, c=c, t=t)
                return qf.prox(arr, tau)
            raise NotImplementedError(f"{self._name}.prox not provided")
        return fn(jnp.asarray(arr), tau)

    def jacobian(self, arr):
        fn = self._methods.get("jacobian")
        if fn is None:
            return super().jacobian(arr)
        return fn(jnp.asarray(arr))

    def _quad_spec(self):
        fn = self._methods.get("_quad_spec")
        if fn is None:
            return super()._quad_spec()
        return fn()

    def pinv(self, arr, damp: float = 0.0, **kw):
        fn = self._methods.get("pinv")
        if fn is None:
            return super().pinv(arr, damp=damp, **kw)
        return fn(arr, damp=damp, **kw)

    def trace(self, **kw):
        fn = self._methods.get("trace")
        if fn is None:
            return super().trace(**kw)
        return fn(**kw)

    def svdvals(self, k: int = 1, **kw):
        fn = self._methods.get("svdvals")
        if fn is None:
            return super().svdvals(k=k, **kw)
        return fn(k=k, **kw)

    def asarray(self, dtype=None):
        fn = self._methods.get("asarray")
        if fn is None:
            return super().asarray(dtype=dtype)
        return fn(dtype=dtype)

    def estimate_lipschitz(self, **kw):
        fn = self._methods.get("estimate_lipschitz")
        if fn is None:
            return super().estimate_lipschitz(**kw)
        L = fn(**kw)
        self._lipschitz = L
        return L

    def estimate_diff_lipschitz(self, **kw):
        fn = self._methods.get("estimate_diff_lipschitz")
        if fn is None:
            return super().estimate_diff_lipschitz(**kw)
        dL = fn(**kw)
        self._diff_lipschitz = dL
        return dL

    def _expr(self):
        return (self._name,)


def _coerced(fn):
    """Wrap a user callable so array args/outputs follow the active width."""
    from pyxu_tpu.info.dtypes import coerce

    @functools.wraps(fn)
    def wrapped(*args, **kw):
        args = tuple(coerce(a) if hasattr(a, "dtype") or isinstance(a, float)
                     else a for a in args)
        out = fn(*args, **kw)
        return coerce(out) if hasattr(out, "dtype") else out

    return wrapped


@functools.cache
def _source_class(klass: type) -> type:
    return type(f"Source[{klass.__name__}]", (SourceMixin, klass), {})


def from_source(cls, dim_shape, codim_shape=None, vectorize=(), embed=None,
                enforce_precision=(), **kwargs) -> Operator:
    """Create an operator of class ``cls`` from plain callables.

    Parameters (reference: source.py:15-148)
    ----------
    cls: target operator class (Map ... LinOp ... ProxFunc ...).
    dim_shape / codim_shape: operator shapes (codim () for functionals).
    vectorize: names of provided callables written for single (unbatched)
        inputs — they are auto-vectorized over leading batch axes with vmap
        (the reference's `vectorize` kwarg, source.py:60-96).
    embed: optional dict of (attribute, value) pairs attached verbatim to the
        created operator (reference's `embed`, source.py:18,33-36).  Values
        become static pytree aux — keep them hashable if the operator will be
        passed as a jit argument.
    enforce_precision: names of provided callables whose array inputs and
        output should be coerced to the active precision width (reference's
        `enforce_precision` kwarg, source.py:19; runtime/_runtime.py:139-200).
        Under jit the casts are no-ops when dtypes already match.
    kwargs: ``apply=..., adjoint=..., grad=..., prox=..., jacobian=...,
        _quad_spec=..., estimate_lipschitz=...`` plus optional constants
        ``lipschitz=float, diff_lipschitz=float``.
    """
    from pyxu_tpu.abc.operator import Property
    from pyxu_tpu.utils.vectorize import batched_over

    dim_shape = as_canonical_shape(dim_shape)
    lipschitz = kwargs.pop("lipschitz", None)
    diff_lipschitz = kwargs.pop("diff_lipschitz", None)
    methods = {k: v for k, v in kwargs.items() if k in _FORWARDABLE}
    unknown = set(kwargs) - set(methods)
    assert not unknown, f"unknown from_source kwargs: {unknown}"

    epset = {enforce_precision} if isinstance(enforce_precision, str) \
        else set(enforce_precision)
    assert epset <= set(methods), \
        "enforce_precision can only wrap callables provided to from_source; " \
        f"not provided: {epset - set(methods)}"
    for name in epset:
        methods[name] = _coerced(methods[name])

    out_cls = _source_class(cls)
    op = object.__new__(out_cls)
    if Property.FUNCTIONAL in cls.properties():
        codim_shape = ()
    assert codim_shape is not None, "codim_shape required for non-functionals"
    Operator.__init__(op, dim_shape, codim_shape)

    vecset = {vectorize} if isinstance(vectorize, str) else set(vectorize)
    assert vecset <= {"apply", "grad", "adjoint"}, \
        "vectorize supports single-array methods only"
    for name in vecset & set(methods):
        in_rank = len(dim_shape) if name in ("apply", "grad") else \
            len(as_canonical_shape(codim_shape))
        methods[name] = batched_over(methods[name], in_rank)

    op._method_items = tuple(sorted(methods.items()))
    op._name = f"Source[{cls.__name__}]"
    if lipschitz is not None:
        op._lipschitz = float(lipschitz)
    if diff_lipschitz is not None:
        op._diff_lipschitz = float(diff_lipschitz)
    for k, v in (embed or {}).items():
        setattr(op, k, v)
    return op
