"""Property-typed operator hierarchy (TPU-native core).

Re-designs the reference's 16-class operator tower
(reference: src/pyxu/abc/operator.py:20-2160) for JAX/XLA:

* Every operator is a **registered pytree**: array state (kernels, diagonals,
  data vectors, child operators) are leaves; shapes/properties/Lipschitz
  constants are static aux data.  Operators therefore pass straight through
  ``jax.jit`` / ``lax.while_loop`` / ``shard_map`` without recompiling when
  their array state changes.
* ``apply/adjoint/grad/prox`` are pure functions of ``(self, array)`` —
  no mutable state, no method monkey-patching (the reference binds closures
  with ``types.MethodType`` at composition time, which is untraceable).
* Autodiff is first-class: ``LinOp.adjoint`` defaults to
  ``jax.linear_transpose`` of ``apply``; ``DiffFunc.grad`` defaults to
  ``jax.grad``; ``DiffMap.jacobian`` returns a JVP/VJP-backed LinOp.  Closed
  forms override these when they carry extra structure (e.g. a padded
  stencil's adjoint, a unitary FFT).
* Shapes are multi-dimensional: ``dim_shape``/``codim_shape`` are tuples;
  functionals have ``codim_shape == ()``.  Arbitrary leading batch axes are
  supported by every arithmetic method (the reference's "stacking dims",
  abc/operator.py:525-545).

Class tower and property sets mirror the reference exactly::

    Map ── Func ─────────────── ProxFunc ── ProxDiffFunc ── QuadraticFunc
     │       │                                  │                LinFunc
     └── DiffMap ── DiffFunc ───────────────────┘
           │
           └── LinOp ── SquareOp ── NormalOp ── UnitOp / SelfAdjointOp ── PosDefOp
                           └── ProjOp ── OrthProjOp
"""

from __future__ import annotations

import enum
import functools
import math as _math
import types

import jax
import jax.numpy as jnp
import numpy as np

from pyxu_tpu.info import warnings as pxw
from pyxu_tpu.info.dtypes import default_fdtype
from pyxu_tpu.utils.misc import as_canonical_shape

__all__ = [
    "Property",
    "Operator",
    "Map",
    "Func",
    "DiffMap",
    "DiffFunc",
    "ProxFunc",
    "ProxDiffFunc",
    "QuadraticFunc",
    "LinOp",
    "LinFunc",
    "SquareOp",
    "NormalOp",
    "UnitOp",
    "SelfAdjointOp",
    "PosDefOp",
    "ProjOp",
    "OrthProjOp",
    "core_operators",
    "infer_operator_class",
]


class Property(enum.Enum):
    """Mathematical properties (reference: abc/operator.py:20-73)."""

    CAN_EVAL = enum.auto()
    FUNCTIONAL = enum.auto()
    PROXIMABLE = enum.auto()
    DIFFERENTIABLE = enum.auto()
    DIFFERENTIABLE_FUNCTION = enum.auto()
    LINEAR = enum.auto()
    LINEAR_SQUARE = enum.auto()
    LINEAR_NORMAL = enum.auto()
    LINEAR_IDEMPOTENT = enum.auto()
    LINEAR_SELF_ADJOINT = enum.auto()
    LINEAR_POSITIVE_DEFINITE = enum.auto()
    LINEAR_UNITARY = enum.auto()
    QUADRATIC = enum.auto()

    def arithmetic_methods(self) -> frozenset:
        """Instance methods affected by this property (reference: abc/operator.py:57-73)."""
        data = {
            Property.CAN_EVAL: ("apply", "__call__", "lipschitz", "estimate_lipschitz"),
            Property.PROXIMABLE: ("prox", "fenchel_prox", "moreau_envelope"),
            Property.DIFFERENTIABLE: ("jacobian", "diff_lipschitz", "estimate_diff_lipschitz"),
            Property.DIFFERENTIABLE_FUNCTION: ("grad",),
            Property.LINEAR: ("adjoint", "asarray", "svdvals", "pinv", "gram", "cogram"),
            Property.LINEAR_SQUARE: ("trace",),
            Property.QUADRATIC: ("_quad_spec",),
        }
        return frozenset(data.get(self, ()))


# ------------------------------------------------------------------ pytree ---

def _collect_data_fields(cls) -> tuple:
    fields: dict = {}
    for klass in reversed(cls.__mro__):
        for f in klass.__dict__.get("_data_fields", ()):
            fields[f] = None
    return tuple(fields)


class _Meta:
    """Volatile host-side metadata (cached Lipschitz constants).

    Compares equal to any other ``_Meta`` so that updating a cached constant
    neither invalidates jit caches (operators ride in treedefs/aux) nor
    breaks structural-equality fast paths (e.g. vmapped ``block_diag``).
    The wrapped value never influences traced computation — it is only read
    host-side at solver init.
    """

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __eq__(self, other):
        return isinstance(other, _Meta)

    def __hash__(self):
        return 0

    def __repr__(self):
        return f"_Meta({self.v!r})"


_VOLATILE_FIELDS = ("_lipschitz", "_diff_lipschitz", "_chan_cache")


def _op_flatten(op):
    cls = type(op)
    fields = cls._all_data_fields
    data = tuple(op.__dict__.get(f) for f in fields)
    aux = tuple(sorted(
        ((k, _Meta(v) if k in _VOLATILE_FIELDS else v)
         for k, v in op.__dict__.items() if k not in fields),
        key=lambda kv: kv[0],
    ))
    return data, aux


def _op_unflatten(cls, aux, data):
    op = object.__new__(cls)
    for k, v in aux:
        object.__setattr__(op, k, v.v if isinstance(v, _Meta) else v)
    for f, c in zip(cls._all_data_fields, data):
        object.__setattr__(op, f, c)
    return op


# ---------------------------------------------------------------- hierarchy ---

class Operator:
    """Abstract base of every map/functional/linear operator.

    Reference: abc/operator.py:76-501.  Subclasses declare which attributes
    are array-valued pytree leaves via the class attribute ``_data_fields``;
    all other instance attributes are static aux data (they key jit caches).
    """

    _data_fields: tuple = ()

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        cls._all_data_fields = _collect_data_fields(cls)
        jax.tree_util.register_pytree_node(
            cls, _op_flatten, functools.partial(_op_unflatten, cls)
        )

    def __init__(self, dim_shape, codim_shape):
        self._dim_shape = as_canonical_shape(dim_shape)
        self._codim_shape = as_canonical_shape(codim_shape)
        self._lipschitz = _math.inf
        self._diff_lipschitz = _math.inf
        self._name = type(self).__name__

    # -- shape interface ---------------------------------------------------
    @property
    def dim_shape(self) -> tuple:
        """Shape of the domain (no batch axes)."""
        return self._dim_shape

    @property
    def codim_shape(self) -> tuple:
        """Shape of the co-domain; ``()`` for functionals."""
        return self._codim_shape

    @property
    def dim_size(self) -> int:
        return int(np.prod(self._dim_shape)) if self._dim_shape else 1

    @property
    def codim_size(self) -> int:
        return int(np.prod(self._codim_shape)) if self._codim_shape else 1

    @property
    def dim_rank(self) -> int:
        return len(self._dim_shape)

    @property
    def codim_rank(self) -> int:
        return len(self._codim_shape)

    # -- flat-API compatibility (reference abc/operator.py:108-128) ---------
    @property
    def dim(self) -> int:
        """Flattened domain size — reference ``Operator.dim``
        (abc/operator.py:115-120).  The reference operates on flattened
        ``(..., dim)`` arrays; here ``dim`` is the product of ``dim_shape``."""
        return self.dim_size

    @property
    def codim(self) -> int:
        """Flattened co-domain size — reference ``Operator.codim``
        (abc/operator.py:122-127)."""
        return self.codim_size

    @property
    def shape(self) -> tuple:
        """``(codim, dim)`` pair — reference ``Operator.shape``
        (abc/operator.py:108-113)."""
        return (self.codim_size, self.dim_size)

    def unravel(self, arr):
        """Reshape a flat-last-axis output ``(..., codim)`` into the
        structured ``(..., *codim_shape)`` this API produces natively
        (reference diff/filter-op ``unravel``, e.g. diff.py:1113-1267: the
        reference flattens operator outputs; here the helper exists for
        migrating code that still carries flat arrays)."""
        arr = jnp.asarray(arr)
        return arr.reshape(arr.shape[:-1] + tuple(self._codim_shape))

    def ravel(self, arr):
        """Flatten a structured output ``(..., *codim_shape)`` back to
        ``(..., codim)`` — inverse of :meth:`unravel` (reference ``ravel``)."""
        arr = jnp.asarray(arr)
        rank = len(self._codim_shape)
        batch = arr.shape[:arr.ndim - rank] if rank else arr.shape
        return arr.reshape(batch + (self.codim_size,))

    @property
    def name(self) -> str:
        return self._name

    # -- property interface ------------------------------------------------
    @classmethod
    def properties(cls) -> frozenset:
        return frozenset()

    def has(self, *props: Property) -> bool:
        return frozenset(props) <= self.properties()

    # -- batch helpers -----------------------------------------------------
    def _map_batched(self, fn, arr, in_rank: int, out_shape: tuple):
        """Apply single-sample ``fn`` over arbitrary leading batch axes."""
        arr = jnp.asarray(arr)
        batch = arr.shape[: arr.ndim - in_rank]
        if not batch:
            return fn(arr)
        core = arr.shape[arr.ndim - in_rank:]
        flat = arr.reshape((-1,) + core)
        out = jax.vmap(fn)(flat)
        return out.reshape(tuple(batch) + tuple(out_shape))

    # -- recasting / inspection -------------------------------------------
    def asop(self, cast_to: type) -> "Operator":
        """Recast to another operator class (reference: abc/operator.py:368-420).

        Casting *up* drops structure; casting *down* ("trust me") gains
        auto-derived methods — e.g. a linear ``Map`` cast to ``LinOp`` gains
        an exact adjoint via ``jax.linear_transpose``.
        """
        from pyxu_tpu.abc.arithmetic import cast_op
        return cast_op(self, cast_to)

    def squeeze(self) -> "Operator":
        """Specialise a codim-1 operator to its functional class:
        Map->Func, DiffMap->DiffFunc, LinOp->LinFunc
        (reference: abc/operator.py:328-346)."""
        if self.codim_shape == () or self.codim_size != 1:
            return self
        if self.has(Property.LINEAR):
            cls = LinFunc
        elif self.has(Property.DIFFERENTIABLE):
            cls = DiffFunc
        else:
            cls = Func
        return self.asop(cls)

    def _expr(self) -> tuple:
        """(head, *children) for expression-tree printing."""
        return (self._name,)

    def expr(self, level: int = 0, strip: bool = True) -> str:
        """Pretty-print the expression tree (reference: abc/operator.py:447-501)."""
        head, *tail = self._expr()
        lines = ["  " * level + str(head)]
        for t in tail:
            if isinstance(t, Operator):
                lines.append(t.expr(level + 1, strip=False))
            else:
                lines.append("  " * (level + 1) + str(t))
        out = "\n".join(lines)
        return out

    def __repr__(self) -> str:
        return f"{self._name}(dim={self.dim_shape}, codim={self.codim_shape})"

    # -- arithmetic (delegates to the rule engine) -------------------------
    def __add__(self, other):
        from pyxu_tpu.abc import arithmetic
        if not isinstance(other, Operator):
            return NotImplemented
        return arithmetic.add(self, other)

    def __sub__(self, other):
        from pyxu_tpu.abc import arithmetic
        if not isinstance(other, Operator):
            return NotImplemented
        return arithmetic.add(self, arithmetic.scale(other, -1.0))

    def __neg__(self):
        from pyxu_tpu.abc import arithmetic
        return arithmetic.scale(self, -1.0)

    def __mul__(self, other):
        from pyxu_tpu.abc import arithmetic
        if isinstance(other, Operator):
            return arithmetic.compose(self, other)
        if isinstance(other, (int, float, np.integer, np.floating)):
            return arithmetic.scale(self, float(other))
        return NotImplemented

    def __rmul__(self, other):
        from pyxu_tpu.abc import arithmetic
        if isinstance(other, (int, float, np.integer, np.floating)):
            return arithmetic.scale(self, float(other))
        return NotImplemented

    def __truediv__(self, other):
        from pyxu_tpu.abc import arithmetic
        if isinstance(other, (int, float, np.integer, np.floating)):
            return arithmetic.scale(self, 1.0 / float(other))
        return NotImplemented

    def __pow__(self, k):
        from pyxu_tpu.abc import arithmetic
        if isinstance(k, (int, np.integer)) and k >= 0:
            return arithmetic.power(self, int(k))
        return NotImplemented

    def argscale(self, scalar) -> "Operator":
        from pyxu_tpu.abc import arithmetic
        return arithmetic.argscale(self, float(scalar))

    def argshift(self, shift) -> "Operator":
        from pyxu_tpu.abc import arithmetic
        # host inputs stay host-side until placement: an eager complex
        # device transfer poisons some TPU runtimes (CLAUDE.md)
        if not isinstance(shift, jax.Array):
            shift = np.asarray(shift)
            if np.iscomplexobj(shift):
                from pyxu_tpu.utils.complex import view_as_real
                raise ValueError(
                    "argshift with complex host data: convert to the real "
                    "(..., 2) view first (view_as_real) — eager complex "
                    "device transfers are unsupported on some TPU runtimes")
            shift = jnp.asarray(shift)
        return arithmetic.argshift(self, shift)


class Map(Operator):
    """Anything evaluable: f : R^dim_shape -> R^codim_shape.

    Reference: abc/operator.py:504-639.
    """

    @classmethod
    def properties(cls) -> frozenset:
        return frozenset({Property.CAN_EVAL})

    def apply(self, arr):
        raise NotImplementedError(f"{self._name}.apply")

    def __call__(self, arr):
        return self.apply(arr)

    @property
    def lipschitz(self) -> float:
        """Current (cached) Lipschitz upper bound; +inf if unknown."""
        return self._lipschitz

    @lipschitz.setter
    def lipschitz(self, L: float):
        self._lipschitz = float(L)

    def estimate_lipschitz(self, **kwargs) -> float:
        if _math.isfinite(self._lipschitz):
            return self._lipschitz  # a declared constant IS an estimate
        raise NotImplementedError(
            f"{self._name}: no generic Lipschitz estimator for non-linear maps"
        )


class Func(Map):
    """Real-valued functional (codim_shape == ()). Reference: abc/operator.py:640-684."""

    @classmethod
    def properties(cls) -> frozenset:
        return Map.properties() | {Property.FUNCTIONAL}

    def __init__(self, dim_shape, codim_shape=()):
        codim_shape = as_canonical_shape(codim_shape)
        assert codim_shape in ((), (1,)), "functionals have scalar codomain"
        super().__init__(dim_shape, ())

    def asloss(self, data=None) -> "Func":
        """f(x) -> f(x - data) (reference: operator/func/loss.py:8-29)."""
        if data is None:
            return self
        # negate host-side for host inputs (no eager device round-trip)
        if not isinstance(data, jax.Array):
            return self.argshift(np.negative(np.asarray(data)))
        return self.argshift(-data)


class DiffMap(Map):
    """Differentiable map. Reference: abc/operator.py:685-846."""

    @classmethod
    def properties(cls) -> frozenset:
        return Map.properties() | {Property.DIFFERENTIABLE}

    def jacobian(self, arr) -> "LinOp":
        """Jacobian linearisation at ``arr`` (unbatched), default via JVP/VJP."""
        return _JacobianOp(self, jnp.asarray(arr))

    @property
    def diff_lipschitz(self) -> float:
        return self._diff_lipschitz

    @diff_lipschitz.setter
    def diff_lipschitz(self, dL: float):
        self._diff_lipschitz = float(dL)

    def estimate_diff_lipschitz(self, **kwargs) -> float:
        if _math.isfinite(self._diff_lipschitz):
            return self._diff_lipschitz  # a declared constant IS an estimate
        raise NotImplementedError(
            f"{self._name}: no generic diff-Lipschitz estimator for non-linear maps"
        )


class DiffFunc(DiffMap, Func):
    """Differentiable functional with a gradient. Reference: abc/operator.py:1075-1138."""

    @classmethod
    def properties(cls) -> frozenset:
        return DiffMap.properties() | Func.properties() | {
            Property.DIFFERENTIABLE_FUNCTION
        }

    def __init__(self, dim_shape, codim_shape=()):
        Func.__init__(self, dim_shape, codim_shape)

    def grad(self, arr):
        """Batched gradient; default = jax.grad of (sum o apply).

        Each batch element of a functional is independent, so the gradient of
        the batch-sum equals the per-sample gradients stacked.
        """
        arr = jnp.asarray(arr)
        return jax.grad(lambda x: jnp.sum(self.apply(x)))(arr)


class ProxFunc(Func):
    """Proximable functional. Reference: abc/operator.py:847-1074."""

    @classmethod
    def properties(cls) -> frozenset:
        return Func.properties() | {Property.PROXIMABLE}

    def prox(self, arr, tau):
        r"""prox_{tau f}(arr) = argmin_y f(y) + ||y - arr||^2 / (2 tau)."""
        raise NotImplementedError(f"{self._name}.prox")

    def fenchel_prox(self, arr, sigma):
        r"""prox of the convex conjugate, via Moreau's identity
        (reference: abc/operator.py:963-1007):
        prox_{sigma f*}(x) = x - sigma prox_{f/sigma}(x/sigma).
        """
        sigma = jnp.asarray(sigma)
        return arr - sigma * self.prox(arr / sigma, 1.0 / sigma)

    def moreau_envelope(self, mu: float) -> "DiffFunc":
        """Moreau-Yosida smoothing (reference: abc/operator.py:1008-1074)."""
        return _MoreauEnvelope(self, float(mu))


class ProxDiffFunc(ProxFunc, DiffFunc):
    """Reference: abc/operator.py:1139-1168."""

    @classmethod
    def properties(cls) -> frozenset:
        return ProxFunc.properties() | DiffFunc.properties()


class QuadraticFunc(ProxDiffFunc):
    r"""f(x) = (1/2) <x, Qx> + <c, x> + t with Q positive semi-definite.

    Reference: abc/operator.py:1169-1312.  The prox solves the linear system
    ``(I + tau Q) p = x - tau c`` with a jit-compatible conjugate-gradient
    loop (the reference nests its CG solver: abc/operator.py:1273-1291).
    """

    _data_fields = ("_Q", "_c", "_t")

    @classmethod
    def properties(cls) -> frozenset:
        return ProxDiffFunc.properties() | {Property.QUADRATIC}

    def __init__(self, dim_shape, codim_shape=(), Q: "PosDefOp" = None, c: "LinFunc" = None, t=0.0):
        super().__init__(dim_shape, codim_shape)
        from pyxu_tpu.operator.linop.base import IdentityOp, NullFunc
        self._Q = IdentityOp(dim_shape) if Q is None else Q
        self._c = NullFunc(dim_shape) if c is None else c
        # t is a data leaf (may be traced, e.g. argshift with traced data)
        self._t = jnp.asarray(t, default_fdtype()) if not hasattr(t, "dtype") \
            else t
        self._lipschitz = _math.inf
        self._diff_lipschitz = self._Q.lipschitz

    def _quad_spec(self):
        return (self._Q, self._c, self._t)

    def apply(self, arr):
        arr = jnp.asarray(arr)
        sum_axes = tuple(range(-self.dim_rank, 0)) if self.dim_rank else None
        quad = 0.5 * jnp.sum(arr * self._Q.apply(arr), axis=sum_axes)
        return quad + self._c.apply(arr) + self._t

    def grad(self, arr):
        return self._Q.apply(arr) + self._c.grad(arr)

    def prox(self, arr, tau):
        from pyxu_tpu.math.cg import cg_solve
        arr = jnp.asarray(arr)
        tau = jnp.asarray(tau, dtype=arr.dtype)
        b = arr - tau * self._c.grad(arr)
        mv = lambda p: p + tau * self._Q.apply(p)
        # Optional user-supplied PCG preconditioner ``z = M^{-1}(r, tau)``
        # (set ``op._prox_precond``).  NOT auto-derived: circulant (Strang /
        # T. Chan) preconditioning of NUFFT Toeplitz grams was measured
        # HARMFUL on the RI workload — scattered-point kernels are noisy
        # estimates of a symbol (|T[j]| ~ sqrt(M) fluctuation at every lag),
        # and the circulant's near-null modes mismatch the section's, so
        # PCG converged slower than CG and ADMM diverged (see BASELINE.md
        # "Rejected: circulant-preconditioned prox CG").
        pre = getattr(self, "_prox_precond", None)
        precond = None if pre is None else (lambda r: pre(r, tau))
        # dtype-aware tolerance: an rtol below working precision never fires
        # and the loop would burn its full maxiter (minutes of device time on
        # a large Q).  Cap iterations; CG on (I + tau Q) with a warm start
        # converges in far fewer.  Override per-instance via _prox_rtol /
        # _prox_maxiter.
        rtol = getattr(self, "_prox_rtol", None)
        if rtol is None:
            # host-side math: jnp ops stage to tracers inside jit even for
            # constant inputs, and this must stay a static python float
            # floor at the old 1e-6 default: for float64, 100*eps would be
            # ~8 orders tighter and burn full maxiter on every call
            rtol = max(100.0 * float(jnp.finfo(arr.dtype).eps), 1e-6)
        maxiter = getattr(self, "_prox_maxiter", None)
        if maxiter is None:
            maxiter = min(max(2 * self.dim_size, 20), 500)
        return cg_solve(mv, b, x0=arr, rtol=rtol, maxiter=maxiter,
                        precond=precond)

    def estimate_diff_lipschitz(self, **kwargs) -> float:
        dL = self._Q.estimate_lipschitz(**kwargs)
        self._diff_lipschitz = dL
        return dL


class LinOp(DiffMap):
    """Linear operator with adjoint machinery. Reference: abc/operator.py:1313-1832."""

    @classmethod
    def properties(cls) -> frozenset:
        return DiffMap.properties() | {Property.LINEAR}

    def __init__(self, dim_shape, codim_shape):
        super().__init__(dim_shape, codim_shape)
        self._diff_lipschitz = 0.0

    # -- core --------------------------------------------------------------
    def adjoint(self, arr):
        """Default exact adjoint via ``jax.linear_transpose`` of ``apply``.

        Reference requires hand-written adjoints (abc/operator.py:1352-1390);
        on TPU the transpose of the traced forward computation is both exact
        and XLA-optimized, so closed forms are an optional refinement.
        """
        arr = jnp.asarray(arr)
        dtype = arr.dtype if jnp.issubdtype(arr.dtype, jnp.floating) else default_fdtype()
        primal = jax.ShapeDtypeStruct(self.dim_shape, dtype)

        def single(y):
            (x,) = jax.linear_transpose(self.apply, primal)(y)
            return x

        return self._map_batched(single, arr, self.codim_rank, self.dim_shape)

    def jacobian(self, arr) -> "LinOp":
        return self

    def estimate_diff_lipschitz(self, **kwargs) -> float:
        """Linear maps have constant Jacobians: diff-Lipschitz is exactly 0
        (composite estimators recurse into linear operands)."""
        self._diff_lipschitz = 0.0
        return 0.0

    @property
    def T(self) -> "LinOp":
        from pyxu_tpu.abc import arithmetic
        return arithmetic.transpose(self)

    # -- spectral / algebraic ----------------------------------------------
    def estimate_lipschitz(self, method: str = "power", key=None, maxiter: int = 64, **kwargs) -> float:
        """Spectral-norm bound.  ``power``: power iteration on the Gram
        (replaces ARPACK svds, reference abc/operator.py:1440-1507);
        ``trace``: Frobenius bound via Hutch++ (reference math/linalg.py:62-117).
        """
        from pyxu_tpu.math import linalg
        if method == "power":
            L = linalg.spectral_norm(self, key=key, maxiter=maxiter, **kwargs)
        elif method == "trace":
            L = float(jnp.sqrt(linalg.hutchpp(self.gram(), key=key, **kwargs)))
        else:
            raise ValueError(method)
        self._lipschitz = float(L)
        return self._lipschitz

    def gram(self) -> "SelfAdjointOp":
        """A^T A (reference: abc/operator.py:1618-1639)."""
        return _GramOp(self, cogram=False)

    def cogram(self) -> "SelfAdjointOp":
        """A A^T (reference: abc/operator.py:1640-1663)."""
        return _GramOp(self, cogram=True)

    def asarray(self, dtype=None):
        """Materialise as a dense ``(*codim_shape, *dim_shape)`` array.

        Reference: abc/operator.py:1580-1617.  Vmapped basis probe — only for
        small operators (tests, explicit solves).
        """
        dtype = np.dtype(dtype) if dtype is not None else default_fdtype()
        basis = jnp.eye(self.dim_size, dtype=dtype).reshape((self.dim_size,) + self.dim_shape)
        cols = jax.vmap(self.apply)(basis)  # (dim_size, *codim_shape)
        mat = jnp.moveaxis(cols.reshape(self.dim_size, self.codim_size), 0, -1)
        return mat.reshape(tuple(self.codim_shape) + tuple(self.dim_shape))

    def svdvals(self, k: int = 1, key=None, maxiter: int = 96) -> jnp.ndarray:
        """Top-k singular values in ASCENDING order (the reference's svds
        contract, abc/operator.py:1509-1579) via subspace iteration on the
        Gram."""
        from pyxu_tpu.math import linalg
        return linalg.svdvals(self, k=k, key=key, maxiter=maxiter)

    def pinv(self, arr, damp: float = 0.0, kwargs_init=None, **kwargs):
        """Moore-Penrose pseudo-inverse apply via CG on the damped normal
        equations (reference: abc/operator.py:1664-1746).
        """
        from pyxu_tpu.math.cg import cg_solve
        arr = jnp.asarray(arr)
        b = self.adjoint(arr)
        damp = jnp.asarray(damp, dtype=b.dtype)
        gram = self.gram()
        mv = lambda x: gram.apply(x) + damp * x
        # same dtype/size guard as QuadraticFunc.prox: sub-precision rtol +
        # unbounded maxiter = a device program that runs for minutes
        unknown = set(kwargs) - {"rtol", "maxiter"}
        assert not unknown, f"unknown pinv kwargs: {unknown}"
        rtol = kwargs.get("rtol")
        if rtol is None:
            rtol = max(100.0 * float(jnp.finfo(b.dtype).eps), 1e-6)
        maxiter = kwargs.get("maxiter")
        if maxiter is None:
            maxiter = min(max(2 * self.dim_size, 20), 1000)
        x0 = (kwargs_init or {}).get("x0")   # warm start (reference
        # kwargs_init feeds the nested CG solver, abc/operator.py:1664-1746)
        return cg_solve(mv, b, x0=x0, rtol=rtol, maxiter=maxiter)

    def dagger(self, damp: float = 0.0, **kwargs) -> "LinOp":
        """The pseudo-inverse as a LinOp (reference: abc/operator.py:1747-1800)."""
        return _DaggerOp(self, float(damp))

    @classmethod
    def from_array(cls, A, dim_rank: int = 1) -> "LinOp":
        """Wrap an explicit matrix as a LinOp (reference: abc/operator.py:1801-1832).

        Dense arrays -> :class:`ExplicitLinOp` (MXU matmul).  scipy.sparse /
        jax BCOO inputs -> :class:`SparseExplicitLinOp` (the reference's
        sparse ``_ExplicitLinOp`` branch, base.py:334-512)."""
        from pyxu_tpu.operator.linop.base import (ExplicitLinOp,
                                                  SparseExplicitLinOp,
                                                  _is_sparse)
        if _is_sparse(A):
            return SparseExplicitLinOp(A, dim_rank=dim_rank)
        return ExplicitLinOp(A, dim_rank=dim_rank)

    def to_sciop(self, dtype=None):
        """Export as a scipy.sparse.linalg.LinearOperator on flattened
        vectors (reference: abc/operator.py:1392-1438) — for interop with
        scipy's iterative solvers / eigensolvers."""
        import scipy.sparse.linalg as spl
        dtype = np.dtype(dtype) if dtype is not None else default_fdtype()

        def mv(v):
            x = jnp.asarray(np.asarray(v, dtype).reshape(self.dim_shape))
            return np.asarray(jax.device_get(self.apply(x))).ravel()

        def rmv(v):
            y = jnp.asarray(np.asarray(v, dtype).reshape(self.codim_shape))
            return np.asarray(jax.device_get(self.adjoint(y))).ravel()

        def mm(V):
            X = jnp.asarray(np.asarray(V, dtype).T.reshape(
                (-1,) + tuple(self.dim_shape)))
            Y = self.apply(X)
            return np.asarray(jax.device_get(Y)).reshape(V.shape[1], -1).T

        return spl.LinearOperator(
            shape=(self.codim_size, self.dim_size), dtype=dtype,
            matvec=mv, rmatvec=rmv, matmat=mm)


class SquareOp(LinOp):
    """Endomorphism: dim_shape == codim_shape. Reference: abc/operator.py:1833-1891."""

    @classmethod
    def properties(cls) -> frozenset:
        return LinOp.properties() | {Property.LINEAR_SQUARE}

    def __init__(self, dim_shape, codim_shape=None):
        codim_shape = dim_shape if codim_shape is None else codim_shape
        assert as_canonical_shape(dim_shape) == as_canonical_shape(codim_shape)
        super().__init__(dim_shape, codim_shape)

    def trace(self, method: str = "explicit", **kwargs) -> float:
        """Trace, exact (basis probing) or Hutch++ (reference: abc/operator.py:1860-1891)."""
        from pyxu_tpu.math import linalg
        if method in ("explicit", "exact"):
            return float(linalg.trace(self))
        return float(linalg.hutchpp(self, **kwargs))


class NormalOp(SquareOp):
    """A A^T = A^T A. Reference: abc/operator.py:1892-1914."""

    @classmethod
    def properties(cls) -> frozenset:
        return SquareOp.properties() | {Property.LINEAR_NORMAL}


class UnitOp(NormalOp):
    """A A^T = A^T A = I. Reference: abc/operator.py:1931-1975."""

    @classmethod
    def properties(cls) -> frozenset:
        return NormalOp.properties() | {Property.LINEAR_UNITARY}

    def __init__(self, dim_shape, codim_shape=None):
        super().__init__(dim_shape, codim_shape)
        self._lipschitz = 1.0

    def estimate_lipschitz(self, **kwargs) -> float:
        return 1.0

    def pinv(self, arr, damp: float = 0.0, **kwargs):
        out = self.adjoint(arr)
        if damp != 0.0:
            out = out / (1.0 + damp)
        return out

    def dagger(self, damp: float = 0.0, **kwargs) -> "LinOp":
        from pyxu_tpu.abc import arithmetic
        op = arithmetic.transpose(self)
        if damp != 0.0:
            op = arithmetic.scale(op, 1.0 / (1.0 + damp))
        return op

    def svdvals(self, k: int = 1, **kwargs):
        return jnp.ones(k, dtype=default_fdtype())


class SelfAdjointOp(NormalOp):
    """A = A^T. Reference: abc/operator.py:1915-1930."""

    @classmethod
    def properties(cls) -> frozenset:
        return NormalOp.properties() | {Property.LINEAR_SELF_ADJOINT}

    def adjoint(self, arr):
        return self.apply(arr)


class PosDefOp(SelfAdjointOp):
    """<x, Ax> > 0. Reference: abc/operator.py:2032-2043."""

    @classmethod
    def properties(cls) -> frozenset:
        return SelfAdjointOp.properties() | {Property.LINEAR_POSITIVE_DEFINITE}


class ProjOp(SquareOp):
    """A^2 = A. Reference: abc/operator.py:1976-1990."""

    @classmethod
    def properties(cls) -> frozenset:
        return SquareOp.properties() | {Property.LINEAR_IDEMPOTENT}


class OrthProjOp(ProjOp, SelfAdjointOp):
    """A^2 = A = A^T. Reference: abc/operator.py:1991-2031."""

    @classmethod
    def properties(cls) -> frozenset:
        return ProjOp.properties() | SelfAdjointOp.properties()

    def __init__(self, dim_shape, codim_shape=None):
        super().__init__(dim_shape, codim_shape)
        self._lipschitz = 1.0

    def estimate_lipschitz(self, **kwargs) -> float:
        return 1.0

    def gram(self):
        return self

    def cogram(self):
        return self

    def pinv(self, arr, damp: float = 0.0, **kwargs):
        out = self.apply(arr)
        if damp != 0.0:
            out = out / (1.0 + damp)
        return out

    def dagger(self, damp: float = 0.0, **kwargs) -> "LinOp":
        from pyxu_tpu.abc import arithmetic
        return arithmetic.scale(self, 1.0 / (1.0 + damp)) if damp != 0.0 else self


class LinFunc(ProxDiffFunc, LinOp):
    """Linear functional f(x) = <w, x>. Reference: abc/operator.py:2044-2136."""

    @classmethod
    def properties(cls) -> frozenset:
        return ProxDiffFunc.properties() | LinOp.properties()

    def __init__(self, dim_shape, codim_shape=()):
        ProxDiffFunc.__init__(self, dim_shape, codim_shape)
        self._diff_lipschitz = 0.0

    def grad(self, arr):
        """Constant gradient w = adjoint(1), broadcast over batch axes."""
        arr = jnp.asarray(arr)
        w = self.adjoint(jnp.ones((), dtype=arr.dtype))
        return jnp.broadcast_to(w, arr.shape)

    def prox(self, arr, tau):
        arr = jnp.asarray(arr)
        tau = jnp.asarray(tau, dtype=arr.dtype)
        w = self.adjoint(jnp.ones((), dtype=arr.dtype))
        return arr - tau * w

    def fenchel_prox(self, arr, sigma):
        arr = jnp.asarray(arr)
        w = self.adjoint(jnp.ones((), dtype=arr.dtype))
        return jnp.broadcast_to(w, arr.shape)

    def estimate_lipschitz(self, **kwargs) -> float:
        w = self.adjoint(jnp.ones((), dtype=default_fdtype()))
        self._lipschitz = float(jnp.linalg.norm(w.ravel()))
        return self._lipschitz

    def svdvals(self, k: int = 1, **kwargs):
        # rank-1 spectrum, padded with zeros, ascending (svds contract)
        s1 = self.estimate_lipschitz()
        out = np.zeros(k, dtype=default_fdtype())
        out[-1] = s1
        return jnp.asarray(out)

    def asarray(self, dtype=None):
        dtype = np.dtype(dtype) if dtype is not None else default_fdtype()
        return self.adjoint(jnp.ones((), dtype=dtype))


# ------------------------------------------------------- synthesized helpers --

class _JacobianOp(LinOp):
    """JVP/VJP-backed Jacobian of a DiffMap at a point (unbatched)."""

    _data_fields = ("_op", "_at")

    def __init__(self, op: DiffMap, at):
        super().__init__(op.dim_shape, op.codim_shape)
        self._op = op
        self._at = at
        self._name = f"Jacobian[{op.name}]"

    def apply(self, arr):
        def single(v):
            _, jv = jax.jvp(self._op.apply, (self._at,), (v,))
            return jv
        return self._map_batched(single, jnp.asarray(arr), self.dim_rank, self.codim_shape)

    def adjoint(self, arr):
        def single(w):
            _, vjp = jax.vjp(self._op.apply, self._at)
            (x,) = vjp(w)
            return x
        return self._map_batched(single, jnp.asarray(arr), self.codim_rank, self.dim_shape)

    def _expr(self):
        return ("jacobian", self._op)


class _MoreauEnvelope(DiffFunc):
    r"""f^mu(x) = min_y f(y) + ||x-y||^2/(2 mu); grad = (x - prox_{mu f}(x))/mu.

    Reference: abc/operator.py:1008-1074.
    """

    _data_fields = ("_func",)

    def __init__(self, func: ProxFunc, mu: float):
        assert mu > 0
        super().__init__(func.dim_shape)
        self._func = func
        self._mu = mu
        self._diff_lipschitz = 1.0 / mu
        self._name = f"MoreauEnvelope[{func.name}]"

    def apply(self, arr):
        arr = jnp.asarray(arr)
        p = self._func.prox(arr, self._mu)
        sum_axes = tuple(range(-self.dim_rank, 0)) if self.dim_rank else None
        return self._func.apply(p) + jnp.sum((arr - p) ** 2, axis=sum_axes) / (2 * self._mu)

    def grad(self, arr):
        arr = jnp.asarray(arr)
        return (arr - self._func.prox(arr, self._mu)) / self._mu

    def _expr(self):
        return (f"moreau_envelope[mu={self._mu}]", self._func)


class _GramOp(SelfAdjointOp):
    """A^T A (or A A^T): self-adjoint PSD composition without wrapper chains."""

    _data_fields = ("_op",)

    def __init__(self, op: LinOp, cogram: bool):
        shape = op.codim_shape if cogram else op.dim_shape
        super().__init__(shape)
        self._op = op
        self._cogram = bool(cogram)
        if op.lipschitz != _math.inf:
            self._lipschitz = op.lipschitz ** 2
        self._name = ("Cogram" if cogram else "Gram") + f"[{op.name}]"

    def apply(self, arr):
        if self._cogram:
            return self._op.apply(self._op.adjoint(arr))
        return self._op.adjoint(self._op.apply(arr))

    def estimate_lipschitz(self, **kwargs) -> float:
        L = self._op.estimate_lipschitz(**kwargs)
        self._lipschitz = L * L
        return self._lipschitz

    def _expr(self):
        return ("cogram" if self._cogram else "gram", self._op)


class _DaggerOp(LinOp):
    """Moore-Penrose pseudo-inverse as an operator (reference: abc/operator.py:1747-1800)."""

    _data_fields = ("_op",)

    def __init__(self, op: LinOp, damp: float):
        super().__init__(op.codim_shape, op.dim_shape)
        self._op = op
        self._damp = damp
        self._name = f"Dagger[{op.name}]"

    def apply(self, arr):
        def single(y):
            return self._op.pinv(y, damp=self._damp)
        return self._map_batched(single, jnp.asarray(arr), self.dim_rank, self.codim_shape)

    def adjoint(self, arr):
        # (A^dagger)^T = (A^T)^dagger
        def single(x):
            from pyxu_tpu.abc import arithmetic
            return arithmetic.transpose(self._op).pinv(x, damp=self._damp)
        return self._map_batched(single, jnp.asarray(arr), self.codim_rank, self.dim_shape)

    def _expr(self):
        return (f"dagger[damp={self._damp}]", self._op)


# ------------------------------------------------------------ class algebra --

@functools.cache
def core_operators() -> tuple:
    """The 16 core classes (reference: abc/operator.py:2137-2160)."""
    return (
        Map, Func, DiffMap, DiffFunc, ProxFunc, ProxDiffFunc, QuadraticFunc,
        LinOp, LinFunc, SquareOp, NormalOp, UnitOp, SelfAdjointOp, PosDefOp,
        ProjOp, OrthProjOp,
    )


def infer_operator_class(properties: frozenset) -> type:
    """Tightest core class whose property set is contained in ``properties``.

    Mirrors the reference's rule-engine class inference
    (abc/arithmetic.py:140-164).
    """
    properties = frozenset(properties)
    candidates = [c for c in core_operators() if c.properties() <= properties]
    if not candidates:
        raise ValueError(f"no operator class matches properties {properties}")
    return max(candidates, key=lambda c: len(c.properties()))
