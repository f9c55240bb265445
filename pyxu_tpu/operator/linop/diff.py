"""Derivative operators: partial derivatives, gradient, Jacobian, divergence,
Hessian, Laplacian, and directional variants.

Reference: src/pyxu/operator/linop/diff.py:157-2759.  The reference builds
finite-difference / Gaussian-derivative kernels (`_FiniteDifference` :157,
`_GaussianDerivative` :264) and instantiates Numba stencils, then stacks them
with block machinery (`_StackDiffHelper` :938).  Here kernels are computed
host-side in float64 (Vandermonde solve / Hermite recurrence) and the compute
path is the XLA-native separable :class:`~pyxu_tpu.operator.linop.stencil.Stencil`
(`lax.conv_general_dilated` on the MXU); stacking is a thin LinOp whose
apply/adjoint are one `jnp.stack` / sum — XLA fuses the per-direction convs.
"""

from __future__ import annotations

import math as _math

import jax.numpy as jnp
import numpy as np

from pyxu_tpu.abc.operator import LinOp, SquareOp
from pyxu_tpu.operator.linop.stencil import Stencil
from pyxu_tpu.utils.misc import as_canonical_shape

__all__ = [
    "PartialDerivative",
    "Gradient",
    "Jacobian",
    "Divergence",
    "Hessian",
    "Laplacian",
    "DirectionalDerivative",
    "DirectionalGradient",
    "DirectionalLaplacian",
    "DirectionalHessian",
]


# ------------------------------------------------------------- FD kernels ---

def _fd_coeffs(deriv: int, scheme: str = "forward", accuracy: int = 1):
    """Finite-difference taps: offsets + coefficients for d^deriv/dx^deriv.

    Solves the Taylor/Vandermonde system sum_j c_j o_j^k = k! delta_{k,deriv}
    (reference: diff.py:157-263, `_FiniteDifference.compute_coefficients`).
    Returns (offsets int array, coeffs float64 array).
    """
    if deriv == 0:
        return np.array([0]), np.array([1.0])
    if scheme == "central":
        # accuracy rounded up to even, symmetric offsets
        acc = accuracy + (accuracy % 2)
        half = (deriv + 1) // 2 - 1 + acc // 2
        offsets = np.arange(-half, half + 1)
    elif scheme == "forward":
        offsets = np.arange(0, deriv + accuracy)
    elif scheme == "backward":
        offsets = np.arange(-(deriv + accuracy) + 1, 1)
    else:
        raise ValueError(f"scheme {scheme!r} not in ('central','forward','backward')")
    n = len(offsets)
    V = np.vander(offsets.astype(np.float64), n, increasing=True).T  # V[k,j]=o_j^k
    rhs = np.zeros(n)
    rhs[deriv] = _math.factorial(deriv)
    coeffs = np.linalg.solve(V, rhs)
    coeffs[np.abs(coeffs) < 1e-12] = 0.0
    return offsets, coeffs


def _gauss_deriv_kernel(deriv: int, sigma: float, truncate: float = 3.0):
    """Gaussian-derivative taps via the Hermite recurrence
    p_{n+1} = p_n' - (x / sigma^2) p_n applied to g(x) = exp(-x^2/2 sigma^2)
    (reference: diff.py:264-350, `_GaussianDerivative`)."""
    radius = max(int(truncate * sigma + 0.5), 1)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-0.5 * (x / sigma) ** 2)
    g /= g.sum()
    p = np.polynomial.Polynomial([1.0])
    dgauss = np.polynomial.Polynomial([0.0, -1.0 / sigma**2])
    for _ in range(deriv):
        p = p.deriv() + p * dgauss
    kernel = p(x) * g
    # Stencil applies CORRELATION (no flip); the derivative-of-Gaussian taps
    # are a convolution kernel, so flip them here (odd orders change sign —
    # the reference flips for the same reason, diff.py:264-350)
    kernel = kernel[::-1]
    offsets = x.astype(np.int64)
    return offsets, kernel


# ------------------------------------------------------ partial derivative ---

class PartialDerivative:
    """Factory namespace (reference: diff.py:446-743).

    ``order`` is a per-axis tuple of derivative orders, e.g. (0, 2) =
    d^2/dx1^2 on a 2-D domain.  Returns a separable :class:`Stencil` scaled by
    the grid sampling.
    """

    @staticmethod
    def finite_difference(dim_shape, order, scheme="forward", accuracy=1,
                          mode="constant", sampling=1.0):
        dim_shape = as_canonical_shape(dim_shape)
        order = _canon_order(order, len(dim_shape))
        schemes = _per_axis(scheme, len(dim_shape))
        accs = _per_axis(accuracy, len(dim_shape))
        taps = [
            _fd_coeffs(o, schemes[ax], accs[ax]) for ax, o in enumerate(order)
        ]
        return _build_pd(dim_shape, order, taps, mode, sampling)

    @staticmethod
    def gaussian_derivative(dim_shape, order, sigma=1.0, truncate=3.0,
                            mode="constant", sampling=1.0):
        dim_shape = as_canonical_shape(dim_shape)
        order = _canon_order(order, len(dim_shape))
        sigmas = _per_axis(sigma, len(dim_shape))
        truncs = _per_axis(truncate, len(dim_shape))
        taps = [
            _gauss_deriv_kernel(o, sigmas[ax], truncs[ax]) if o > 0
            else (np.array([0]), np.array([1.0]))
            for ax, o in enumerate(order)
        ]
        return _build_pd(dim_shape, order, taps, mode, sampling)


def _canon_order(order, rank: int) -> tuple:
    if isinstance(order, (int, np.integer)):
        assert rank == 1
        return (int(order),)
    order = tuple(int(o) for o in order)
    assert len(order) == rank and all(o >= 0 for o in order)
    return order


def _per_axis(v, rank: int) -> tuple:
    if isinstance(v, (list, tuple)):
        assert len(v) == rank
        return tuple(v)
    return (v,) * rank


def _build_pd(dim_shape, order, taps, mode, sampling):
    sampling = _per_axis(float(sampling) if np.isscalar(sampling) else sampling,
                         len(dim_shape))
    kernels = []
    centers = []
    scale = 1.0
    for ax, ((offsets, coeffs), o) in enumerate(zip(taps, order)):
        kernels.append(jnp.asarray(coeffs))
        centers.append(int(-offsets[0]))
        scale /= float(sampling[ax]) ** o
    if len(dim_shape) == 1:
        op = Stencil(dim_shape, kernels[0] * scale, centers[0], mode=mode)
    else:
        # fold the sampling scale into the first non-trivial kernel
        kernels = list(kernels)
        kernels[0] = kernels[0] * scale
        op = Stencil(dim_shape, kernels, centers, mode=mode)
    op._name = f"PartialDerivative[{order}]"
    return op


# ------------------------------------------------------------ stacked ops ---

class _StackedDiff(LinOp):
    """codim = (n_ops, *dim_shape): apply stacks child outputs, adjoint sums
    child adjoints (reference: `_StackDiffHelper`, diff.py:938-1113)."""

    _data_fields = ("_ops",)

    def __init__(self, ops, name: str):
        dim_shape = ops[0].dim_shape
        super().__init__(dim_shape, (len(ops),) + tuple(dim_shape))
        self._ops = tuple(ops)
        self._lipschitz = _math.sqrt(sum(o.lipschitz**2 for o in ops))
        self._name = name

    def apply(self, arr):
        arr = jnp.asarray(arr)
        outs = [op.apply(arr) for op in self._ops]
        return jnp.stack(outs, axis=arr.ndim - self.dim_rank)

    def adjoint(self, arr):
        arr = jnp.asarray(arr)
        ax = arr.ndim - self.codim_rank
        parts = [op.adjoint(jnp.take(arr, i, axis=ax))
                 for i, op in enumerate(self._ops)]
        out = parts[0]
        for p in parts[1:]:
            out = out + p
        return out

    def _expr(self):
        return (self._name, *self._ops)


def _pd_factory(diff_method: str, dim_shape, order, mode, sampling, **diff_kwargs):
    if diff_method == "fd":
        return PartialDerivative.finite_difference(
            dim_shape, order,
            scheme=diff_kwargs.get("scheme", "forward"),
            accuracy=diff_kwargs.get("accuracy", 1),
            mode=mode, sampling=sampling)
    if diff_method == "gd":
        return PartialDerivative.gaussian_derivative(
            dim_shape, order,
            sigma=diff_kwargs.get("sigma", 1.0),
            truncate=diff_kwargs.get("truncate", 3.0),
            mode=mode, sampling=sampling)
    raise ValueError(f"diff_method {diff_method!r} not in ('fd','gd')")


def _one_hot(rank, ax, value=1):
    o = [0] * rank
    o[ax] = value
    return tuple(o)


def Gradient(dim_shape, directions=None, diff_method="fd", mode="constant",
             sampling=1.0, **diff_kwargs):
    """Stack of first-order partials; codim (D, *dim_shape)
    (reference: diff.py:1113-1267)."""
    dim_shape = as_canonical_shape(dim_shape)
    rank = len(dim_shape)
    directions = tuple(range(rank)) if directions is None else tuple(directions)
    ops = [
        _pd_factory(diff_method, dim_shape, _one_hot(rank, ax), mode, sampling,
                    **diff_kwargs)
        for ax in directions
    ]
    return _StackedDiff(ops, "Gradient")


class Jacobian(LinOp):
    """Gradient per channel of a vector field: (C, *sp) -> (C, D, *sp)
    (reference: diff.py:1268-1417)."""

    _data_fields = ("_grad",)

    def __init__(self, dim_shape, directions=None, diff_method="fd",
                 mode="constant", sampling=1.0, **diff_kwargs):
        dim_shape = as_canonical_shape(dim_shape)
        C, spatial = dim_shape[0], dim_shape[1:]
        grad = Gradient(spatial, directions=directions, diff_method=diff_method,
                        mode=mode, sampling=sampling, **diff_kwargs)
        super().__init__(dim_shape, (C,) + tuple(grad.codim_shape))
        self._grad = grad
        self._lipschitz = grad.lipschitz
        self._name = "Jacobian"

    def apply(self, arr):
        # channel axis rides as a batch axis of the inner gradient
        return self._grad.apply(jnp.asarray(arr))

    def adjoint(self, arr):
        return self._grad.adjoint(jnp.asarray(arr))

    def _expr(self):
        return ("Jacobian", self._grad)


class Divergence(LinOp):
    """div(v) = sum_i D_i v_i: (D, *sp) -> (*sp); adjoint of a Gradient built
    with the adjoint schemes (reference: diff.py:1418-1590, which constructs
    Divergence as the sum of per-channel partial derivatives)."""

    _data_fields = ("_ops",)

    def __init__(self, dim_shape, directions=None, diff_method="fd",
                 mode="constant", sampling=1.0, **diff_kwargs):
        dim_shape = as_canonical_shape(dim_shape)
        D, spatial = dim_shape[0], dim_shape[1:]
        rank = len(spatial)
        directions = tuple(range(rank)) if directions is None else tuple(directions)
        assert len(directions) == D, "leading axis must match #directions"
        # scheme flip (forward<->backward): the divergence must be the
        # negative adjoint of the same-scheme gradient so that div(grad)
        # reproduces the centered Laplacian (reference: diff.py:1551-1560)
        kw = dict(diff_kwargs)
        if diff_method == "fd":
            flip = {"forward": "backward", "backward": "forward"}
            kw["scheme"] = flip.get(kw.get("scheme", "forward"),
                                    kw.get("scheme", "forward"))
        self._ops = tuple(
            _pd_factory(diff_method, spatial, _one_hot(rank, ax), mode, sampling,
                        **kw)
            for ax in directions
        )
        super().__init__(dim_shape, spatial)
        self._lipschitz = _math.sqrt(sum(o.lipschitz**2 for o in self._ops))
        self._name = "Divergence"

    def apply(self, arr):
        arr = jnp.asarray(arr)
        ax = arr.ndim - self.dim_rank
        out = None
        for i, op in enumerate(self._ops):
            t = op.apply(jnp.take(arr, i, axis=ax))
            out = t if out is None else out + t
        return out

    def adjoint(self, arr):
        arr = jnp.asarray(arr)
        outs = [op.adjoint(arr) for op in self._ops]
        return jnp.stack(outs, axis=arr.ndim - (self.dim_rank - 1))

    def _expr(self):
        return ("Divergence", *self._ops)


def Hessian(dim_shape, directions=None, diff_method="fd", mode="constant",
            sampling=1.0, **diff_kwargs):
    """All unique second-order partials; codim (D(D+1)/2, *dim_shape)
    (reference: diff.py:1591-1798)."""
    dim_shape = as_canonical_shape(dim_shape)
    rank = len(dim_shape)
    if directions is None or (isinstance(directions, str)
                              and directions == "all"):
        directions = [(i, j) for i in range(rank) for j in range(i, rank)]
    elif (len(directions) == 2
          and all(isinstance(d, (int, np.integer)) for d in directions)):
        directions = [tuple(directions)]   # a single (i, j) pair
    ops = []
    for (i, j) in directions:
        o = [0] * rank
        o[i] += 1
        o[j] += 1
        kw = dict(diff_kwargs)
        if diff_method == "fd":
            kw.setdefault("scheme", "central")
            kw.setdefault("accuracy", 2)
        ops.append(_pd_factory(diff_method, dim_shape, tuple(o), mode, sampling, **kw))
    return _StackedDiff(ops, "Hessian")


class Laplacian(SquareOp):
    """sum_i d^2/dx_i^2 (reference: diff.py:1799-1937)."""

    _data_fields = ("_ops",)

    def __init__(self, dim_shape, directions=None, diff_method="fd",
                 mode="constant", sampling=1.0, **diff_kwargs):
        dim_shape = as_canonical_shape(dim_shape)
        rank = len(dim_shape)
        directions = tuple(range(rank)) if directions is None else tuple(directions)
        kw = dict(diff_kwargs)
        if diff_method == "fd":
            kw.setdefault("scheme", "central")
            kw.setdefault("accuracy", 2)
        self._ops = tuple(
            _pd_factory(diff_method, dim_shape, _one_hot(rank, ax, 2), mode,
                        sampling, **kw)
            for ax in directions
        )
        super().__init__(dim_shape)
        self._lipschitz = sum(o.lipschitz for o in self._ops)
        self._name = "Laplacian"

    def apply(self, arr):
        arr = jnp.asarray(arr)
        out = None
        for op in self._ops:
            t = op.apply(arr)
            out = t if out is None else out + t
        return out

    def adjoint(self, arr):
        arr = jnp.asarray(arr)
        out = None
        for op in self._ops:
            t = op.adjoint(arr)
            out = t if out is None else out + t
        return out

    def _expr(self):
        return ("Laplacian", *self._ops)


# -------------------------------------------------------- directional ops ---

def _canon_dirs(directions, dim_shape):
    """Canonical (D,) constant / (D, *dim_shape) varying field, NORMALIZED
    to unit vectors like the reference ("directions are always normalized
    to be unit vectors", reference diff.py:2004, 2143-2149)."""
    v = jnp.asarray(directions)
    if not jnp.issubdtype(v.dtype, jnp.floating):
        v = v.astype(jnp.result_type(float))
    rank = len(dim_shape)
    varying = v.ndim > 1
    if varying:
        assert v.shape == (v.shape[0],) + tuple(dim_shape)
    assert v.shape[0] == rank
    v = v / jnp.linalg.norm(v, axis=0, keepdims=True)
    return v, varying


def _hessian_partials(dim_shape, diff_method, mode, sampling, diff_kwargs):
    """The D(D+1)/2 unique second-order partial ops, in (i <= j) order."""
    rank = len(dim_shape)
    kw = dict(diff_kwargs)
    if diff_method == "fd":
        kw.setdefault("scheme", "central")
        kw.setdefault("accuracy", 2)
    pairs = [(i, j) for i in range(rank) for j in range(i, rank)]
    ops = []
    for (i, j) in pairs:
        o = [0] * rank
        o[i] += 1
        o[j] += 1
        ops.append(_pd_factory(diff_method, dim_shape, tuple(o), mode,
                               sampling, **kw))
    return pairs, tuple(ops)


def _outer_weights(v1, v2, pairs):
    """Pointwise upper-triangular outer-product weights (off-diagonal x2,
    mirroring the reference's norm_dirs construction, diff.py:2149-2160)."""
    return tuple((1.0 if i == j else 2.0) * v1[i] * v2[j]
                 for (i, j) in pairs)


class _SecondDirDeriv(LinOp):
    """v1^T H v2 with pointwise outer-product weighting — the weights
    multiply the Hessian of f; the direction field itself is NOT
    differentiated (reference: "no differentiation is performed for this
    parameter", diff.py:2546-2759)."""

    _data_fields = ("_w", "_ops")

    def __init__(self, dim_shape, v1, v2, diff_method, mode, sampling,
                 diff_kwargs):
        dim_shape = as_canonical_shape(dim_shape)
        pairs, ops = _hessian_partials(dim_shape, diff_method, mode, sampling,
                                       diff_kwargs)
        self._ops = ops
        self._w = _outer_weights(v1, v2, pairs)
        super().__init__(dim_shape, dim_shape)
        wmax = [float(jnp.max(jnp.abs(w))) for w in self._w]
        self._lipschitz = sum(m * o.lipschitz for m, o in zip(wmax, ops))
        self._name = "SecondDirectionalDerivative"

    def apply(self, arr):
        arr = jnp.asarray(arr)
        out = None
        for w, op in zip(self._w, self._ops):
            t = w * op.apply(arr)
            out = t if out is None else out + t
        return out

    def adjoint(self, arr):
        arr = jnp.asarray(arr)
        out = None
        for w, op in zip(self._w, self._ops):
            t = op.adjoint(w * arr)
            out = t if out is None else out + t
        return out

    def _expr(self):
        return ("SecondDirectionalDerivative", *self._ops)


class _FirstDirDeriv(LinOp):
    """D_v x = sum_i v_i (D_i x), v constant or a spatially-varying unit
    field (reference: diff.py:1938-2185)."""

    _data_fields = ("_v", "_ops")

    def __init__(self, dim_shape, directions, diff_method, mode, sampling,
                 diff_kwargs):
        dim_shape = as_canonical_shape(dim_shape)
        rank = len(dim_shape)
        v, varying = _canon_dirs(directions, dim_shape)
        self._v = v
        self._varying = varying
        kw = dict(diff_kwargs)
        if diff_method == "fd":
            kw.setdefault("scheme", "central")
            kw.setdefault("accuracy", 2)
        self._ops = tuple(
            _pd_factory(diff_method, dim_shape, _one_hot(rank, ax), mode,
                        sampling, **kw)
            for ax in range(rank)
        )
        super().__init__(dim_shape, dim_shape)
        # unit directions: |v| = 1 pointwise
        self._lipschitz = _math.sqrt(sum(o.lipschitz**2 for o in self._ops))
        self._name = "FirstDirectionalDerivative"

    def apply(self, arr):
        arr = jnp.asarray(arr)
        out = None
        for i, op in enumerate(self._ops):
            t = self._v[i] * op.apply(arr)
            out = t if out is None else out + t
        return out

    def adjoint(self, arr):
        arr = jnp.asarray(arr)
        out = None
        for i, op in enumerate(self._ops):
            t = op.adjoint(self._v[i] * arr)
            out = t if out is None else out + t
        return out

    def _expr(self):
        return ("FirstDirectionalDerivative", *self._ops)


def DirectionalDerivative(dim_shape, order, directions=None,
                          diff_method: str = "fd", mode="constant",
                          sampling=1.0, **diff_kwargs):
    """Directional derivative of order 1 (sum_i v_i d/dx_i) or 2
    (v1^T H v2), reference diff.py:1938-2185: reference positional
    signature ``(arg_shape, order, directions)`` with directions
    normalized to unit vectors and ``diff_method="fd"`` default.
    ``DirectionalDerivative(shape, directions)`` (order omitted) is also
    accepted for backward compatibility."""
    if directions is None:
        order, directions = 1, order
    assert order in (1, 2), "`order` should be either 1 or 2"
    dim_shape = as_canonical_shape(dim_shape)
    if order == 1:
        return _FirstDirDeriv(dim_shape, directions, diff_method, mode,
                              sampling, diff_kwargs)
    if (isinstance(directions, (tuple, list)) and len(directions) == 2
            and getattr(jnp.asarray(directions[0]), "ndim", 0) >= 1
            and jnp.asarray(directions[0]).shape
            == jnp.asarray(directions[1]).shape):
        d1, d2 = directions
    else:
        d1 = d2 = directions
    v1, _ = _canon_dirs(d1, dim_shape)
    v2, _ = _canon_dirs(d2, dim_shape)
    return _SecondDirDeriv(dim_shape, v1, v2, diff_method, mode, sampling,
                           diff_kwargs)


def DirectionalGradient(dim_shape, directions, diff_method: str = "fd",
                        mode="constant", sampling=1.0, **diff_kwargs):
    """Stack of first directional derivatives over several direction
    (fields) (reference: diff.py:2186-2357)."""
    ops = [
        _FirstDirDeriv(as_canonical_shape(dim_shape), d, diff_method, mode,
                       sampling, diff_kwargs)
        for d in directions
    ]
    return _StackedDiff(ops, "DirectionalGradient")


class DirectionalLaplacian(SquareOp):
    """sum_d w_d v_d^T H v_d — the reference's second-derivative form
    (diff.py:2358-2545), NOT the divergence form sum D_v^T D_v (which is
    its negation for the antisymmetric first-derivative stencils)."""

    _data_fields = ("_dds",)

    def __init__(self, dim_shape, directions, weights=None,
                 diff_method: str = "fd", mode="constant", sampling=1.0,
                 **diff_kwargs):
        dim_shape = as_canonical_shape(dim_shape)
        directions = list(directions)
        if weights is None:
            weights = [1.0] * len(directions)
        elif len(weights) != len(directions):
            raise ValueError(
                "The number of weights and directions provided differ.")
        dds = []
        for w, d in zip(weights, directions):
            v, _ = _canon_dirs(d, dim_shape)
            dd = _SecondDirDeriv(dim_shape, v, v, diff_method, mode, sampling,
                                 diff_kwargs)
            dds.append((float(w), dd))
        self._weights = tuple(w for w, _ in dds)
        self._dds = tuple(dd for _, dd in dds)
        super().__init__(dim_shape)
        self._lipschitz = sum(abs(w) * d.lipschitz
                              for w, d in zip(self._weights, self._dds))
        self._name = "DirectionalLaplacian"

    def apply(self, arr):
        arr = jnp.asarray(arr)
        out = None
        for w, dd in zip(self._weights, self._dds):
            t = w * dd.apply(arr)
            out = t if out is None else out + t
        return out

    def adjoint(self, arr):
        arr = jnp.asarray(arr)
        out = None
        for w, dd in zip(self._weights, self._dds):
            t = w * dd.adjoint(arr)
            out = t if out is None else out + t
        return out

    def _expr(self):
        return ("DirectionalLaplacian", *self._dds)


def DirectionalHessian(dim_shape, directions, diff_method: str = "fd",
                       mode="constant", sampling=1.0, **diff_kwargs):
    """Stack of v_i^T H v_j, i <= j (reference: diff.py:2546-2759) — the
    direction fields pointwise-weight the Hessian of f and are not
    themselves differentiated."""
    dim_shape = as_canonical_shape(dim_shape)
    vs = [_canon_dirs(d, dim_shape)[0] for d in directions]
    ops = []
    for i in range(len(vs)):
        for j in range(i, len(vs)):
            ops.append(_SecondDirDeriv(dim_shape, vs[i], vs[j], diff_method,
                                       mode, sampling, diff_kwargs))
    return _StackedDiff(ops, "DirectionalHessian")
