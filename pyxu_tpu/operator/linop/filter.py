"""Classic correlation filters + structure tensor.

Reference: src/pyxu/operator/linop/filter.py:74-1042 (`MovingAverage` :74,
`Gaussian` :187, `DifferenceOfGaussians` :314, `Laplace` :443, `Sobel` :536,
`Prewitt` :636, `Scharr` :735 via `_EdgeFilter` :833, `StructureTensor`
:875).  All are thin kernel-factories over the XLA-native separable
:class:`~pyxu_tpu.operator.linop.stencil.Stencil` (the reference instantiates
Numba stencils instead); `StructureTensor` composes Gradient + smoothing.
"""

from __future__ import annotations

import math as _math

import jax.numpy as jnp
import numpy as np

from pyxu_tpu.abc.operator import DiffMap
from pyxu_tpu.operator.linop.diff import Gradient, _gauss_deriv_kernel
from pyxu_tpu.operator.linop.stencil import Stencil
from pyxu_tpu.utils.misc import as_canonical_shape

__all__ = [
    "MovingAverage",
    "Gaussian",
    "DifferenceOfGaussians",
    "DoG",
    "Laplace",
    "Sobel",
    "Prewitt",
    "Scharr",
    "StructureTensor",
]


def _per_axis(v, rank):
    if isinstance(v, (list, tuple)):
        assert len(v) == rank
        return tuple(v)
    return (v,) * rank


def MovingAverage(dim_shape, size, center=None, mode="constant"):
    """Uniform filter via separable 1-D kernels (reference: filter.py:74-186)."""
    dim_shape = as_canonical_shape(dim_shape)
    D = len(dim_shape)
    sizes = _per_axis(size, D)
    if center is None:
        assert all(s % 2 == 1 for s in sizes), "even size needs explicit center"
        center = tuple(s // 2 for s in sizes)
    center = _per_axis(center, D) if not isinstance(center, (list, tuple)) else tuple(center)
    norm = float(np.prod(sizes))
    kernels = [jnp.ones(s) for s in sizes]
    kernels[0] = kernels[0] / norm
    op = Stencil(dim_shape, kernels, list(center), mode=mode) if D > 1 else \
        Stencil(dim_shape, kernels[0], center[0], mode=mode)
    op._name = "MovingAverage"
    return op


def _gauss_axis_kernels(D, sigma, truncate, order, sampling):
    sigmas = _per_axis(sigma, D)
    truncs = _per_axis(truncate, D)
    orders = _per_axis(order, D)
    samps = _per_axis(sampling, D)
    ks, cs = [], []
    for s, t, o, dx in zip(sigmas, truncs, orders, samps):
        # grid spacing like the reference (filter.py:294-306): sigma in
        # physical units -> pixels, derivative taps scaled by sampling^order
        off, k = _gauss_deriv_kernel(int(o), float(s) / float(dx), float(t))
        ks.append(jnp.asarray(np.asarray(k) / float(dx) ** int(o)))
        cs.append(int(-off[0]))
    return ks, cs


def Gaussian(dim_shape, sigma=1.0, truncate=3.0, order=0, mode="constant",
             sampling=1.0):
    """(Derivative-of-)Gaussian filter (reference: filter.py:187-313)."""
    dim_shape = as_canonical_shape(dim_shape)
    D = len(dim_shape)
    ks, cs = _gauss_axis_kernels(D, sigma, truncate, order, sampling)
    op = Stencil(dim_shape, ks, cs, mode=mode) if D > 1 else \
        Stencil(dim_shape, ks[0], cs[0], mode=mode)
    op._name = "Gaussian"
    return op


def DifferenceOfGaussians(dim_shape, low_sigma=1.0, high_sigma=None,
                          low_truncate=3.0, high_truncate=3.0, mode="constant",
                          sampling=1.0):
    """DoG band-pass (reference: filter.py:314-442)."""
    dim_shape = as_canonical_shape(dim_shape)
    if high_sigma is None:
        sigmas = _per_axis(low_sigma, len(dim_shape))
        high_sigma = tuple(1.6 * s for s in sigmas)
    lo = Gaussian(dim_shape, sigma=low_sigma, truncate=low_truncate,
                  mode=mode, sampling=sampling)
    hi = Gaussian(dim_shape, sigma=high_sigma, truncate=high_truncate,
                  mode=mode, sampling=sampling)
    op = lo - hi
    op._name = "DifferenceOfGaussians"
    return op


def Laplace(dim_shape, mode="constant", sampling=1.0):
    """Discrete Laplace filter: sum of [1, -2, 1]/sampling along each axis
    (reference: filter.py:443-535 scales each axis kernel by 1/sampling)."""
    dim_shape = as_canonical_shape(dim_shape)
    D = len(dim_shape)
    samps = _per_axis(sampling, D)
    k = np.zeros((3,) * D)
    for ax in range(D):
        idx = [1] * D
        for v, val in ((0, 1.0), (1, -2.0), (2, 1.0)):
            j = list(idx)
            j[ax] = v
            k[tuple(j)] += val / float(samps[ax])
    op = Stencil(dim_shape, jnp.asarray(k), (1,) * D, mode=mode)
    op._name = "Laplace"
    return op


def _edge_filter(dim_shape, axis, smooth, mode, sampling):
    """Separable edge filter: correlation derivative [-1, 0, 1] along
    ``axis``, ``smooth`` along the others (reference: `_EdgeFilter`,
    filter.py:833-874)."""
    dim_shape = as_canonical_shape(dim_shape)
    D = len(dim_shape)
    sampling = _per_axis(sampling, D)
    ks, cs = [], []
    for ax in range(D):
        if ax == axis:
            ks.append(jnp.asarray([-1.0, 0.0, 1.0]) / sampling[ax])
        else:
            ks.append(jnp.asarray(smooth) / sampling[ax])
        cs.append(1)
    return Stencil(dim_shape, ks, cs, mode=mode) if D > 1 else \
        Stencil(dim_shape, ks[0], cs[0], mode=mode)


def _edge_family(name, smooth):
    def factory(dim_shape, axis=None, mode="constant", sampling=1.0):
        """axis given: the single separable edge Stencil; axis=None: the
        gradient-magnitude DiffMap (1/sqrt(D)) sqrt(sum_i square(S_i))
        (reference: filter.py:862-870)."""
        from pyxu_tpu.operator.map.ufunc import sqrt as _sqrt, square as _square
        dim_shape = as_canonical_shape(dim_shape)
        D = len(dim_shape)
        if axis is not None or D == 1:
            op = _edge_filter(dim_shape, axis if axis is not None else 0,
                              smooth, mode, sampling)
            op._name = name
            return op
        op = None
        for ax in range(D):
            t = _square(_edge_filter(dim_shape, ax, smooth, mode, sampling))
            op = t if op is None else op + t
        op = (1.0 / _math.sqrt(D)) * _sqrt(op)
        op._name = name
        return op
    factory.__name__ = name
    factory.__doc__ = f"{name} edge filter (reference: filter.py:536-832)."
    return factory


# normalized smoothing kernels like the reference (filter.py:623, 722, 820:
# [1,2,1]/4, [1,1,1]/3, [3,10,3]/16) — unnormalized taps scale every output
# by 4x/3x/16x per smoothing axis
Sobel = _edge_family("Sobel", [0.25, 0.5, 0.25])
Prewitt = _edge_family("Prewitt", [1 / 3, 1 / 3, 1 / 3])
Scharr = _edge_family("Scharr", [3 / 16, 10 / 16, 3 / 16])


class StructureTensor(DiffMap):
    """Smoothed outer product of gradients: codim (D(D+1)/2, *dim_shape)
    (reference: filter.py:875-1042)."""

    _data_fields = ("_grad", "_smooth")

    def __init__(self, dim_shape, diff_method="fd", smooth_sigma=1.0,
                 smooth_truncate=3.0, mode="constant", sampling=1.0,
                 **diff_kwargs):
        dim_shape = as_canonical_shape(dim_shape)
        D = len(dim_shape)
        self._pairs = [(i, j) for i in range(D) for j in range(i, D)]
        super().__init__(dim_shape, (len(self._pairs),) + tuple(dim_shape))
        self._grad = Gradient(dim_shape, diff_method=diff_method, mode=mode,
                              sampling=sampling, **diff_kwargs)
        self._smooth = (Gaussian(dim_shape, sigma=smooth_sigma,
                                 truncate=smooth_truncate, mode=mode)
                        if smooth_sigma else None)
        self._name = "StructureTensor"

    def apply(self, arr):
        arr = jnp.asarray(arr)
        g = self._grad.apply(arr)  # (*batch, D, *sp)
        ax = arr.ndim - self.dim_rank
        outs = []
        for (i, j) in self._pairs:
            prod = jnp.take(g, i, axis=ax) * jnp.take(g, j, axis=ax)
            outs.append(self._smooth.apply(prod) if self._smooth is not None else prod)
        return jnp.stack(outs, axis=ax)

    def _expr(self):
        return ("StructureTensor", self._grad)


DoG = DifferenceOfGaussians  # reference alias (filter.py:314)
