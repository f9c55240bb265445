r"""Multi-dimensional DFT operator (XLA FFT).

Reference: src/pyxu/operator/linop/fft/fft.py:17-379.  The reference
dispatches to scipy.fft / cuFFT with `_dask_zip` batching; on TPU the XLA
FFT is a single fused HLO — batching over leading axes is native.

Public API is real-valued like the reference's: complex arrays ride as a
trailing axis of size 2 (see pyxu_tpu.utils.complex — the reference
interleaves on a doubled last axis instead, util/complex.py:13-322).

Conventions (reference: fft.py:17-41): unnormalized DFT
``A x[k] = sum_n x[n] exp(-2j pi <n/N, k>)``; ``A* = N . ifft``;
``A* A = N . I`` (gram), ``svdvals = sqrt(N)``, ``pinv = A*/N``.
"""

from __future__ import annotations

import math as _math

import jax
import jax.numpy as jnp
import numpy as np

from pyxu_tpu.abc.operator import LinOp
from pyxu_tpu.utils.complex import view_as_complex, view_as_real
from pyxu_tpu.utils.misc import as_canonical_shape

__all__ = ["FFT"]


class FFT(LinOp):
    def __init__(self, dim_shape, axes=None, real: bool = False):
        """``dim_shape``: spatial (complex-domain) shape, no trailing 2.

        real=True: domain is real ``(*dim_shape)``; codomain ``(*dim_shape, 2)``.
        real=False: both ``(*dim_shape, 2)``.
        """
        sp = as_canonical_shape(dim_shape)
        D = len(sp)
        if axes is None:
            axes = tuple(range(D))
        raw = axes if isinstance(axes, (tuple, list)) else (axes,)
        axes = tuple(sorted({a % D for a in raw}))
        assert len(axes) == len(raw), "duplicate/aliased FFT axes"

        self._sp = sp
        self._axes = axes
        self._real = bool(real)
        dim = sp if real else sp + (2,)
        super().__init__(dim, sp + (2,))
        self._N = int(np.prod([sp[a] for a in axes]))
        self._lipschitz = _math.sqrt(self._N)
        self._name = "FFT"

    def _fft_axes(self, zndim):
        # axes of the complex array, counted from the trailing spatial dims
        D = len(self._sp)
        return tuple(zndim - D + a for a in self._axes)

    def _apply_impl(self, arr):
        z = arr if self._real else view_as_complex(arr)
        out = jnp.fft.fftn(z, axes=self._fft_axes(z.ndim))
        return view_as_real(out)

    def _adjoint_impl(self, arr):
        z = view_as_complex(arr)
        out = jnp.fft.ifftn(z, axes=self._fft_axes(z.ndim)) * self._N
        return out.real if self._real else view_as_real(out)

    def apply(self, arr):
        arr = jnp.asarray(arr)
        if not isinstance(arr, jax.core.Tracer):
            # eager complex arithmetic is UNIMPLEMENTED on some TPU runtimes
            # and poisons the client (CLAUDE.md) — run the complex pipeline
            # under jit even for eager calls
            return _fft_apply_jit(self, arr)
        return self._apply_impl(arr)

    def adjoint(self, arr):
        arr = jnp.asarray(arr)
        if not isinstance(arr, jax.core.Tracer):
            return _fft_adjoint_jit(self, arr)
        return self._adjoint_impl(arr)

    def estimate_lipschitz(self, **kw) -> float:
        return self._lipschitz

    def svdvals(self, k: int = 1, **kw):
        from pyxu_tpu.info.dtypes import default_fdtype
        return jnp.full(k, _math.sqrt(self._N), dtype=default_fdtype())

    def gram(self):
        """A* A = N I — same closed form for real and complex domains
        (reference: fft.py:216-256); only the COgram differs for real=True."""
        from pyxu_tpu.operator.linop.base import HomothetyOp
        return HomothetyOp(self.dim_shape, float(self._N))

    def pinv(self, arr, damp: float = 0.0, **kw):
        out = self.adjoint(arr)
        return out / (self._N + damp)

    def dagger(self, damp: float = 0.0, **kw):
        from pyxu_tpu.abc import arithmetic
        return arithmetic.scale(arithmetic.transpose(self), 1.0 / (self._N + damp))

    def cogram(self):
        from pyxu_tpu.operator.linop.base import HomothetyOp
        if self._real:
            # A A* on C^sp is N . (projection onto conjugate-symmetric fields);
            # no closed form as a Homothety — fall back to generic
            return super().cogram()
        return HomothetyOp(self.codim_shape, float(self._N))

    def _expr(self):
        return (f"FFT[axes={self._axes}, real={self._real}]",)


# module-level jitted dispatch for eager calls (op rides as a pytree arg)
_fft_apply_jit = jax.jit(lambda op, a: op._apply_impl(a))
_fft_adjoint_jit = jax.jit(lambda op, a: op._adjoint_impl(a))
