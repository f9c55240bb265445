"""Parallel-beam 2-D Radon (X-ray) transform.

The reference framework ships no core Radon operator (tomography arrives via
its plugin ecosystem; see reference doc/intro/comparison.rst) but its
tomography examples and BASELINE workload 3 (sparse-view CT) require one.

TPU-native design: line integrals by bilinear sampling along rays
(`jax.scipy.ndimage.map_coordinates`, order=1) — a pure gather program that
jits and vmaps; one (angle, detector) pair per output sample.  The adjoint
(backprojection) is the exact transpose of the bilinear gather, obtained via
``jax.linear_transpose`` of the sampling program, so the adjoint dot-test
holds to machine precision.
"""

from __future__ import annotations

import math as _math

import jax
import jax.numpy as jnp
import numpy as np

from pyxu_tpu.abc.operator import LinOp
from pyxu_tpu.utils.misc import as_canonical_shape

__all__ = ["RadonTransform"]


class RadonTransform(LinOp):
    """dim (H, W) image -> codim (n_angles, n_det) sinogram."""

    _data_fields = ("_cos", "_sin", "_t", "_s")

    def __init__(self, dim_shape, angles, n_det: int = None, n_samples: int = None):
        dim_shape = as_canonical_shape(dim_shape)
        H, W = dim_shape
        angles = np.atleast_1d(np.asarray(angles, np.float64))
        n_det = n_det or int(_math.ceil(_math.hypot(H, W)))
        n_samples = n_samples or int(_math.ceil(_math.hypot(H, W)))
        super().__init__(dim_shape, (len(angles), n_det))
        self._n_angles = len(angles)
        self._n_det = n_det
        self._n_samples = n_samples
        self._cos = jnp.asarray(np.cos(angles))
        self._sin = jnp.asarray(np.sin(angles))
        R = 0.5 * _math.hypot(H, W)
        self._t = jnp.asarray(np.linspace(-R, R, n_det))
        self._s = jnp.asarray(np.linspace(-R, R, n_samples))
        self._ds = 2 * R / (n_samples - 1)
        # L <= sqrt(||A||_1 ||A||_inf): each ray integrates <= diag length,
        # each pixel is hit by <= n_angles rays x ds weighting
        self._lipschitz = float(
            _math.sqrt((2 * R) * self._n_angles * self._ds * 2))
        self._name = "RadonTransform"

    def _sample_single(self, img):
        H, W = self.dim_shape
        cy, cx = (H - 1) / 2.0, (W - 1) / 2.0

        def one_angle(c, s):
            # ray param: point = t * (c, s) + u * (-s, c); grid coords (row, col)
            t = self._t[:, None]
            u = self._s[None, :]
            row = cy + (t * s + u * c)
            col = cx + (t * c - u * s)
            vals = jax.scipy.ndimage.map_coordinates(
                img, [row, col], order=1, mode="constant", cval=0.0)
            return jnp.sum(vals, axis=-1) * self._ds

        return jax.vmap(one_angle)(self._cos, self._sin)

    def apply(self, arr):
        return self._map_batched(self._sample_single, jnp.asarray(arr),
                                 self.dim_rank, self.codim_shape)

    def adjoint(self, arr):
        arr = jnp.asarray(arr)
        dtype = arr.dtype

        def single(y):
            prim = jax.ShapeDtypeStruct(self.dim_shape, dtype)
            (x,) = jax.linear_transpose(self._sample_single, prim)(y)
            return x

        return self._map_batched(single, arr, self.codim_rank, self.dim_shape)

    def _expr(self):
        return (f"Radon[{self._n_angles} angles x {self._n_det} det]",)
