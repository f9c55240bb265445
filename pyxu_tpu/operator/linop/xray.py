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

from pyxu_tpu.abc.operator import LinOp, SelfAdjointOp
from pyxu_tpu.utils.misc import as_canonical_shape

__all__ = ["RadonTransform", "FourierRadon"]


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


class FourierRadon(LinOp):
    r"""Parallel-beam Radon transform via the Fourier-slice theorem.

    p_theta(t) = (1 / (n_det dt)) sum_q  phat_theta(w_q) e^{i w_q t},
    phat_theta(w) = F2[f](w . (cos theta, sin theta)),

    evaluated with one 2-D NUFFT type-2 at the polar frequency samples
    (n_angles x n_det points) followed by a per-angle inverse DFT — the
    NUFFT-powered fast path (MXU spreading) for CT at scale; the
    gather-based :class:`RadonTransform` remains the quadrature reference.
    Exactly linear with an exact adjoint (conjugate pipeline).

    Discretization: image pixels are centered modes (array center = origin);
    detector grid t_m = (m - (n_det-1)/2) dt with dt = 1 pixel.
    """

    _data_fields = ("_nufft", "_phase")

    def __init__(self, dim_shape, angles, n_det: int = None, eps: float = 1e-6):
        from pyxu_tpu.operator.linop.nufft import NUFFT

        dim_shape = as_canonical_shape(dim_shape)
        H, W = dim_shape
        angles = np.atleast_1d(np.asarray(angles, np.float64))
        n_det = n_det or int(2 ** _math.ceil(_math.log2(max(H, W) * 1.5)))
        super().__init__(dim_shape, (len(angles), n_det))
        self._n_angles = len(angles)
        self._n_det = n_det
        # polar frequency samples w_q theta_hat, q centered; dt = 1
        q = np.fft.fftfreq(n_det) * 2 * np.pi  # w_q in DFT bin order
        dirs = np.stack([np.cos(angles), np.sin(angles)], axis=1)  # (A, 2)
        pts = (q[None, :, None] * dirs[:, None, :]).reshape(-1, 2)  # (A*nd, 2)
        # F2[f](w) = sum_k f_k e^{-i w k}  ->  type-2 with isign = -1
        self._nufft = NUFFT.type2(pts, (H, W), isign=-1, eps=eps)
        # detector-center phase: t_m = (m - c_t);  p[m] = IFFT_q[phat_q e^{-i w_q c_t}]
        # stored as a real (n_det, 2) pair — an EAGER complex device transfer
        # is UNIMPLEMENTED on some TPU runtimes (axon) and poisons the worker;
        # the complex view is formed inside the traced pipeline instead
        ct = (n_det - 1) / 2.0
        ph = np.exp(-1j * q * ct).astype(np.complex64)
        self._phase = jnp.asarray(np.stack([ph.real, ph.imag], axis=-1))
        self._lipschitz = float(_math.sqrt(self._n_angles) * _math.sqrt(H * W))
        self._name = "FourierRadon"

    def _fw(self, img):
        from pyxu_tpu.utils.complex import (complex_dtype, view_as_complex,
                                            view_as_real)
        cdt = complex_dtype(img.dtype) if not jnp.iscomplexobj(img) else img.dtype
        z = img.astype(cdt)
        vr = view_as_real(z)
        vis = view_as_complex(self._nufft.apply(vr))  # (A*nd,) complex
        phase = view_as_complex(self._phase).astype(cdt)
        phat = vis.reshape(self._n_angles, self._n_det) * phase[None, :]
        p = jnp.fft.ifft(phat, axis=-1) * (1.0)  # (1/(nd dt)) * nd = 1
        return p.real

    def _bw(self, sino):
        from pyxu_tpu.utils.complex import (complex_dtype, view_as_complex,
                                            view_as_real)
        cdt = complex_dtype(sino.dtype)
        s = sino.astype(cdt)
        # adjoint of (real o ifft o phase o reshape o nufft):
        phat = jnp.fft.fft(s, axis=-1) / self._n_det  # ifft^H = fft / nd
        phase = view_as_complex(self._phase).astype(cdt)
        phat = phat * jnp.conj(phase)[None, :]
        vr = view_as_real(phat.reshape(-1))
        img = view_as_complex(self._nufft.adjoint(vr))
        return img.real

    def apply(self, arr):
        return self._map_batched(self._fw, jnp.asarray(arr), self.dim_rank,
                                 self.codim_shape)

    def adjoint(self, arr):
        return self._map_batched(self._bw, jnp.asarray(arr), self.codim_rank,
                                 self.dim_shape)

    def gram(self):
        r"""R^T R as real-kernel circulant convolutions (FFT-only, no
        spread/interp) — the PD3O/CG gradient path for CT runs NUFFT-free.

        With R = Re(G A), G = row-IFFT o diag(e^{-i w_q c_t}) and A the
        type-2 NUFFT at the polar samples, for real x:

            R^T R x = [Re(A^H G^H G A x) + Re(A^H G^H conj(G A x))] / 2.

        G^H G = I/n_det, so the first term is the (1/n_det)-scaled NUFFT
        Toeplitz kernel T[j] = sum_q e^{i w_q j}.  In the cross term,
        G^H conj(G .) pairs fftfreq bin q with -q mod n_det: the +/- pairs
        reproduce the SAME Toeplitz kernel, while the self-paired Nyquist
        bin (even n_det) contributes with phase e^{-2i pi c_t} =
        (-1)^{n_det-1} = -1 AND with e^{i w(k+k')} — a HANKEL section over
        the Nyquist points.  Net (even n_det):

            gram = (1/n_det) Re[ Toeplitz(T, w_nyq=1/2)
                                 - (1/2) Hankel(S_nyq) ],

        where Hankel(S) x = Toeplitz(S, shift=-1) applied to the
        index-reversed x (centered-mode storage k(i) = i - n//2 gives the
        -1 shift).  Odd n_det has no Nyquist bin: pure Toeplitz.
        """
        return _FourierRadonGram(self)

    def _expr(self):
        return (f"FourierRadon[{self._n_angles} angles x {self._n_det} det]",)


class _FourierRadonGram(SelfAdjointOp):
    """R^T R of :class:`FourierRadon` as FFT-only circulant convolutions
    (see FourierRadon.gram for the derivation)."""

    _data_fields = ("_t", "_h")

    def __init__(self, R: "FourierRadon"):
        from pyxu_tpu.operator.linop.nufft import _NUFFTToeplitz
        super().__init__(R.dim_shape)
        t1 = R._nufft._t1op
        nd, na = R._n_det, R._n_angles
        even = nd % 2 == 0 and nd > 1
        w = np.ones((na, nd), np.float64)
        if even:
            w[:, nd // 2] = 0.5
        self._t = _NUFFTToeplitz(t1._xh.a, t1._N, t1._isign, t1._eps,
                                 real_in=True, scale=1.0 / nd,
                                 weights=w.ravel())
        self._h = None
        if even:
            pts = t1._xh.a.reshape(na, nd, 2)[:, nd // 2, :]
            # centered-mode storage k(i) = i - n//2 under index reversal
            # gives offset (n-1) - 2(n//2): -1 on even image axes, 0 on odd
            self._h = _NUFFTToeplitz(
                np.ascontiguousarray(pts), t1._N, t1._isign, t1._eps,
                real_in=True, scale=0.5 / nd,
                kernel_shift=tuple(-1 if n % 2 == 0 else 0 for n in t1._N))
        self._approx_eps = float(t1._eps)
        self._lipschitz = self._t.lipschitz + \
            (self._h.lipschitz if self._h is not None else 0.0)
        self._name = "FourierRadonGram"

    def apply(self, arr):
        arr = jnp.asarray(arr)

        def single(x):
            y = self._t.apply(x)
            if self._h is not None:
                # (a single batched FFT over {x, flip(x)} was measured
                # speed-neutral on v5e — the convolutions are not
                # launch-bound — so the simple sequential form stays)
                xr = jnp.flip(x, axis=tuple(range(x.ndim)))
                y = y - self._h.apply(xr)
            return y

        return self._map_batched(single, arr, self.dim_rank, self.codim_shape)

    def adjoint(self, arr):
        return self.apply(arr)

    def _expr(self):
        return ("FourierRadonGram", self._t) if self._h is None else \
            ("FourierRadonGram", self._t, self._h)
