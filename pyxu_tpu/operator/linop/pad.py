"""Multi-dimensional padding operator.

Reference: src/pyxu/operator/linop/pad.py:16-416.  Modes constant / wrap /
reflect / symmetric / edge; the adjoint is the exact "trim + fold ghost
regions back" map (reference doc pad.py:84-130), hand-written here as pure
jnp slicing adds (XLA fuses them) rather than autodiff, because it sits on
the hot path of every stencil adjoint.

Lipschitz: ``A^T A`` is diagonal with entries = copy-multiplicity of each
input element, so ``L = sqrt(max multiplicity)`` — computed exactly at build
time by one apply/adjoint probe on ones (cheap, eager).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pyxu_tpu.abc.operator import LinOp
from pyxu_tpu.utils.misc import as_canonical_shape

__all__ = ["Pad"]

_MODES = ("constant", "wrap", "reflect", "symmetric", "edge")


def _as_pad_width(pad_width, rank: int):
    """Canonicalise to ((lo, hi), ...) per axis."""
    if isinstance(pad_width, (int, np.integer)):
        return tuple((int(pad_width), int(pad_width)) for _ in range(rank))
    pad_width = tuple(pad_width)
    if len(pad_width) == 2 and all(isinstance(p, (int, np.integer)) for p in pad_width) and rank == 1:
        return ((int(pad_width[0]), int(pad_width[1])),)
    out = []
    for p in pad_width:
        if isinstance(p, (int, np.integer)):
            out.append((int(p), int(p)))
        else:
            lo, hi = p
            out.append((int(lo), int(hi)))
    assert len(out) == rank, f"pad_width does not match rank {rank}"
    return tuple(out)


class Pad(LinOp):
    def __init__(self, dim_shape, pad_width, mode: str = "constant"):
        dim_shape = as_canonical_shape(dim_shape)
        pw = _as_pad_width(pad_width, len(dim_shape))
        codim_shape = tuple(n + lo + hi for n, (lo, hi) in zip(dim_shape, pw))
        super().__init__(dim_shape, codim_shape)
        mode = mode.lower()
        assert mode in _MODES, f"mode {mode} not in {_MODES}"
        for n, (lo, hi) in zip(dim_shape, pw):
            lim = n - 1 if mode == "reflect" else n  # reflect: width <= n-1
            assert max(lo, hi) <= lim, "pad width exceeds axis length (ghost overlap)"
        self._pw = pw
        self._mode = mode
        self._name = f"Pad[{mode}]"
        if mode == "constant":
            self._lipschitz = 1.0
        else:
            # A^T A is diagonal with per-element copy multiplicity, and the
            # fold-back is separable: max multiplicity factorizes per axis.
            # O(sum n) host-side 1-D probes (a full-size device probe at
            # build time would OOM/stall on large volumes).
            m = 1.0
            for n, (lo, hi) in zip(dim_shape, pw):
                if lo == 0 and hi == 0:
                    continue
                src = np.pad(np.arange(n), (lo, hi), mode=mode)
                m *= float(np.bincount(src, minlength=n).max())
            self._lipschitz = float(np.sqrt(m))

    def apply(self, arr):
        arr = jnp.asarray(arr)
        nb = arr.ndim - self.dim_rank
        pads = ((0, 0),) * nb + self._pw
        if self._mode == "constant":
            return jnp.pad(arr, pads, mode="constant", constant_values=0)
        return jnp.pad(arr, pads, mode=self._mode)

    def adjoint(self, arr):
        arr = jnp.asarray(arr)
        nb = arr.ndim - self.codim_rank
        out = arr
        # Fold ghosts axis-by-axis in reverse pad order, then trim.
        for ax_core in reversed(range(self.dim_rank)):
            ax = nb + ax_core
            lo, hi = self._pw[ax_core]
            n = self.dim_shape[ax_core]
            if lo == 0 and hi == 0:
                continue
            ghost_lo = _slice_axis(out, ax, 0, lo)
            core = _slice_axis(out, ax, lo, lo + n)
            ghost_hi = _slice_axis(out, ax, lo + n, lo + n + hi)
            m = self._mode
            if m == "constant":
                pass
            elif m == "wrap":
                if lo:
                    core = _add_at(core, ax, n - lo, n, ghost_lo)
                if hi:
                    core = _add_at(core, ax, 0, hi, ghost_hi)
            elif m == "reflect":
                if lo:
                    core = _add_at(core, ax, 1, lo + 1, jnp.flip(ghost_lo, axis=ax))
                if hi:
                    core = _add_at(core, ax, n - hi - 1, n - 1, jnp.flip(ghost_hi, axis=ax))
            elif m == "symmetric":
                if lo:
                    core = _add_at(core, ax, 0, lo, jnp.flip(ghost_lo, axis=ax))
                if hi:
                    core = _add_at(core, ax, n - hi, n, jnp.flip(ghost_hi, axis=ax))
            elif m == "edge":
                if lo:
                    core = _add_at(core, ax, 0, 1, jnp.sum(ghost_lo, axis=ax, keepdims=True))
                if hi:
                    core = _add_at(core, ax, n - 1, n, jnp.sum(ghost_hi, axis=ax, keepdims=True))
            out = core
        return out

    def _expr(self):
        return (f"Pad[{self._mode}, {self._pw}]",)


def _slice_axis(x, axis: int, start: int, stop: int):
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(start, stop)
    return x[tuple(idx)]


def _add_at(x, axis: int, start: int, stop: int, val):
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(start, stop)
    return x.at[tuple(idx)].add(val)
