"""Sub-sampling / trimming operators.

Reference: src/pyxu/operator/linop/select.py:18-251 (`SubSample`, `Trim`).
``SubSample`` extracts a sub-tensor by per-axis specs (int / slice / bool
mask / index list); its adjoint zero-scatters back (L = 1, gram = orthogonal
projection onto the kept entries when indices are unique).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pyxu_tpu.abc.operator import LinOp
from pyxu_tpu.operator.linop.pad import _as_pad_width
from pyxu_tpu.utils.misc import as_canonical_shape

__all__ = ["SubSample", "Trim"]


class _StaticIndex:
    """Static (trace-constant) index array with content-based hash/equality —
    large index sets must not become million-element python tuples in the
    pytree aux (hashing/equality cost, host memory)."""

    __slots__ = ("arr", "_hash")

    def __init__(self, arr):
        self.arr = np.ascontiguousarray(np.asarray(arr, np.int64))
        self._hash = hash((self.arr.shape, self.arr.tobytes()))

    def __len__(self):
        return len(self.arr)

    def __iter__(self):
        return iter(self.arr.tolist())

    def __getitem__(self, i):
        return int(self.arr[i])

    def __eq__(self, other):
        return (isinstance(other, _StaticIndex)
                and np.array_equal(self.arr, other.arr))

    def __hash__(self):
        return self._hash

    def __repr__(self):
        return f"_StaticIndex({self.arr!r})"


class SubSample(LinOp):
    def __init__(self, dim_shape, *indices):
        dim_shape = as_canonical_shape(dim_shape)
        assert len(indices) <= len(dim_shape)
        specs = []
        codim = []
        for ax, n in enumerate(dim_shape):
            if ax < len(indices):
                spec = indices[ax]
            else:
                spec = slice(None)
            if isinstance(spec, (int, np.integer)):
                idx = np.asarray([int(spec)])
            elif isinstance(spec, slice):
                idx = np.arange(n)[spec]
            else:
                spec = np.asarray(spec)
                if spec.dtype == bool:
                    assert spec.shape == (n,)
                    idx = np.flatnonzero(spec)
                else:
                    idx = spec.astype(np.int64)
            # negative indices in [-n, 0) allowed; anything else is an error
            # (silent mod-n wrapping would return plausible wrong data)
            if idx.size and (idx.min() < -n or idx.max() >= n):
                raise IndexError(
                    f"axis {ax}: indices out of range for length {n}")
            idx = np.where(idx < 0, idx + n, idx)
            specs.append(np.asarray(idx, np.int64))
            codim.append(len(idx))
        super().__init__(dim_shape, tuple(codim))
        # static index arrays (host-side; baked into the trace as constants)
        self._idx = tuple(_StaticIndex(s) for s in specs)
        # L = prod_axis sqrt(max index multiplicity); 1.0 for unique specs
        L = 1.0
        for s in specs:
            mult = int(np.bincount(s).max()) if len(s) else 1
            L *= float(np.sqrt(mult))
        self._lipschitz = L
        self._name = "SubSample"

    def _is_identity_axis(self, ax_core: int) -> bool:
        idx = self._idx[ax_core].arr
        n = self.dim_shape[ax_core]
        return len(idx) == n and np.array_equal(idx, np.arange(n))

    def apply(self, arr):
        arr = jnp.asarray(arr)
        nb = arr.ndim - self.dim_rank
        out = arr
        for ax_core, idx in enumerate(self._idx):
            if self._is_identity_axis(ax_core):
                continue
            out = jnp.take(out, jnp.asarray(idx.arr, jnp.int32), axis=nb + ax_core)
        return out

    def adjoint(self, arr):
        arr = jnp.asarray(arr)
        nb = arr.ndim - self.codim_rank
        out = arr
        for ax_core in reversed(range(self.dim_rank)):
            if self._is_identity_axis(ax_core):
                continue
            idx = self._idx[ax_core]
            n = self.dim_shape[ax_core]
            ax = nb + ax_core
            shape = out.shape[:ax] + (n,) + out.shape[ax + 1:]
            z = jnp.zeros(shape, dtype=arr.dtype)
            out = z.at[(slice(None),) * ax + (jnp.asarray(idx.arr, jnp.int32),)].add(out)
        return out

    def estimate_lipschitz(self, **kw):
        return self._lipschitz

    def _expr(self):
        return (f"SubSample[{self.dim_shape}->{self.codim_shape}]",)


class Trim(LinOp):
    """Crop borders; the dual convenience of Pad (reference: select.py:205-251)."""

    def __init__(self, dim_shape, trim_width):
        dim_shape = as_canonical_shape(dim_shape)
        tw = _as_pad_width(trim_width, len(dim_shape))
        codim_shape = tuple(n - lo - hi for n, (lo, hi) in zip(dim_shape, tw))
        assert all(c > 0 for c in codim_shape)
        super().__init__(dim_shape, codim_shape)
        self._tw = tw
        self._lipschitz = 1.0
        self._name = "Trim"

    def apply(self, arr):
        arr = jnp.asarray(arr)
        nb = arr.ndim - self.dim_rank
        idx = (slice(None),) * nb + tuple(
            slice(lo, n - hi) for n, (lo, hi) in zip(self.dim_shape, self._tw)
        )
        return arr[idx]

    def adjoint(self, arr):
        arr = jnp.asarray(arr)
        nb = arr.ndim - self.codim_rank
        pads = ((0, 0),) * nb + self._tw
        return jnp.pad(arr, pads, mode="constant", constant_values=0)

    def estimate_lipschitz(self, **kw):
        return 1.0

    def _expr(self):
        return (f"Trim[{self._tw}]",)
