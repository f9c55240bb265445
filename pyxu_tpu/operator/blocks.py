"""Block-operator composition: stack / vstack / hstack / block_diag / block /
coo_block.

Reference: src/pyxu/operator/blocks.py:30-1008 (`stack` :30, `vstack` :74,
`hstack` :140, `block_diag` :204, `block` :316, `coo_block` :387,
`_COOBlock` :512 with optional Dask-parallel block evaluation :474-511).

TPU re-design: block evaluation needs no task graph — XLA fuses the
per-block computations of one traced apply.  For *homogeneous* operator
families (same class, same static aux data, same shapes) ``block_diag`` and
``stack`` use a *vmapped fast path*: the operators' array leaves are stacked
into batched leaves and one ``jax.vmap(apply)`` evaluates every block as a
single batched XLA op (the MXU-friendly replacement for the reference's
dask-delayed per-block tasks).
"""

from __future__ import annotations

import math as _math

import jax
import jax.numpy as jnp
import numpy as np

from pyxu_tpu.abc.operator import (
    LinOp,
    Property,
    ProxFunc,
    infer_operator_class,
)

__all__ = ["stack", "vstack", "hstack", "block_diag", "block", "coo_block"]


# ------------------------------------------------------------- homogeneity --

def _homogeneous(ops) -> bool:
    """True when all ops share treedef + leaf shapes (vmap fast path)."""
    try:
        flats = [jax.tree_util.tree_flatten(op) for op in ops]
    except Exception:
        return False
    (l0, t0) = flats[0]
    if any(t != t0 for _, t in flats[1:]):
        return False
    for leaves, _ in flats[1:]:
        if len(leaves) != len(l0):
            return False
        for a, b in zip(leaves, l0):
            if jnp.shape(a) != jnp.shape(b) or jnp.result_type(a) != jnp.result_type(b):
                return False
    return len(l0) > 0


_STACK_CACHE = {}  # id(ops tuple) -> (ops, treedef, stacked leaves)
_STACK_CACHE_MAX = 64


def _stack_ops(ops):
    """Stack leaves of homogeneous ops: returns (treedef, stacked leaves).

    Cached per ops-tuple identity so the eager path does not re-stack every
    plan/kernel table on every apply.  The cache holds a STRONG reference to
    the ops tuple (tuples cannot be weak-referenced) — the `hit[0] is ops`
    check stays valid because a cached tuple's id cannot be reused while it
    is alive.  Tracer leaves are never cached (storing tracers in a global
    would leak them past their trace)."""
    key = id(ops)
    hit = _STACK_CACHE.get(key)
    if hit is not None and hit[0] is ops:
        return hit[1], hit[2]
    leaves_list = [jax.tree_util.tree_flatten(op)[0] for op in ops]
    treedef = jax.tree_util.tree_flatten(ops[0])[1]
    stacked = [jnp.stack(ls) for ls in zip(*leaves_list)]
    traced = any(isinstance(l, jax.core.Tracer)
                 for ls in leaves_list for l in ls)
    if not traced:
        if len(_STACK_CACHE) >= _STACK_CACHE_MAX:
            _STACK_CACHE.clear()
        _STACK_CACHE[key] = (ops, treedef, stacked)
    return treedef, stacked


# ------------------------------------------------------------------- stack --

class _Stack(LinOp):
    """ops: same dim & codim; codim gains a leading axis of size N
    (reference: blocks.py:30-73)."""

    _data_fields = ("_ops",)

    def __init__(self, ops):
        d0, c0 = ops[0].dim_shape, ops[0].codim_shape
        assert all(o.dim_shape == d0 and o.codim_shape == c0 for o in ops)
        super().__init__(d0, (len(ops),) + tuple(c0))
        self._ops = tuple(ops)
        self._vmap = _homogeneous(ops)
        self._lipschitz = _math.sqrt(sum(o.lipschitz**2 for o in ops))
        self._name = "Stack"

    def apply(self, arr):
        arr = jnp.asarray(arr)
        ax = arr.ndim - self.dim_rank
        if self._vmap:
            treedef, leaves = _stack_ops(self._ops)

            def one(ls):
                return jax.tree_util.tree_unflatten(treedef, ls).apply(arr)

            out = jax.vmap(one)(leaves)  # (N, *batch, *codim)
            return jnp.moveaxis(out, 0, ax)
        return jnp.stack([o.apply(arr) for o in self._ops], axis=ax)

    def adjoint(self, arr):
        arr = jnp.asarray(arr)
        ax = arr.ndim - self.codim_rank
        parts = [o.adjoint(jnp.take(arr, i, axis=ax)) for i, o in enumerate(self._ops)]
        out = parts[0]
        for p in parts[1:]:
            out = out + p
        return out

    def _expr(self):
        return ("stack", *self._ops)


def stack(ops):
    """Stack same-shape operators along a new leading codim axis."""
    return _Stack(list(ops))


# ------------------------------------------------- vstack / hstack (axis 0) --

class _VStack(LinOp):
    """Concatenate codomains along axis 0 (reference: blocks.py:74-139)."""

    _data_fields = ("_ops",)

    def __init__(self, ops):
        d0 = ops[0].dim_shape
        tail = ops[0].codim_shape[1:]
        assert all(o.dim_shape == d0 and o.codim_shape[1:] == tail for o in ops)
        total = sum(o.codim_shape[0] for o in ops)
        super().__init__(d0, (total,) + tuple(tail))
        self._ops = tuple(ops)
        self._splits = np.cumsum([o.codim_shape[0] for o in ops])[:-1].tolist()
        self._lipschitz = _math.sqrt(sum(o.lipschitz**2 for o in ops))
        self._name = "VStack"

    def apply(self, arr):
        arr = jnp.asarray(arr)
        ax = arr.ndim - self.dim_rank
        return jnp.concatenate([o.apply(arr) for o in self._ops], axis=ax)

    def adjoint(self, arr):
        arr = jnp.asarray(arr)
        ax = arr.ndim - self.codim_rank
        pieces = jnp.split(arr, self._splits, axis=ax)
        out = None
        for o, p in zip(self._ops, pieces):
            t = o.adjoint(p)
            out = t if out is None else out + t
        return out

    def _expr(self):
        return ("vstack", *self._ops)


def vstack(ops):
    return _VStack(list(ops))


class _HStack(LinOp):
    """Concatenate domains along axis 0 (reference: blocks.py:140-203)."""

    _data_fields = ("_ops",)

    def __init__(self, ops):
        c0 = ops[0].codim_shape
        tail = ops[0].dim_shape[1:]
        assert all(o.codim_shape == c0 and o.dim_shape[1:] == tail for o in ops)
        total = sum(o.dim_shape[0] for o in ops)
        super().__init__((total,) + tuple(tail), c0)
        self._ops = tuple(ops)
        self._splits = np.cumsum([o.dim_shape[0] for o in ops])[:-1].tolist()
        self._lipschitz = _math.sqrt(sum(o.lipschitz**2 for o in ops))
        self._name = "HStack"

    def apply(self, arr):
        arr = jnp.asarray(arr)
        ax = arr.ndim - self.dim_rank
        pieces = jnp.split(arr, self._splits, axis=ax)
        out = None
        for o, p in zip(self._ops, pieces):
            t = o.apply(p)
            out = t if out is None else out + t
        return out

    def adjoint(self, arr):
        arr = jnp.asarray(arr)
        ax = arr.ndim - self.codim_rank
        return jnp.concatenate([o.adjoint(arr) for o in self._ops], axis=ax)

    def _expr(self):
        return ("hstack", *self._ops)


def hstack(ops):
    return _HStack(list(ops))


# -------------------------------------------------------------- block_diag --

class _BlockDiag(LinOp):
    """dim (N, *d), codim (N, *c): op_i acts on slice i
    (reference: blocks.py:204-315).  Homogeneous families evaluate as ONE
    vmapped apply."""

    _data_fields = ("_ops",)

    def __init__(self, ops):
        d0, c0 = ops[0].dim_shape, ops[0].codim_shape
        assert all(o.dim_shape == d0 and o.codim_shape == c0 for o in ops)
        super().__init__((len(ops),) + tuple(d0), (len(ops),) + tuple(c0))
        self._ops = tuple(ops)
        self._vmap = _homogeneous(ops)
        self._lipschitz = max(o.lipschitz for o in ops)
        self._name = "BlockDiag"

    def _eval(self, arr, mode: str):
        arr = jnp.asarray(arr)
        in_rank = self.dim_rank if mode == "apply" else self.codim_rank
        ax = arr.ndim - in_rank
        if self._vmap:
            treedef, leaves = _stack_ops(self._ops)

            def one(ls, x):
                op = jax.tree_util.tree_unflatten(treedef, ls)
                return getattr(op, mode)(x)

            moved = jnp.moveaxis(arr, ax, 0)  # (N, *batch, *core)
            out = jax.vmap(one)(leaves, moved)
            return jnp.moveaxis(out, 0, ax)
        outs = [getattr(o, mode)(jnp.take(arr, i, axis=ax))
                for i, o in enumerate(self._ops)]
        return jnp.stack(outs, axis=ax)

    def apply(self, arr):
        return self._eval(arr, "apply")

    def adjoint(self, arr):
        return self._eval(arr, "adjoint")

    def _expr(self):
        return ("block_diag", *self._ops)


class _SeparableSumMixin:
    """block_diag of functionals = separable sum over the leading axis:
    F(x) = sum_i f_i(x[i]); prox/grad are per-slice when every member has
    them (reference: _COOBlock prox/grad for block_diag-of-functionals).

    The concrete class is inferred from the INTERSECTION of the members'
    property sets, so a sum of grad-only DiffFuncs does not advertise a prox
    it cannot compute (and vice versa)."""

    def _init_sum(self, funcs):
        from pyxu_tpu.abc.operator import Operator
        d0 = funcs[0].dim_shape
        assert all(f.dim_shape == d0 for f in funcs)
        Operator.__init__(self, (len(funcs),) + tuple(d0), ())
        self._funcs = tuple(funcs)
        self._vmap = _homogeneous(funcs)
        self._name = "SeparableSum"

    def apply(self, arr):
        arr = jnp.asarray(arr)
        ax = arr.ndim - self.dim_rank
        vals = [f.apply(jnp.take(arr, i, axis=ax))
                for i, f in enumerate(self._funcs)]
        out = vals[0]
        for v in vals[1:]:
            out = out + v
        return out

    def prox(self, arr, tau):
        arr = jnp.asarray(arr)
        ax = arr.ndim - self.dim_rank
        if self._vmap:
            treedef, leaves = _stack_ops(self._funcs)
            moved = jnp.moveaxis(arr, ax, 0)

            def one(ls, x):
                return jax.tree_util.tree_unflatten(treedef, ls).prox(x, tau)

            out = jax.vmap(one)(leaves, moved)
            return jnp.moveaxis(out, 0, ax)
        outs = [f.prox(jnp.take(arr, i, axis=ax), tau)
                for i, f in enumerate(self._funcs)]
        return jnp.stack(outs, axis=ax)

    def grad(self, arr):
        arr = jnp.asarray(arr)
        ax = arr.ndim - self.dim_rank
        outs = [f.grad(jnp.take(arr, i, axis=ax))
                for i, f in enumerate(self._funcs)]
        return jnp.stack(outs, axis=ax)

    def _expr(self):
        return ("separable_sum", *self._funcs)


import functools as _functools


@_functools.cache
def _separable_sum_class(base: type) -> type:
    cls = type(f"SeparableSum[{base.__name__}]", (_SeparableSumMixin, base), {
        "_data_fields": ("_funcs",),
    })
    return cls


def _separable_sum(funcs):
    common = frozenset.intersection(*[f.properties() for f in funcs])
    # QUADRATIC would require synthesizing a block-diag _quad_spec; drop it
    # (conservative: loses a specialization, never advertises a missing one)
    common = common - {Property.QUADRATIC}
    base = infer_operator_class(common)
    op = object.__new__(_separable_sum_class(base))
    op._init_sum(funcs)
    return op


def block_diag(ops):
    ops = list(ops)
    if all(op.has(Property.FUNCTIONAL) for op in ops):
        return _separable_sum(ops)
    return _BlockDiag(ops)


# ----------------------------------------------------- general block / coo --

class _COOBlock(LinOp):
    """Sparse coarse grid of operator blocks on **flattened** segments
    (reference: blocks.py:387-1008).  dim/codim are 1-D; block (i, j) maps
    input segment j to output segment i; same-row blocks sum.
    """

    _data_fields = ("_ops",)

    def __init__(self, blocks, grid_shape):
        R, C = grid_shape
        row_sizes = [None] * R
        col_sizes = [None] * C
        for (i, j), op in blocks.items():
            cs, ds = op.codim_size, op.dim_size
            assert row_sizes[i] in (None, cs), f"row {i} size mismatch"
            assert col_sizes[j] in (None, ds), f"col {j} size mismatch"
            row_sizes[i], col_sizes[j] = cs, ds
        assert all(s is not None for s in row_sizes), "empty block row"
        assert all(s is not None for s in col_sizes), "empty block column"
        super().__init__((int(np.sum(col_sizes)),), (int(np.sum(row_sizes)),))
        self._keys = tuple(sorted(blocks))
        self._ops = tuple(blocks[k] for k in self._keys)
        self._row_off = np.concatenate([[0], np.cumsum(row_sizes)]).tolist()
        self._col_off = np.concatenate([[0], np.cumsum(col_sizes)]).tolist()
        self._grid = (R, C)
        L2 = 0.0  # upper bound: sqrt(sum of block L^2)
        for op in self._ops:
            L2 += op.lipschitz**2
        self._lipschitz = _math.sqrt(L2)
        self._name = "COOBlock"

    def _seg(self, arr, ax, off, i, size):
        idx = (slice(None),) * ax + (slice(off[i], off[i] + size),)
        return arr[idx]

    def apply(self, arr):
        arr = jnp.asarray(arr)
        ax = arr.ndim - 1
        batch = arr.shape[:ax]
        R, C = self._grid
        rows = [None] * R
        for (i, j), op in zip(self._keys, self._ops):
            seg = self._seg(arr, ax, self._col_off, j, op.dim_size)
            x = seg.reshape(batch + tuple(op.dim_shape))
            y = op.apply(x).reshape(batch + (op.codim_size,))
            rows[i] = y if rows[i] is None else rows[i] + y
        return jnp.concatenate(rows, axis=ax)

    def adjoint(self, arr):
        arr = jnp.asarray(arr)
        ax = arr.ndim - 1
        batch = arr.shape[:ax]
        R, C = self._grid
        cols = [None] * C
        for (i, j), op in zip(self._keys, self._ops):
            seg = self._seg(arr, ax, self._row_off, i, op.codim_size)
            y = seg.reshape(batch + tuple(op.codim_shape))
            x = op.adjoint(y).reshape(batch + (op.dim_size,))
            cols[j] = x if cols[j] is None else cols[j] + x
        return jnp.concatenate(cols, axis=ax)

    def _expr(self):
        return (f"coo_block[grid={self._grid}]", *self._ops)


def coo_block(spec, grid_shape):
    """``spec``: dict {(i, j): op} (reference: blocks.py:387-511)."""
    return _COOBlock(dict(spec), tuple(grid_shape))


def block(grid):
    """Dense 2-D grid (list of rows) of blocks (reference: blocks.py:316-386)."""
    blocks = {}
    for i, row in enumerate(grid):
        for j, op in enumerate(row):
            if op is not None:
                blocks[(i, j)] = op
    R = len(grid)
    C = max(len(r) for r in grid)
    return _COOBlock(blocks, (R, C))
