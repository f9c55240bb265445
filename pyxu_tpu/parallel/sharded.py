"""GSPMD sharding wrappers for operators + sharded block evaluation.

TPU-native replacement of the reference's Dask-chunked execution
(reference: SURVEY §2.4; `coo_block(..., parallel=True)` dask tasks,
src/pyxu/operator/blocks.py:474-511): wrap any operator so its apply/adjoint
run with input/output sharding constraints — XLA GSPMD inserts the
collectives (halo exchanges for convs, psums for reductions) automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pyxu_tpu.abc.operator import (LinOp, Operator, Property,
                                    infer_operator_class)

__all__ = ["with_sharding", "sharded_block_diag"]


class _ShardedMixin:
    """op with sharding constraints on inputs/outputs (GSPMD partitioning).
    Composed with the operator class matching the wrapped op's PROPERTIES —
    subclassing LinOp unconditionally would claim LINEAR for nonlinear ops
    (wrong jacobian fast path) and drop PROXIMABLE/DIFFERENTIABLE."""

    _data_fields = ("_op",)

    def __init__(self, op: Operator, mesh: Mesh, in_spec, out_spec):
        Operator.__init__(self, op.dim_shape, op.codim_shape)
        self._op = op
        self._mesh = mesh
        self._in_spec = in_spec
        self._out_spec = out_spec
        self._lipschitz = op._lipschitz
        self._diff_lipschitz = op._diff_lipschitz
        self._name = f"Sharded[{op.name}]"

    def _shardings(self, spec, extra_batch):
        full = P(*([None] * extra_batch + list(spec)))
        return NamedSharding(self._mesh, full)

    def apply(self, arr):
        arr = jnp.asarray(arr)
        b = arr.ndim - self.dim_rank
        arr = jax.lax.with_sharding_constraint(arr, self._shardings(self._in_spec, b))
        out = self._op.apply(arr)
        return jax.lax.with_sharding_constraint(out, self._shardings(self._out_spec, b))

    def adjoint(self, arr):
        arr = jnp.asarray(arr)
        b = arr.ndim - self.codim_rank
        arr = jax.lax.with_sharding_constraint(arr, self._shardings(self._out_spec, b))
        out = self._op.adjoint(arr)
        return jax.lax.with_sharding_constraint(out, self._shardings(self._in_spec, b))

    def grad(self, arr):
        # grad lives in dim space on both sides: constrain like apply so the
        # partitioning intent reaches the methods solvers actually call
        arr = jnp.asarray(arr)
        b = arr.ndim - self.dim_rank
        arr = jax.lax.with_sharding_constraint(arr, self._shardings(self._in_spec, b))
        out = self._op.grad(arr)
        return jax.lax.with_sharding_constraint(out, self._shardings(self._in_spec, b))

    def prox(self, arr, tau):
        arr = jnp.asarray(arr)
        b = arr.ndim - self.dim_rank
        arr = jax.lax.with_sharding_constraint(arr, self._shardings(self._in_spec, b))
        out = self._op.prox(arr, tau)
        return jax.lax.with_sharding_constraint(out, self._shardings(self._in_spec, b))

    def estimate_lipschitz(self, **kw):
        L = self._op.estimate_lipschitz(**kw)
        self._lipschitz = L
        return L

    def estimate_diff_lipschitz(self, **kw):
        dL = self._op.estimate_diff_lipschitz(**kw)
        self._diff_lipschitz = dL
        return dL

    def _expr(self):
        return (f"sharded[{self._in_spec}->{self._out_spec}]", self._op)


def with_sharding(op: Operator, mesh: Mesh, in_spec, out_spec=None) -> Operator:
    """Annotate an operator with input/output PartitionSpecs.

    ``in_spec``/``out_spec`` are sequences over the operator's dim/codim axes
    (PartitionSpec entries).  ``out_spec=None`` re-uses ``in_spec`` when
    shapes are compatible, else replicates.
    """
    in_spec = tuple(in_spec)
    if out_spec is None:
        out_spec = in_spec if len(in_spec) == op.codim_rank else (None,) * op.codim_rank
    return _sharded_op(op, mesh, in_spec, tuple(out_spec))


import functools as _functools


@_functools.cache
def _sharded_class(base: type) -> type:
    return type(f"Sharded[{base.__name__}]", (_ShardedMixin, base), {})


def _sharded_op(op, mesh, in_spec, out_spec):
    base = infer_operator_class(op.properties())
    return _sharded_class(base)(op, mesh, in_spec, out_spec)


def sharded_block_diag(ops, mesh: Mesh, mesh_axis: str = None) -> Operator:
    """block_diag with the block axis sharded over a mesh axis — each device
    evaluates its blocks locally, no communication (the TPU analog of
    coo_block(parallel=True); reference blocks.py:474-511)."""
    from pyxu_tpu.operator.blocks import block_diag
    op = block_diag(ops)
    mesh_axis = mesh_axis or mesh.axis_names[0]
    in_spec = (mesh_axis,) + (None,) * (op.dim_rank - 1)
    # the output may have a different rank (rank-reducing blocks) or be a
    # scalar (functional blocks): build its spec from codim_rank
    if op.codim_rank == 0:
        out_spec = ()
    else:
        out_spec = (mesh_axis,) + (None,) * (op.codim_rank - 1)
    return _sharded_op(op, mesh, in_spec, out_spec)
