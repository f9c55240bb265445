"""Manual halo-exchange stencils via shard_map + ppermute.

TPU-native equivalent of the reference's Dask ``map_overlap`` halo exchange
(reference: src/pyxu/operator/linop/stencil/stencil.py:578-607): the image is
sharded along one spatial axis over a mesh axis; each device exchanges
``halo``-wide ghost strips with its neighbours over ICI (`lax.ppermute`),
runs the local correlation, and keeps its own slab.  Global boundary modes
'constant' and 'wrap' are exact (zero ghosts / ring ghosts); the adjoint is
the same machinery with the flipped kernel, exact for both modes.
"""

from __future__ import annotations

import math as _math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pyxu_tpu.abc.operator import SquareOp
from pyxu_tpu.operator.linop.stencil import _corr
from pyxu_tpu.utils.misc import as_canonical_shape

__all__ = ["halo_exchange", "ShardedStencil"]


def halo_exchange(x, lo: int, hi: int, axis: int, axis_name: str,
                  mode: str = "constant"):
    """Append ghost strips from mesh neighbours along ``axis``.

    Must be called inside ``shard_map`` over ``axis_name``.  Returns the
    local block padded to ``n_local + lo + hi`` along ``axis``.
    ``mode='constant'``: zeros at the global edges; ``'wrap'``: ring.
    """
    assert mode in ("constant", "wrap"), \
        f"halo_exchange supports 'constant'/'wrap' boundaries, got {mode!r}"
    n_dev = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    def strip(src, start, size):
        sl = [slice(None)] * src.ndim
        sl[axis] = slice(start, start + size) if start >= 0 else slice(start, None)
        return src[tuple(sl)]

    parts = []
    if lo:
        # ghost from the previous shard's tail (shift every block "down")
        send_up = strip(x, -lo, lo)  # my tail -> next shard's lo-ghost
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        ghost_lo = jax.lax.ppermute(send_up, axis_name, perm)
        if mode == "constant":
            ghost_lo = jnp.where(idx == 0, jnp.zeros_like(ghost_lo), ghost_lo)
        parts.append(ghost_lo)
    parts.append(x)
    if hi:
        send_dn = strip(x, 0, hi)  # my head -> previous shard's hi-ghost
        perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        ghost_hi = jax.lax.ppermute(send_dn, axis_name, perm)
        if mode == "constant":
            ghost_hi = jnp.where(idx == n_dev - 1, jnp.zeros_like(ghost_hi), ghost_hi)
        parts.append(ghost_hi)
    return jnp.concatenate(parts, axis=axis)


class ShardedStencil(SquareOp):
    """Stencil with explicit halo exchange along one sharded spatial axis.

    apply/adjoint run under ``shard_map``; the un-sharded axes behave like
    :class:`~pyxu_tpu.operator.linop.stencil.Stencil` with the same mode.
    Supports mode in ('constant', 'wrap') — the two modes whose ghost
    semantics match shard halos exactly (reference Dask path supports all
    modes by materializing overlaps; others here should use the GSPMD
    auto-sharded Stencil instead).
    """

    _data_fields = ("_kernels",)

    def __init__(self, dim_shape, kernel, center, mesh: Mesh,
                 shard_axis: int = 0, mesh_axis: str = None,
                 mode: str = "constant"):
        from pyxu_tpu.operator.linop.stencil import _canonical_kernels
        dim_shape = as_canonical_shape(dim_shape)
        super().__init__(dim_shape)
        assert mode in ("constant", "wrap")
        D = len(dim_shape)
        kc = _canonical_kernels(kernel, center, D)
        self._kernels = tuple(k for k, _ in kc)
        self._centers = tuple(c for _, c in kc)
        self._mesh = mesh
        self._ax = shard_axis % D
        self._mname = mesh_axis or mesh.axis_names[0]
        self._mode = mode
        n_dev = mesh.shape[self._mname]
        assert dim_shape[self._ax] % n_dev == 0, "axis must divide evenly"
        local = dim_shape[self._ax] // n_dev
        for k, c in kc:
            lo, hi = c[self._ax], k.shape[self._ax] - 1 - c[self._ax]
            assert max(lo, hi) <= local, (
                f"kernel halo ({lo},{hi}) exceeds the local shard ({local} "
                f"rows) — use fewer devices or the GSPMD Stencil")
        l1 = 1.0
        for k in self._kernels:
            l1 *= float(jnp.sum(jnp.abs(k)))
        self._lipschitz = l1
        self._name = f"ShardedStencil[{mode}]"

    # -- local compute ------------------------------------------------------
    def _local(self, x, kernels, centers, batch_ndim):
        """Correlate the local block: halo along the sharded axis, plain pad
        on the others."""
        D = self.dim_rank
        ax_l = batch_ndim + self._ax
        for k, c in zip(kernels, centers):
            lo = [c[d] for d in range(D)]
            hi = [k.shape[d] - 1 - c[d] for d in range(D)]
            if lo[self._ax] or hi[self._ax]:
                x = halo_exchange(x, lo[self._ax], hi[self._ax], ax_l,
                                  self._mname, self._mode)
            pads = [(0, 0)] * x.ndim
            for d in range(D):
                if d != self._ax:
                    pads[batch_ndim + d] = (lo[d], hi[d])
            if any(p != (0, 0) for p in pads):
                x = jnp.pad(x, pads, mode=("constant" if self._mode == "constant"
                                           else "wrap"))
            x = _corr(x, k, ((0, 0),) * D, D)
        return x

    def _run(self, arr, kernels, centers):
        arr = jnp.asarray(arr)
        b = arr.ndim - self.dim_rank
        spec_core = [None] * self.dim_rank
        spec_core[self._ax] = self._mname
        spec = P(*([None] * b + spec_core))

        fn = jax.shard_map(
            lambda x: self._local(x, kernels, centers, b),
            mesh=self._mesh, in_specs=spec, out_specs=spec,
        )
        return fn(arr)

    def apply(self, arr):
        return self._run(arr, self._kernels, self._centers)

    def adjoint(self, arr):
        # static data: flip kernels / mirror centers once, not per call.
        # NEVER cache jnp results computed under a trace: omnistaging makes
        # a first call inside jit cache TRACERS, poisoning every later
        # trace (observed via Solver._warm_operand_caches — the engine's
        # crash-proof dispatch then silently no-ops the fit).
        centers = tuple(
            tuple(k.shape[d] - 1 - c[d] for d in range(k.ndim))
            for k, c in zip(reversed(self._kernels),
                            reversed(self._centers))
        )
        if any(isinstance(k, jax.core.Tracer) for k in self._kernels):
            # dynamic-operand trace: compute in-graph, do not cache
            flipped = tuple(jnp.flip(k, axis=tuple(range(k.ndim)))
                            for k in reversed(self._kernels))
            return self._run(arr, flipped, centers)
        cached = getattr(self, "_adj_cache", None)
        if cached is None:
            # cache NUMPY arrays: even jnp.asarray(concrete) yields a
            # tracer while a trace is active, and a cached tracer poisons
            # every later trace
            flipped = tuple(np.flip(np.asarray(k))
                            for k in reversed(self._kernels))
            cached = self._adj_cache = (flipped, centers)
        return self._run(arr, *cached)

    def _expr(self):
        return (f"ShardedStencil[{self._mode}, axis={self._ax}@{self._mname}]",)
