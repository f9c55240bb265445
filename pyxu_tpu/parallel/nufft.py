"""Mesh-sharded NUFFT: point-parallel type-1/2 over a device mesh.

TPU-native analog of the reference's out-of-core / distributed NUFFT story
(reference: chunked type-3 with dask-delayed per-block transforms + tree-sum,
src/pyxu/operator/linop/fft/nufft.py:2027-2213; SURVEY §2.4 "sharded NUFFT
blocks with psum reductions"):

* the nonuniform points are sharded along one mesh axis — each device
  spreads ONLY its local point shard onto a full-size fine grid
  (`shard_map`), and one ``psum`` over ICI reduces the partial grids;
* the FFT + mode extraction run replicated (identical on every device),
  keeping the uniform-domain result fully replicated for the downstream
  solver (whose image-side state is usually replicated or spatially
  sharded by other operators);
* type-2 (adjoint) is the exact transpose: replicated modes -> FFT ->
  per-device interpolation of the local point shard (no collective needed;
  the output stays point-sharded).

The per-device spread/interp reuse the same XLA kernels as the single-chip
operator (one-hot MXU matmuls in 2-D), so each chip runs the measured
single-chip fast path on M/n_dev points — spreading is compute-bound in M,
giving near-linear scaling until the psum (one fine-grid all-reduce per
apply) dominates.
"""

from __future__ import annotations

import math as _math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pyxu_tpu.abc.operator import LinOp
from pyxu_tpu.operator.linop.nufft import (
    _NUFFT3,
    _NUFFT12,
    _balanced_parts_np,
    _es_params,
    _interp,
    _match_vma,
    _spread,
    _t3_dx_np,
    _t3_nf_np,
)
from pyxu_tpu.utils.complex import complex_dtype

__all__ = ["ShardedNUFFT", "ShardedNUFFT3"]


class ShardedNUFFT(LinOp):
    """Point-sharded type-1 NUFFT (adjoint = type-2) over ``mesh[axis]``.

    dim (M, 2) — nonuniform strengths, sharded along the point axis;
    codim (*N, 2) — uniform modes, replicated.

    Notes
    -----
    * M is padded internally to a multiple of the mesh-axis size (padded
      points carry zero strength / are discarded).
    * the per-device pipelines use the dense one-hot MXU kernels (2-D) or
      scatter (3-D): the slab-MM plan is a global-point-order structure
      that does not survive sharding, so the inner plan skips building it.
    """

    _data_fields = ("_op",)

    def __init__(self, x, N, mesh: Mesh, axis: str = None, isign: int = +1,
                 eps: float = 1e-6):
        x = np.asarray(jax.device_get(x), np.float64)
        if x.ndim == 1:
            x = x[:, None]
        M, d = x.shape
        self._mesh = mesh
        self._axis = axis or mesh.axis_names[0]
        n_dev = mesh.shape[self._axis]
        Mp = -(-M // n_dev) * n_dev
        xp_ = np.concatenate([x, np.zeros((Mp - M, d))], axis=0)
        self._M, self._Mp = M, Mp
        self._op = _NUFFT12(xp_, N, isign=isign, eps=eps, slab=False)
        super().__init__((M, 2), tuple(self._op._N) + (2,))
        self._lipschitz = float(_math.sqrt(np.prod(self._op._N) * M))
        self._name = f"ShardedNUFFT[d={d}, {n_dev}x{self._axis}]"

    # -- sharded pipelines ---------------------------------------------------
    def _t1_sharded(self, a):
        """a: (Mp, 2) point-sharded -> (*N, 2) replicated."""
        op = self._op
        ax = self._axis
        w = op._idxs[0].shape[1]
        pt_spec = P(ax, None)

        def local(a_loc, idxs, wts):
            cdt = complex_dtype(a_loc.dtype)
            c = (a_loc[..., 0] + 1j * a_loc[..., 1]).astype(cdt)
            g = _spread(c, idxs, wts, op._nf)       # local partial fine grid
            gr = jax.lax.psum(g.real, ax)           # ICI all-reduce
            gi = jax.lax.psum(g.imag, ax)
            f = op._grid_to_modes(gr + 1j * gi)     # shared single-chip path
            return jnp.stack([f.real, f.imag], axis=-1)

        fn = jax.shard_map(
            local, mesh=self._mesh,
            in_specs=(pt_spec, tuple(pt_spec for _ in op._idxs),
                      tuple(pt_spec for _ in op._wts)),
            out_specs=P(),
        )
        return fn(a, op._idxs, op._wts)

    def _t2_sharded(self, f):
        """f: (*N, 2) replicated -> (Mp, 2) point-sharded."""
        op = self._op
        ax = self._axis
        pt_spec = P(ax, None)

        def local(f_in, idxs, wts):
            cdt = complex_dtype(f_in.dtype)
            fc = (f_in[..., 0] + 1j * f_in[..., 1]).astype(cdt)
            gr = op._modes_to_grid(fc)              # shared single-chip path
            c = _interp(gr, idxs, wts)              # local points only
            return jnp.stack([c.real, c.imag], axis=-1)

        fn = jax.shard_map(
            local, mesh=self._mesh,
            in_specs=(P(), tuple(pt_spec for _ in op._idxs),
                      tuple(pt_spec for _ in op._wts)),
            out_specs=pt_spec,
        )
        return fn(f, op._idxs, op._wts)

    # -- LinOp interface -----------------------------------------------------
    def apply(self, arr):
        arr = jnp.asarray(arr)

        def single(a):
            pad = self._Mp - self._M
            ap = jnp.pad(a, ((0, pad), (0, 0))) if pad else a
            return self._t1_sharded(ap)

        return self._map_batched(single, arr, 2, self.codim_shape)

    def adjoint(self, arr):
        arr = jnp.asarray(arr)

        def single(f):
            return self._t2_sharded(f)[: self._M]

        return self._map_batched(single, arr, self.codim_rank, self.dim_shape)

    def _expr(self):
        return (self._name,)


class ShardedNUFFT3(LinOp):
    r"""Mesh-parallel domain-partitioned type-3 NUFFT: one SPMD program over
    ``mesh[axis]`` instead of the reference's dask-delayed block loop
    (reference `_NUFFT3_chunked`, src/pyxu/operator/linop/fft/nufft.py:
    2027-2213; SURVEY §2.4 "sharded NUFFT blocks with psum reductions").

    Partitioning (host-side, balanced median bisection):

    * the x-domain is split into ``P = mesh.shape[axis]`` blocks — **one per
      device** — each padded to the common block size ``Mb``;
    * the z-domain is split into ``Q`` blocks (grown until the unified fine
      grid meets ``fft_mem_mb``), padded to ``Kb``.

    Every (p, q) pair gets a centered `_NUFFT3` plan forced onto the
    **elementwise-max fine grid** ``nf`` so all plan arrays stack with
    leading (P, Q) axes and the whole pipeline runs as ONE ``shard_map``:

    * ``apply``: device p scans its Q z-blocks (pre-phase → spread → FFT →
      interp → post-phase, all on the small unified grid), then a single
      ``psum`` over ICI reduces the per-x-block partial sums
      ``f[q] = Σ_p A_pq c[p]``;
    * ``adjoint``: the exact transpose — every device consumes the
      replicated f and accumulates only its own x-block
      ``c[p] = Σ_q A_pq^H f[q]``; **no collective needed** (output stays
      block-sharded and is re-indexed host-side).

    Per device per apply: Q small-grid FFTs + Q spread/interp passes on
    M/P points — the same ×Q spread overhead the reference's chunked plan
    pays (nufft.py:233-273), but data-parallel over the mesh.
    """

    _data_fields = ("_ixx", "_wxx", "_phx", "_ixs", "_wxs", "_ds", "_phz",
                    "_dx", "_x_idx", "_z_idx")

    def __init__(self, x, z, mesh: Mesh, axis: str = None, isign: int = +1,
                 eps: float = 1e-6, fft_mem_mb: float = 64.0,
                 max_z_blocks: int = 8):
        x = np.asarray(jax.device_get(x), np.float64)
        z = np.asarray(jax.device_get(z), np.float64)
        if x.ndim == 1:
            x = x[:, None]
        if z.ndim == 1:
            z = z[:, None]
        M, d = x.shape
        K, d2 = z.shape
        assert d == d2 <= 3
        self._mesh = mesh
        self._axis = axis or mesh.axis_names[0]
        n_dev = mesh.shape[self._axis]
        self._M, self._K, self._d = M, K, d

        # -- partition: P = n_dev x-blocks; grow Q until the unified grid
        #    meets the FFT budget (or the block cap).  Blocks may be empty
        #    when the mesh/cap exceeds the point count (padded slots only).
        assert M >= 1 and K >= 1
        w, beta = _es_params(eps)
        itemsize = 16 if jax.config.jax_enable_x64 else 8
        x_parts = _balanced_parts_np(x, n_dev)
        max_q = max(1, min(int(max_z_blocks), K))
        Q = 1
        while True:
            z_parts = _balanced_parts_np(z, Q)
            nf = tuple(int(n) for n in np.max(
                [_t3_nf_np(x[ip], z[iq], w)
                 for ip in x_parts for iq in z_parts
                 if len(ip) and len(iq)], axis=0))
            if np.prod(nf) * itemsize / 1e6 <= fft_mem_mb or Q >= max_q:
                break
            Q = min(2 * Q, max_q)
        self._nf = nf
        self._Q = Q

        # -- pad blocks to uniform sizes (pad coords repeat the block's
        #    first point: extents/plan unchanged, data rows are zeroed via
        #    a dump row so padded slots contribute nothing)
        Mb = max(len(p) for p in x_parts)
        Kb = max(len(p) for p in z_parts)
        self._Mb, self._Kb = Mb, Kb
        x_idx = np.full((n_dev, Mb), M, np.int32)      # M -> zero/dump row
        z_idx = np.full((Q, Kb), K, np.int32)          # K -> dump row
        x_coord = np.empty((n_dev, Mb, d))
        z_coord = np.empty((Q, Kb, d))
        for p, ip in enumerate(x_parts):
            x_idx[p, :len(ip)] = ip
            fill = ip[:1] if len(ip) else np.zeros(1, np.int64)
            x_coord[p] = x[np.r_[ip, np.repeat(fill, Mb - len(ip))]]
        for q, iq in enumerate(z_parts):
            z_idx[q, :len(iq)] = iq
            fill = iq[:1] if len(iq) else np.zeros(1, np.int64)
            z_coord[q] = z[np.r_[iq, np.repeat(fill, Kb - len(iq))]]
        self._x_idx = jnp.asarray(x_idx)
        self._z_idx = jnp.asarray(z_idx)

        # -- per-(p, q) centered plans on the unified grid, stacked; the
        #    O(prod(nf)) deconvolution grid depends only on (nf, w, beta) —
        #    computed once host-side, not once per block
        dx_np = _t3_dx_np(nf, w, beta)
        blocks = [[_NUFFT3(x_coord[p], z_coord[q], isign=isign, eps=eps,
                           nf=nf, mm3=False, dx=dx_np)
                   for q in range(Q)] for p in range(n_dev)]
        self._dx = blocks[0][0]._dx                      # (*nf,) shared
        # x-side taps depend on p only (gamma_p, shared nf)
        self._ixx = jnp.stack(
            [jnp.stack(blocks[p][0]._idxs_x) for p in range(n_dev)])
        self._wxx = jnp.stack(
            [jnp.stack(blocks[p][0]._wts_x) for p in range(n_dev)])
        self._phx = jnp.stack(
            [jnp.stack([blocks[p][q]._ph_x for q in range(Q)])
             for p in range(n_dev)])                     # (P, Q, Mb, 2)
        self._ixs = jnp.stack(
            [jnp.stack([jnp.stack(blocks[p][q]._idxs_s) for q in range(Q)])
             for p in range(n_dev)])                     # (P, Q, d, Kb, w)
        self._wxs = jnp.stack(
            [jnp.stack([jnp.stack(blocks[p][q]._wts_s) for q in range(Q)])
             for p in range(n_dev)])
        self._ds = jnp.stack(
            [jnp.stack([blocks[p][q]._ds for q in range(Q)])
             for p in range(n_dev)])                     # (P, Q, Kb)
        self._phz = jnp.stack(
            [jnp.stack([blocks[p][q]._ph_z for q in range(Q)])
             for p in range(n_dev)])                     # (P, Q, Kb, 2)

        super().__init__((M, 2), (K, 2))
        self._lipschitz = float(_math.sqrt(M * K))
        self._name = (f"ShardedNUFFT3[d={d}, {n_dev}x{self._axis}, "
                      f"Q={Q}, nf={nf}]")

    def stats(self) -> dict:
        """Partition info (reference `stats`, nufft.py:1270-1363)."""
        return {
            "n_x_blocks": int(self._x_idx.shape[0]),
            "n_z_blocks": self._Q,
            "x_block_pad": self._Mb,
            "z_block_pad": self._Kb,
            "n_fine": self._nf,
        }

    # -- SPMD pipelines -------------------------------------------------------
    def _fw_sharded(self, a):
        """a: (M, 2) -> (K, 2); one psum over the x-block axis."""
        ax, d, nf = self._axis, self._d, self._nf
        scale = float(np.prod(nf))
        dx = self._dx
        a_ext = jnp.concatenate([a, jnp.zeros((1, 2), a.dtype)], axis=0)
        ab = a_ext[self._x_idx]                          # (P, Mb, 2)

        def local(ab, ixx, wxx, phx, ixs, wxs, ds, phz):
            ab, ixx, wxx, phx, ixs, wxs, ds, phz = (
                t[0] for t in (ab, ixx, wxx, phx, ixs, wxs, ds, phz))
            cdt = complex_dtype(ab.dtype)
            c = (ab[..., 0] + 1j * ab[..., 1]).astype(cdt)
            x_taps = tuple(ixx[i] for i in range(d))
            x_wts = tuple(wxx[i] for i in range(d))

            def per_q(_, qp):
                phxq, ixsq, wxsq, dsq, phzq = qp
                cq = c * (phxq[:, 0] + 1j * phxq[:, 1]).astype(cdt)
                g = _spread(cq, x_taps, x_wts, nf)
                g = g * dx.astype(g.real.dtype)
                ghat = jnp.fft.ifftn(g) * scale
                v = _interp(ghat, tuple(ixsq[i] for i in range(d)),
                            tuple(wxsq[i] for i in range(d)))
                v = v * dsq.astype(v.real.dtype)
                v = v * (phzq[:, 0] + 1j * phzq[:, 1]).astype(cdt)
                return None, jnp.stack([v.real, v.imag], axis=-1)

            _, f = jax.lax.scan(per_q, None, (phx, ixs, wxs, ds, phz))
            return jax.lax.psum(f, ax)                   # (Q, Kb, 2) repl.

        pspec = P(ax)
        fn = jax.shard_map(
            local, mesh=self._mesh,
            in_specs=(pspec,) * 8, out_specs=P(),
        )
        f = fn(ab, self._ixx, self._wxx, self._phx,
               self._ixs, self._wxs, self._ds, self._phz)
        out = jnp.zeros((self._K + 1, 2), a.dtype)
        return out.at[self._z_idx.reshape(-1)].set(
            f.reshape(-1, 2).astype(a.dtype))[: self._K]

    def _bw_sharded(self, f):
        """f: (K, 2) -> (M, 2); no collective (output stays block-sharded)."""
        ax, d, nf = self._axis, self._d, self._nf
        dx = self._dx
        f_ext = jnp.concatenate([f, jnp.zeros((1, 2), f.dtype)], axis=0)
        fb = f_ext[self._z_idx]                          # (Q, Kb, 2) repl.

        def local(fb, ixx, wxx, phx, ixs, wxs, ds, phz):
            ixx, wxx, phx, ixs, wxs, ds, phz = (
                t[0] for t in (ixx, wxx, phx, ixs, wxs, ds, phz))
            cdt = complex_dtype(fb.dtype)
            x_taps = tuple(ixx[i] for i in range(d))
            x_wts = tuple(wxx[i] for i in range(d))

            def per_q(cacc, qp):
                fq, phxq, ixsq, wxsq, dsq, phzq = qp
                fc = (fq[..., 0] + 1j * fq[..., 1]).astype(cdt)
                fc = fc * (phzq[:, 0] - 1j * phzq[:, 1]).astype(cdt)
                fc = fc * dsq.astype(fc.real.dtype)
                g = _spread(fc, tuple(ixsq[i] for i in range(d)),
                            tuple(wxsq[i] for i in range(d)), nf)
                gg = jnp.fft.fftn(g)                     # adjoint scaled ifft
                gg = gg * dx.astype(gg.real.dtype)
                cq = _interp(gg, x_taps, x_wts)
                cq = cq * (phxq[:, 0] - 1j * phxq[:, 1]).astype(cdt)
                return cacc + cq, None

            # the body output varies over the manual mesh axis (it mixes
            # in the device's plan shard); the init carry must match
            c0 = _match_vma(jnp.zeros(x_taps[0].shape[0], cdt), ixx)
            c, _ = jax.lax.scan(per_q, c0, (fb, phx, ixs, wxs, ds, phz))
            return jnp.stack([c.real, c.imag], axis=-1)[None]

        pspec = P(ax)
        fn = jax.shard_map(
            local, mesh=self._mesh,
            in_specs=(P(),) + (pspec,) * 7, out_specs=pspec,
        )
        c = fn(fb, self._ixx, self._wxx, self._phx,
               self._ixs, self._wxs, self._ds, self._phz)  # (P, Mb, 2)
        out = jnp.zeros((self._M + 1, 2), f.dtype)
        return out.at[self._x_idx.reshape(-1)].set(
            c.reshape(-1, 2).astype(f.dtype))[: self._M]

    # -- LinOp interface -------------------------------------------------------
    def apply(self, arr):
        arr = jnp.asarray(arr)
        return self._map_batched(self._fw_sharded, arr, 2, self.codim_shape)

    def adjoint(self, arr):
        arr = jnp.asarray(arr)
        return self._map_batched(self._bw_sharded, arr, 2, self.dim_shape)

    def _expr(self):
        return (self._name,)
