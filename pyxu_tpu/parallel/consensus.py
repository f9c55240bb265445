r"""Consensus ADMM over a device mesh.

Workload config 5 of BASELINE.md: giga-pixel problems split into B blocks,
``min_x sum_b f_b(x) + g(x)``, solved by consensus ADMM with the block axis
sharded over the mesh — the reference has no direct equivalent (its ADMM is
single-process, src/pyxu/opt/solver/pds.py:1313-1689); this is the
`shard_map`-era scaling story SURVEY §7 step 7 prescribes.

    x_b+ = prox_{tau f_b}(z - u_b)          # embarrassingly parallel
    z+   = prox_{tau/B g}(mean_b(x_b+ + u_b))   # psum over the mesh axis
    u_b+ = u_b + x_b+ - z+

State ``x, u: (B, *dim)`` sharded on axis 0; ``z: (*dim)`` replicated.  The
mean is a single XLA all-reduce over ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pyxu_tpu.abc.solver import Solver
from pyxu_tpu.opt.stop import RelError

__all__ = ["ConsensusADMM"]


class ConsensusADMM(Solver):
    def __init__(self, fs, g=None, mesh: Mesh = None, mesh_axis: str = None,
                 **kwargs):
        """``fs``: list of per-block proximable functionals (same dim_shape;
        homogeneous families evaluate via the vmapped separable-sum fast
        path).  ``g``: global proximable regularizer (optional).
        """
        kwargs.setdefault("log_var", ("z",))
        super().__init__(**kwargs)
        from pyxu_tpu.operator.blocks import block_diag
        if not isinstance(fs, (list, tuple)):
            raise TypeError("fs must be a list of per-block functionals")
        if not fs:
            raise ValueError("fs must be non-empty")
        self._B = len(fs)
        self._fsum = block_diag(list(fs))   # separable sum with vmap prox
        self._dim_shape = fs[0].dim_shape
        self._g = g
        self._mesh = mesh
        self._mesh_axis = mesh_axis or (mesh.axis_names[0] if mesh else None)
        if mesh is not None:
            n_dev = mesh.shape[self._mesh_axis]
            if self._B % n_dev != 0:
                raise ValueError(
                    f"ConsensusADMM: {self._B} blocks are not divisible by "
                    f"the {n_dev} devices on mesh axis {self._mesh_axis!r} — "
                    "pad fs to a multiple or use a smaller mesh axis")

    def m_init(self, z0, tau: float = 1.0):
        z0 = jnp.asarray(z0)
        self._tau = float(tau)
        B = self._B
        x = jnp.broadcast_to(z0, (B,) + z0.shape)
        u = jnp.zeros_like(x)
        if self._mesh is not None:
            from pyxu_tpu.parallel.mesh import replicate, shard
            x = shard(x, self._mesh, P(self._mesh_axis))
            u = shard(u, self._mesh, P(self._mesh_axis))
            z0 = replicate(z0, self._mesh)
        return {"x": x, "u": u, "z": z0}

    def m_step(self, mst):
        x, u, z = mst["x"], mst["u"], mst["z"]
        tau, B = self._tau, self._B
        # per-block prox (vmapped separable sum; sharded axis -> local work)
        xp = self._fsum.prox(z[None] - u, tau)
        w = jnp.mean(xp + u, axis=0)          # all-reduce over the mesh axis
        zp = self._g.prox(w, tau / B) if self._g is not None else w
        up = u + xp - zp[None]
        if self._mesh is not None:
            spec_b = P(*([self._mesh_axis] + [None] * (xp.ndim - 1)))
            xp = jax.lax.with_sharding_constraint(xp, NamedSharding(self._mesh, spec_b))
            up = jax.lax.with_sharding_constraint(up, NamedSharding(self._mesh, spec_b))
            zp = jax.lax.with_sharding_constraint(zp, NamedSharding(self._mesh, P()))
        return {"x": xp, "u": up, "z": zp}

    def default_stop_crit(self):
        return RelError(eps=1e-4, var="z", rank=len(self._dim_shape))

    def solution(self):
        return self._mstate.get("z")

    def objective_func(self, mst):
        z = mst["z"]
        val = self._fsum.apply(jnp.broadcast_to(z, (self._B,) + z.shape))
        if self._g is not None:
            val = val + self._g.apply(z)
        return val
