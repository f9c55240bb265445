"""Device-mesh helpers.

TPU-native replacement for the reference's Dask-cluster scaling story
(reference: SURVEY §2.4; Dask chunking in src/pyxu/util/array_module.py:52-82
and stencil `map_overlap`, stencil/stencil.py:578-607): arrays are sharded
``jax.Array``s over a `jax.sharding.Mesh`; collectives ride ICI.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["auto_mesh", "shard", "replicate", "P", "init_distributed"]

P = PartitionSpec


def init_distributed(coordinator_address: str = None, num_processes: int = None,
                     process_id: int = None, **kwargs) -> int:
    """Multi-host bring-up: initialize the JAX distributed runtime so
    ``jax.devices()`` spans every host's chips and :func:`auto_mesh` builds
    slice-wide meshes (SURVEY §2.4: replaces the reference's
    ``dask.distributed`` cluster connection; reference setup.cfg:33).

    On TPU pods the arguments are auto-detected from the environment —
    call with no arguments.  Returns the global device count.  Idempotent:
    a second call is a no-op (jax raises if already initialized; that is
    swallowed here so library code can call it defensively).
    """
    if not jax.distributed.is_initialized():
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id, **kwargs)
    return len(jax.devices())


def auto_mesh(*axis_sizes, axis_names=None, devices=None) -> Mesh:
    """Build a mesh from the available devices.

    ``auto_mesh()`` -> 1-D mesh ("s",) over all devices;
    ``auto_mesh(2, 4, axis_names=("dp", "sp"))`` -> 2x4 mesh.
    """
    devs = np.asarray(devices if devices is not None else jax.devices())
    if not axis_sizes:
        axis_sizes = (devs.size,)
    if axis_names is None:
        axis_names = ("s",) if len(axis_sizes) == 1 else \
            tuple(f"ax{i}" for i in range(len(axis_sizes)))
    else:
        axis_names = tuple(axis_names)
    n = int(np.prod(axis_sizes))
    assert n <= devs.size, f"need {n} devices, have {devs.size}"
    return Mesh(devs[:n].reshape(axis_sizes), axis_names=axis_names)


def shard(arr, mesh: Mesh, spec: PartitionSpec):
    """device_put with a NamedSharding."""
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicate(arr, mesh: Mesh):
    return jax.device_put(arr, NamedSharding(mesh, PartitionSpec()))
