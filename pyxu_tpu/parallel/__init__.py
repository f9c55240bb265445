from pyxu_tpu.parallel.consensus import ConsensusADMM  # noqa: F401
from pyxu_tpu.parallel.halo import ShardedStencil, halo_exchange  # noqa: F401
from pyxu_tpu.parallel.mesh import P, auto_mesh, replicate, shard  # noqa: F401
from pyxu_tpu.parallel.nufft import ShardedNUFFT, ShardedNUFFT3  # noqa: F401
from pyxu_tpu.parallel.sharded import (  # noqa: F401
    sharded_block_diag,
    with_sharding,
)
