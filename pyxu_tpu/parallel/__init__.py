from pyxu_tpu.parallel.consensus import ConsensusADMM  # noqa: F401
from pyxu_tpu.parallel.halo import ShardedStencil, halo_exchange  # noqa: F401
from pyxu_tpu.parallel.mesh import (  # noqa: F401
    P,
    auto_mesh,
    init_distributed,
    replicate,
    shard,
)
from pyxu_tpu.parallel.nufft import ShardedNUFFT, ShardedNUFFT3  # noqa: F401
from pyxu_tpu.parallel.outofcore import (  # noqa: F401
    StreamedCondatVu,
    streamed_block_diag,
    streamed_map_overlap,
)
from pyxu_tpu.parallel.sharded import (  # noqa: F401
    sharded_block_diag,
    with_sharding,
)
