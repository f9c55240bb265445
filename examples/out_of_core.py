"""Larger-than-device-memory solves by host-offload streaming — the TPU
replacement for the reference's Dask out-of-core execution
(stencil.py:578-607 map_overlap; blocks.py:474-511 per-block evaluation).

Three patterns:

1. `streamed_map_overlap`: apply any local operator to a host array in
   row bands with halo rows — exactly (map_overlap's boundary=0/trim
   contract).
2. `streamed_block_diag`: one operator per host-resident block.
3. `StreamedCondatVu`: a full TV-deconvolution solve whose state (x, z, y)
   never leaves host RAM / disk; streamed band updates equal the global
   in-memory iteration exactly.  Pass `np.memmap`s for disk-backed state;
   the >16 GB giga-pixel configuration lives in tools/giga_tv_demo.py.

Run: JAX_PLATFORMS=cpu python examples/out_of_core.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from pyxu_tpu.operator import Stencil
from pyxu_tpu.parallel import (StreamedCondatVu, streamed_block_diag,
                               streamed_map_overlap)


def main(H=1024, W=768, block_rows=256):
    rng = np.random.default_rng(0)
    t = np.arange(9) - 4.0
    k1 = np.exp(-0.5 * (t / 2.0) ** 2).astype(np.float32)
    k1 /= k1.sum()

    # -- 1. streamed stencil apply (map_overlap analog) ---------------------
    x = rng.random((H, W), dtype=np.float32)        # host-resident
    Kb = Stencil((block_rows + 10, W), [jnp.asarray(k1)] * 2, [4, 4],
                 mode="constant")
    y = streamed_map_overlap(Kb.apply, x, depth=5, block_rows=block_rows)
    print(f"streamed blur: {x.shape} -> {y.shape}, "
          f"device never held more than {(block_rows + 10) * W * 4 / 1e6:.1f} MB")

    # -- 2. per-block operators on host blocks ------------------------------
    from pyxu_tpu.operator.linop.base import HomothetyOp
    ops = [HomothetyOp(dim_shape=(256, W), cst=c) for c in (1.0, 0.5, 2.0)]
    blocks = [rng.random((256, W), dtype=np.float32) for _ in ops]
    outs = streamed_block_diag(ops, blocks)
    print("streamed block_diag:", [o.shape for o in outs])

    # -- 3. full out-of-core TV solve ---------------------------------------
    slv = StreamedCondatVu(y, k1, lam=0.01, block_rows=block_rows)
    print(f"state {slv.state_bytes / 1e6:.0f} MB host-resident "
          f"(scale H for giga-pixel: tools/giga_tv_demo.py)")
    slv.fit(n_iters=20)
    sol = slv.solution()
    print(f"solved: residual moved {np.abs(sol - y).max():.4f}, "
          f"finite={np.isfinite(sol).all()}")


if __name__ == "__main__":
    main()
