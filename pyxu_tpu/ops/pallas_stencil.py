"""Pallas TPU kernel: fused separable 2-D correlation.

The XLA path (`pyxu_tpu.operator.linop.stencil`) materializes the padded
array and runs two `conv_general_dilated` passes — three HBM round-trips.
This kernel streams row-tiles HBM -> VMEM with double-buffered DMA, applies
both 1-D passes in VMEM (VPU shifts + FMAs), and writes each output tile
once: a single HBM round-trip, the memory-bound optimum for small kernels.

Used by :class:`pyxu_tpu.operator.linop.stencil.Stencil` for 2-D separable
float32 'constant'-mode stencils when enabled (PYXU_TPU_PALLAS=1) — the
drop-in native replacement for the reference's Numba-codegen stencils
(reference: src/pyxu/operator/linop/stencil/_stencil.py:232-476).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["separable_correlate2d"]


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _kernel(x_hbm, out_ref, scratch, sems, *, TH, Wp, kh, kw):
    """Grid over row tiles.  x_hbm is the (H + kh - 1, Wp) zero-padded input
    (rows padded by the kernel's vertical footprint, cols by horizontal);
    each step DMAs a (TH + kh - 1, Wp) window, computes, writes (TH, Wp)."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    win = TH + len(kh) - 1

    # double-buffered window DMA
    def get_dma(slot, tile):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tile * TH, win), :],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        get_dma(0, 0).start()

    two = jnp.asarray(2, i.dtype)
    slot = jax.lax.rem(i, two)
    next_slot = jax.lax.rem(i + jnp.asarray(1, i.dtype), two)

    @pl.when(i + 1 < n)
    def _():
        get_dma(next_slot, i + 1).start()

    get_dma(slot, i).wait()
    x = scratch[slot]  # (win, Wp) f32, already zero-padded in both axes

    # vertical pass: out_v[r, :] = sum_t kh[t] * x[r + t, :], r in [0, TH)
    # (static slices: Mosaic has no dynamic_slice lowering)
    acc = jnp.zeros((TH, Wp), jnp.float32)
    for t in range(len(kh)):
        acc = acc + kh[t] * x[t:t + TH, :]
    # horizontal pass via lateral rolls (kw taps); input cols pre-padded by cw
    out = jnp.zeros((TH, Wp), jnp.float32)
    for t in range(len(kw)):
        # left-roll by t == right-roll by Wp - t (pltpu.roll wants shift >= 0)
        out = out + kw[t] * (acc if t == 0 else pltpu.roll(acc, shift=Wp - t, axis=1))
    out_ref[:] = out


def separable_correlate2d(x, kh, kw, ch: int, cw: int, tile_rows: int = 256,
                          interpret: bool = False):
    """y[i, j] = sum_{a, b} kh[a] kw[b] x[i + a - ch, j + b - cw]
    with zero ('constant') boundary.  x: (H, W) float32."""
    x = jnp.asarray(x, jnp.float32)
    H, W = x.shape
    kh = np.asarray(kh, np.float32)
    kw = np.asarray(kw, np.float32)
    lh, lw = len(kh), len(kw)
    # zero-pad: rows by (ch, lh-1-ch); cols by (cw, lw-1-cw) then to lane mult
    Wp = _round_up(W + lw - 1, 128)
    TH = min(tile_rows, _round_up(H, 8))
    Hp = _round_up(H, TH)
    xpad = jnp.zeros((Hp + lh - 1, Wp), jnp.float32)
    xpad = jax.lax.dynamic_update_slice(xpad, x, (ch, cw))

    grid = (Hp // TH,)
    kernel = functools.partial(
        _kernel, TH=TH, Wp=Wp,
        kh=tuple(float(v) for v in kh),  # python floats: baked as immediates
        kw=tuple(float(v) for v in kw),
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((TH, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, TH + lh - 1, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # wide images (4K: Wp = 3968) push the double-buffered scratch +
        # roll temporaries past the 16 MB default scoped-vmem limit
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(xpad)
    return out[:H, :W]
