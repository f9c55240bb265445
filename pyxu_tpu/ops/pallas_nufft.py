r"""Pallas slab spread/interpolation kernels for the NUFFT (2-D/3-D).

The XLA slab path (`nufft._spread_slab` / `_interp_slab`) evaluates the
ES-kernel spreading as batched one-hot matmuls; it is HBM-bound, not
MXU-bound: each point-chunk materializes (S, CH, n2) tap matrices in HBM
(w VPU passes, each a full read+write), so a 200k-point 512^2 type-1 moves
~100x more HBM bytes than the tap data itself.  These kernels build the
same one-hot tap matrices in VMEM and consume them on the MXU immediately,
cutting HBM traffic to the plan arrays + the slab windows (the actual
roofline).  Reference counterpart: FINUFFT's binned subgrid spreader
(reference nufft.py:275-277), whose subproblem buffers live in L2/shared
memory for the same reason.

Layout trick: the plan arrays come in TRANSPOSED (S, w_pad, Mp) form
(`_SlabPlan.l0T/...`), so a tap row `a[s]` is a (1, CH) lane-major vector.
One-hot matrices are then built with grid cells along *sublanes* and points
along *lanes*:

    U[cell, j] = sum_s  wt[s, j] * (idx[s, j] == cell)

which makes (a) the point-strength broadcast in `spread` a natural (1, CH)
row product, and (b) the per-point reduction in `interp` a *sublane*
reduction to a (1, CH) row — no Mosaic-side transposes or relayouts
anywhere in the kernel.

Numerics match the XLA slab path exactly up to f32 reassociation (same
tap weights, same HIGHEST-precision contractions).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["slab_spread", "slab_interp", "slab_spread3", "slab_interp3",
           "pencil_spread3", "pencil_interp3", "strip_spread3",
           "strip_interp3", "strip_spread2", "strip_interp2",
           "ragged_spread2", "ragged_interp2",
           "ragged_spread3", "ragged_interp3"]


def _round8(v: int) -> int:
    return -(-int(v) // 8) * 8


def _onehot_tap(idx, wt, n, CH, w):
    """U[a, j] = sum_s wt[s, j] * (a == idx[s, j]) — the (n, CH) one-hot
    tap matrix built in VMEM with w VPU passes (no scatter); shared by all
    kernel builders below (traced inside each kernel)."""
    cell = jax.lax.broadcasted_iota(jnp.int32, (n, CH), 0)
    U = jnp.zeros((n, CH), jnp.float32)
    for s in range(w):
        U = U + wt[s:s + 1, :] * (idx[s:s + 1, :] == cell).astype(
            jnp.float32)
    return U


@functools.lru_cache(maxsize=64)
def _build_spread(S, w_pad, Mp, CH, win_pad, n2, w, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q = Mp // CH

    def kernel(cr_ref, ci_ref, l0_ref, w0_ref, i1_ref, w1_ref,
               outr_ref, outi_ref):
        q = pl.program_id(1)
        l0 = l0_ref[0]                      # (w_pad, CH)
        w0 = w0_ref[0]
        i1 = i1_ref[0]
        w1 = w1_ref[0]
        cr = cr_ref[0]                      # (1, CH)
        ci = ci_ref[0]

        # U1[col, j] = sum_s w1[s, j] . (i1[s, j] == col)   (n2, CH)
        col = jax.lax.broadcasted_iota(jnp.int32, (n2, CH), 0)
        U1 = jnp.zeros((n2, CH), jnp.float32)
        for s in range(w):
            U1 = U1 + w1[s:s + 1, :] * (i1[s:s + 1, :] == col).astype(
                jnp.float32)
        # A[r, j] = sum_s w0[s, j] . (l0[s, j] == r)        (win_pad, CH)
        row = jax.lax.broadcasted_iota(jnp.int32, (win_pad, CH), 0)
        A = jnp.zeros((win_pad, CH), jnp.float32)
        for s in range(w):
            A = A + w0[s:s + 1, :] * (l0[s:s + 1, :] == row).astype(
                jnp.float32)

        dims = (((1,), (1,)), ((), ()))     # contract the point (lane) axis
        # ONE stacked (2*win_pad, CH) x (CH, n2) dot instead of separate
        # re/im dots: the MXU is M-dim-starved at win_pad=16 rows (12.5%
        # of the 128-row array), so doubling M halves the wasted rows
        A2 = jnp.concatenate([A * cr, A * ci], axis=0)   # (2*win_pad, CH)
        R2 = jax.lax.dot_general(A2, U1, dims,
                                 preferred_element_type=jnp.float32)
        Rr = R2[:win_pad]
        Ri = R2[win_pad:]

        @pl.when(q == 0)
        def _():
            outr_ref[...] = Rr[None]
            outi_ref[...] = Ri[None]

        @pl.when(q > 0)
        def _():
            outr_ref[...] = outr_ref[...] + Rr[None]
            outi_ref[...] = outi_ref[...] + Ri[None]

    plan_spec = pl.BlockSpec((1, w_pad, CH), lambda s, q: (s, 0, q))
    pt_spec = pl.BlockSpec((1, 1, CH), lambda s, q: (s, 0, q))
    out_spec = pl.BlockSpec((1, win_pad, n2), lambda s, q: (s, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(S, Q),
        in_specs=[pt_spec, pt_spec, plan_spec, plan_spec, plan_spec,
                  plan_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((S, win_pad, n2), jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def slab_spread(cr, ci, l0T, w0T, i1T, w1T, *, n2: int, win: int, w: int,
                chunk: int, interpret: bool = False):
    """Spread slab-ordered point strengths onto per-slab row windows.

    cr/ci: (S, Mp) f32 slab-ordered strengths; l0T/w0T/i1T/w1T: transposed
    plan arrays (S, w_pad, Mp).  Returns (Rr, Ri), each (S, win_pad, n2) —
    callers slice ``[:, :win]`` and overlap-add.
    """
    S, Mp = cr.shape
    w_pad = l0T.shape[1]
    CH = int(chunk)
    assert Mp % CH == 0
    fn = _build_spread(S, w_pad, Mp, CH, _round8(win), n2, w, interpret)
    return fn(cr[:, None, :], ci[:, None, :], l0T, w0T, i1T, w1T)


@functools.lru_cache(maxsize=64)
def _build_interp(S, w_pad, Mp, CH, win_pad, n2, w, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q = Mp // CH

    def kernel(gr_ref, gi_ref, l0_ref, w0_ref, i1_ref, w1_ref,
               outr_ref, outi_ref):
        l0 = l0_ref[0]
        w0 = w0_ref[0]
        i1 = i1_ref[0]
        w1 = w1_ref[0]
        gr = gr_ref[0]                      # (win_pad, n2)
        gi = gi_ref[0]

        row = jax.lax.broadcasted_iota(jnp.int32, (win_pad, CH), 0)
        U0 = jnp.zeros((win_pad, CH), jnp.float32)
        for s in range(w):
            U0 = U0 + w0[s:s + 1, :] * (l0[s:s + 1, :] == row).astype(
                jnp.float32)
        dims = (((0,), (0,)), ((), ()))     # contract the window-row axis
        TRr = jax.lax.dot_general(gr, U0, dims,
                                  preferred_element_type=jnp.float32)
        TRi = jax.lax.dot_general(gi, U0, dims,
                                  preferred_element_type=jnp.float32)  # (n2, CH)

        col = jax.lax.broadcasted_iota(jnp.int32, (n2, CH), 0)
        U1 = jnp.zeros((n2, CH), jnp.float32)
        for s in range(w):
            U1 = U1 + w1[s:s + 1, :] * (i1[s:s + 1, :] == col).astype(
                jnp.float32)
        outr_ref[...] = jnp.sum(TRr * U1, axis=0, keepdims=True)[None]
        outi_ref[...] = jnp.sum(TRi * U1, axis=0, keepdims=True)[None]

    plan_spec = pl.BlockSpec((1, w_pad, CH), lambda s, q: (s, 0, q))
    g_spec = pl.BlockSpec((1, win_pad, n2), lambda s, q: (s, 0, 0))
    out_spec = pl.BlockSpec((1, 1, CH), lambda s, q: (s, 0, q))
    return pl.pallas_call(
        kernel,
        grid=(S, Q),
        in_specs=[g_spec, g_spec, plan_spec, plan_spec, plan_spec,
                  plan_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((S, 1, Mp), jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def slab_interp(GR, GI, l0T, w0T, i1T, w1T, *, w: int, chunk: int,
                interpret: bool = False):
    """Interpolate per-slab row windows at the plan's points.

    GR/GI: (S, win_pad, n2) f32 slab windows (win_pad = 8-rounded 2T, extra
    rows zero); returns (vr, vi), each (S, Mp) slab-ordered point values.
    """
    S, win_pad, n2 = GR.shape
    Mp = l0T.shape[2]
    w_pad = l0T.shape[1]
    CH = int(chunk)
    assert Mp % CH == 0
    fn = _build_interp(S, w_pad, Mp, CH, win_pad, n2, w, interpret)
    vr, vi = fn(GR, GI, l0T, w0T, i1T, w1T)
    return vr[:, 0], vi[:, 0]


# ------------------------------------------------------------------- 3-D ----

def _pick_ch3(Mp: int, chunk: int, win_pad: int, n2: int) -> int:
    """3-D working sets scale with win_pad*n2*CH — halve the point chunk
    until the flattened tap matrix fits comfortably in VMEM (8 MB)."""
    CH = int(chunk)
    while CH > 128 and CH % 2 == 0 and Mp % (CH // 2) == 0 and \
            win_pad * n2 * CH * 4 > 8 * 1024 * 1024:
        CH //= 2
    return CH


@functools.lru_cache(maxsize=64)
def _build_spread3(S, w_pad, Mp, CH, win_pad, n2, n3, w, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q = Mp // CH

    def kernel(cr_ref, ci_ref, l0_ref, w0_ref, i1_ref, w1_ref, i2_ref,
               w2_ref, outr_ref, outi_ref):
        q = pl.program_id(1)

        def onehot(idx, wt, n):
            return _onehot_tap(idx, wt, n, CH, w)

        U0 = onehot(l0_ref[0], w0_ref[0], win_pad)
        U1 = onehot(i1_ref[0], w1_ref[0], n2)
        U2 = onehot(i2_ref[0], w2_ref[0], n3)
        A = (U0[:, None, :] * U1[None, :, :]).reshape(win_pad * n2, CH)
        dims = (((1,), (1,)), ((), ()))
        Rr = jax.lax.dot_general(A * cr_ref[0], U2, dims,
                                 preferred_element_type=jnp.float32)
        Ri = jax.lax.dot_general(A * ci_ref[0], U2, dims,
                                 preferred_element_type=jnp.float32)

        @pl.when(q == 0)
        def _():
            outr_ref[...] = Rr[None]
            outi_ref[...] = Ri[None]

        @pl.when(q > 0)
        def _():
            outr_ref[...] = outr_ref[...] + Rr[None]
            outi_ref[...] = outi_ref[...] + Ri[None]

    plan_spec = pl.BlockSpec((1, w_pad, CH), lambda s, q: (s, 0, q))
    pt_spec = pl.BlockSpec((1, 1, CH), lambda s, q: (s, 0, q))
    out_spec = pl.BlockSpec((1, win_pad * n2, n3), lambda s, q: (s, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(S, Q),
        in_specs=[pt_spec, pt_spec] + [plan_spec] * 6,
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((S, win_pad * n2, n3),
                                        jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def slab_spread3(cr, ci, l0T, w0T, i1T, w1T, i2T, w2T, *, n2: int, n3: int,
                 win: int, w: int, chunk: int, interpret: bool = False):
    """3-D slab spreading: returns (Rr, Ri), each (S, win_pad*n2, n3) —
    callers reshape to (S, win_pad, n2, n3), slice ``[:, :win]`` and
    overlap-add."""
    S, Mp = cr.shape
    w_pad = l0T.shape[1]
    win_pad = _round8(win)
    CH = _pick_ch3(Mp, chunk, win_pad, n2)
    assert Mp % CH == 0
    fn = _build_spread3(S, w_pad, Mp, CH, win_pad, n2, n3, w, interpret)
    return fn(cr[:, None, :], ci[:, None, :], l0T, w0T, i1T, w1T, i2T, w2T)


@functools.lru_cache(maxsize=64)
def _build_interp3(S, w_pad, Mp, CH, win_pad, n2, n3, w, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q = Mp // CH

    def kernel(gr_ref, gi_ref, l0_ref, w0_ref, i1_ref, w1_ref, i2_ref,
               w2_ref, outr_ref, outi_ref):
        def onehot(idx, wt, n):
            return _onehot_tap(idx, wt, n, CH, w)

        U0 = onehot(l0_ref[0], w0_ref[0], win_pad)
        U1 = onehot(i1_ref[0], w1_ref[0], n2)
        U2 = onehot(i2_ref[0], w2_ref[0], n3)
        A = (U0[:, None, :] * U1[None, :, :]).reshape(win_pad * n2, CH)
        dims = (((1,), (0,)), ((), ()))     # (win_pad*n2, n3) @ (n3, CH)
        TRr = jax.lax.dot_general(gr_ref[0], U2, dims,
                                  preferred_element_type=jnp.float32)
        TRi = jax.lax.dot_general(gi_ref[0], U2, dims,
                                  preferred_element_type=jnp.float32)
        outr_ref[...] = jnp.sum(TRr * A, axis=0, keepdims=True)[None]
        outi_ref[...] = jnp.sum(TRi * A, axis=0, keepdims=True)[None]

    plan_spec = pl.BlockSpec((1, w_pad, CH), lambda s, q: (s, 0, q))
    g_spec = pl.BlockSpec((1, win_pad * n2, n3), lambda s, q: (s, 0, 0))
    out_spec = pl.BlockSpec((1, 1, CH), lambda s, q: (s, 0, q))
    return pl.pallas_call(
        kernel,
        grid=(S, Q),
        in_specs=[g_spec, g_spec] + [plan_spec] * 6,
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((S, 1, Mp), jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def slab_interp3(GR, GI, l0T, w0T, i1T, w1T, i2T, w2T, *, w: int,
                 chunk: int, interpret: bool = False):
    """3-D slab interpolation: GR/GI (S, win_pad*n2, n3) flattened padded
    slab windows; returns (vr, vi), each (S, Mp)."""
    S, wn2, n3 = GR.shape
    Mp = l0T.shape[2]
    w_pad = l0T.shape[1]
    # the window axis arrives flattened as win_pad*n2; T == w fixes win_pad
    win_pad = _round8(2 * w)
    n2 = wn2 // win_pad
    assert n2 * win_pad == wn2
    CH = _pick_ch3(Mp, chunk, win_pad, n2)
    assert Mp % CH == 0
    fn = _build_interp3(S, w_pad, Mp, CH, win_pad, n2, n3, w, interpret)
    vr, vi = fn(GR, GI, l0T, w0T, i1T, w1T, i2T, w2T)
    return vr[:, 0], vi[:, 0]


# -------------------------------------------------------- 3-D pencil bins ---

@functools.lru_cache(maxsize=64)
def _build_pencil_spread(S0, S1, G, w_pad, Mp, CH, win_pad, n3, w,
                         interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q = Mp // CH
    SB = S1 // G                        # pencil-groups per axis-1 row

    def kernel(cr_ref, ci_ref, l0_ref, w0_ref, l1_ref, w1_ref, i2_ref,
               w2_ref, outr_ref, outi_ref):
        q = pl.program_id(1)

        def onehot(idx, wt, n):
            return _onehot_tap(idx, wt, n, CH, w)

        # G pencils per grid step: one DMA round per G pencils instead of
        # one per pencil — the pencil kernels are per-step-latency-bound,
        # not FLOP-bound (BASELINE.md round 3), so fewer, fatter grid
        # steps is the lever.  Per-g work is unchanged.
        for g in range(G):
            U0 = onehot(l0_ref[g], w0_ref[g], win_pad)
            U1 = onehot(l1_ref[g], w1_ref[g], win_pad)
            U2 = onehot(i2_ref[g], w2_ref[g], n3)
            A = (U0[:, None, :] * U1[None, :, :]).reshape(
                win_pad * win_pad, CH)
            dims = (((1,), (1,)), ((), ()))
            Rr = jax.lax.dot_general(A * cr_ref[g], U2, dims,
                                     preferred_element_type=jnp.float32)
            Ri = jax.lax.dot_general(A * ci_ref[g], U2, dims,
                                     preferred_element_type=jnp.float32)
            shp = (1, win_pad, 1, win_pad, n3)

            @pl.when(q == 0)
            def _():
                outr_ref[:, :, g:g + 1] = Rr.reshape(shp)
                outi_ref[:, :, g:g + 1] = Ri.reshape(shp)

            @pl.when(q > 0)
            def _():
                outr_ref[:, :, g:g + 1] = outr_ref[:, :, g:g + 1] + \
                    Rr.reshape(shp)
                outi_ref[:, :, g:g + 1] = outi_ref[:, :, g:g + 1] + \
                    Ri.reshape(shp)

    plan_spec = pl.BlockSpec((G, w_pad, CH), lambda p, q: (p, 0, q))
    pt_spec = pl.BlockSpec((G, 1, CH), lambda p, q: (p, 0, q))
    out_spec = pl.BlockSpec((1, win_pad, G, win_pad, n3),
                            lambda p, q: (p // SB, 0, p % SB, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(S0 * SB, Q),
        in_specs=[pt_spec, pt_spec] + [plan_spec] * 6,
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct(
            (S0, win_pad, S1, win_pad, n3), jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def pencil_spread3(cr, ci, plan_arrays, *, S0: int, S1: int, n3: int,
                   win: int, w: int, chunk: int, group: int = 1,
                   interpret: bool = False):
    """3-D pencil spreading: returns (Rr, Ri), each
    (S0, win_pad, S1, win_pad, n3) — callers slice both window axes to
    ``win`` (and axis 2 to the logical S1 when the plan padded it to a
    multiple of ``group``) and 2-axis overlap-add."""
    l0T, w0T, l1T, w1T, i2T, w2T = plan_arrays
    P, Mp = cr.shape
    w_pad = l0T.shape[1]
    CH = int(chunk)
    G = int(group)
    assert Mp % CH == 0 and P == S0 * S1 and S1 % G == 0
    fn = _build_pencil_spread(S0, S1, G, w_pad, Mp, CH, _round8(win), n3,
                              w, interpret)
    return fn(cr[:, None, :], ci[:, None, :], l0T, w0T, l1T, w1T, i2T, w2T)


@functools.lru_cache(maxsize=64)
def _build_pencil_interp(S0, S1, G, w_pad, Mp, CH, win_pad, n3, w,
                         interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q = Mp // CH
    SB = S1 // G

    def kernel(gr_ref, gi_ref, l0_ref, w0_ref, l1_ref, w1_ref, i2_ref,
               w2_ref, outr_ref, outi_ref):
        def onehot(idx, wt, n):
            return _onehot_tap(idx, wt, n, CH, w)

        # G pencils per grid step (see _build_pencil_spread)
        for g in range(G):
            U0 = onehot(l0_ref[g], w0_ref[g], win_pad)
            U1 = onehot(l1_ref[g], w1_ref[g], win_pad)
            U2 = onehot(i2_ref[g], w2_ref[g], n3)
            A = (U0[:, None, :] * U1[None, :, :]).reshape(
                win_pad * win_pad, CH)
            G2 = gr_ref[0, :, g].reshape(win_pad * win_pad, n3)
            H2 = gi_ref[0, :, g].reshape(win_pad * win_pad, n3)
            dims = (((1,), (0,)), ((), ()))     # (win^2, n3) @ (n3, CH)
            TRr = jax.lax.dot_general(G2, U2, dims,
                                      preferred_element_type=jnp.float32)
            TRi = jax.lax.dot_general(H2, U2, dims,
                                      preferred_element_type=jnp.float32)
            outr_ref[g:g + 1] = jnp.sum(TRr * A, axis=0,
                                        keepdims=True)[None]
            outi_ref[g:g + 1] = jnp.sum(TRi * A, axis=0,
                                        keepdims=True)[None]

    plan_spec = pl.BlockSpec((G, w_pad, CH), lambda p, q: (p, 0, q))
    g_spec = pl.BlockSpec((1, win_pad, G, win_pad, n3),
                          lambda p, q: (p // SB, 0, p % SB, 0, 0))
    out_spec = pl.BlockSpec((G, 1, CH), lambda p, q: (p, 0, q))
    return pl.pallas_call(
        kernel,
        grid=(S0 * SB, Q),
        in_specs=[g_spec, g_spec] + [plan_spec] * 6,
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((S0 * S1, 1, Mp), jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def pencil_interp3(GR, GI, plan_arrays, *, w: int, chunk: int,
                   group: int = 1, interpret: bool = False):
    """3-D pencil interpolation: GR/GI (S0, win_pad, S1, win_pad, n3)
    padded pencil windows (S1 padded to a multiple of ``group`` with zero
    windows when the plan grouped pencils); returns (vr, vi), each
    (S0*S1, Mp)."""
    l0T, w0T, l1T, w1T, i2T, w2T = plan_arrays
    S0, win_pad, S1, _, n3 = GR.shape
    Mp = l0T.shape[2]
    w_pad = l0T.shape[1]
    CH = int(chunk)
    G = int(group)
    assert Mp % CH == 0 and S1 % G == 0
    fn = _build_pencil_interp(S0, S1, G, w_pad, Mp, CH, win_pad, n3, w,
                              interpret)
    vr, vi = fn(GR, GI, l0T, w0T, l1T, w1T, i2T, w2T)
    return vr[:, 0], vi[:, 0]


# ------------------------------------------- 3-D strip-resident pencils ----
#
# The v1 pencil kernels write every pencil's (win, win, n3) window to HBM
# and overlap-add them in XLA; at 128^3 the window array is ~6x the fine
# grid (the (2T/T)^2 = 4x window overlap times the win->win_pad rounding)
# and the XLA overlap-add materializes several more full-size
# intermediates — the true cost driver (CSE-proof timing, BASELINE.md).
# The strip kernels instead keep ONE axis-0 row strip
# (win_pad, n2ext, n3) resident in VMEM across all its axis-1 pencil
# steps and accumulate each pencil's window at its aligned s1*T offset
# in-place, so the axis-1 overlap-add never exists in HBM: the output is
# (S0, win_pad, n2ext, n3) — only the axis-0 overlap remains for XLA.
# Alignment: pencil thickness T is 8-rounded (T >= w-1 keeps the tap
# span T+w-1 <= 2T inside a 2T window), so the dynamic sublane offsets
# s1*T are multiples of 8 and win_pad == 2T exactly.

@functools.lru_cache(maxsize=64)
def _build_strip_spread(S0, S1, T, w_pad, Mp, CH, n3, w, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q = Mp // CH
    win_pad = 2 * T
    n2ext = S1 * T + T

    def kernel(cr_ref, ci_ref, l0_ref, w0_ref, l1_ref, w1_ref, i2_ref,
               w2_ref, outr_ref, outi_ref):
        s1 = pl.program_id(1)
        q = pl.program_id(2)

        def onehot(idx, wt, n):
            return _onehot_tap(idx, wt, n, CH, w)

        @pl.when(jnp.logical_and(s1 == 0, q == 0))
        def _():
            outr_ref[...] = jnp.zeros((1, win_pad, n2ext, n3), jnp.float32)
            outi_ref[...] = jnp.zeros((1, win_pad, n2ext, n3), jnp.float32)

        U0 = onehot(l0_ref[0], w0_ref[0], win_pad)
        U1 = onehot(l1_ref[0], w1_ref[0], win_pad)
        U2 = onehot(i2_ref[0], w2_ref[0], n3)
        A = (U0[:, None, :] * U1[None, :, :]).reshape(win_pad * win_pad, CH)
        dims = (((1,), (1,)), ((), ()))
        Rr = jax.lax.dot_general(A * cr_ref[0], U2, dims,
                                 preferred_element_type=jnp.float32)
        Ri = jax.lax.dot_general(A * ci_ref[0], U2, dims,
                                 preferred_element_type=jnp.float32)
        off = pl.multiple_of(s1 * T, 8)     # T is 8-rounded by the planner
        shp = (1, win_pad, win_pad, n3)
        sl = (slice(None), slice(None), pl.ds(off, win_pad), slice(None))
        outr_ref[sl] = outr_ref[sl] + Rr.reshape(shp)
        outi_ref[sl] = outi_ref[sl] + Ri.reshape(shp)

    plan_spec = pl.BlockSpec((1, w_pad, CH), lambda p, s, q: (p * S1 + s, 0, q))
    pt_spec = pl.BlockSpec((1, 1, CH), lambda p, s, q: (p * S1 + s, 0, q))
    out_spec = pl.BlockSpec((1, win_pad, n2ext, n3),
                            lambda p, s, q: (p, 0, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(S0, S1, Q),
        in_specs=[pt_spec, pt_spec] + [plan_spec] * 6,
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct(
            (S0, win_pad, n2ext, n3), jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )


def strip_spread3(cr, ci, plan_arrays, *, S0: int, S1: int, T: int,
                  n3: int, w: int, chunk: int, interpret: bool = False):
    """3-D strip-resident pencil spreading: returns (Rr, Ri), each
    (S0, 2T, S1*T + T, n3) — axis-1 overlap-add already done in VMEM;
    callers wrap-fold axis 2 and 1-axis overlap-add axis 0."""
    l0T, w0T, l1T, w1T, i2T, w2T = plan_arrays
    P, Mp = cr.shape
    w_pad = l0T.shape[1]
    CH = int(chunk)
    assert Mp % CH == 0 and P == S0 * S1
    fn = _build_strip_spread(S0, S1, T, w_pad, Mp, CH, n3, w, interpret)
    return fn(cr[:, None, :], ci[:, None, :], l0T, w0T, l1T, w1T, i2T, w2T)


@functools.lru_cache(maxsize=64)
def _build_strip_interp(S0, S1, T, w_pad, Mp, CH, n3, w, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q = Mp // CH
    win_pad = 2 * T
    n2ext = S1 * T + T

    def kernel(gr_ref, gi_ref, l0_ref, w0_ref, l1_ref, w1_ref, i2_ref,
               w2_ref, outr_ref, outi_ref):
        s1 = pl.program_id(1)

        def onehot(idx, wt, n):
            return _onehot_tap(idx, wt, n, CH, w)

        U0 = onehot(l0_ref[0], w0_ref[0], win_pad)
        U1 = onehot(l1_ref[0], w1_ref[0], win_pad)
        U2 = onehot(i2_ref[0], w2_ref[0], n3)
        A = (U0[:, None, :] * U1[None, :, :]).reshape(win_pad * win_pad, CH)
        off = pl.multiple_of(s1 * T, 8)
        sl = (0, slice(None), pl.ds(off, win_pad), slice(None))
        G2 = gr_ref[sl].reshape(win_pad * win_pad, n3)
        H2 = gi_ref[sl].reshape(win_pad * win_pad, n3)
        dims = (((1,), (0,)), ((), ()))     # (win^2, n3) @ (n3, CH)
        TRr = jax.lax.dot_general(G2, U2, dims,
                                  preferred_element_type=jnp.float32)
        TRi = jax.lax.dot_general(H2, U2, dims,
                                  preferred_element_type=jnp.float32)
        outr_ref[...] = jnp.sum(TRr * A, axis=0, keepdims=True)[None]
        outi_ref[...] = jnp.sum(TRi * A, axis=0, keepdims=True)[None]

    plan_spec = pl.BlockSpec((1, w_pad, CH), lambda p, s, q: (p * S1 + s, 0, q))
    g_spec = pl.BlockSpec((1, win_pad, n2ext, n3),
                          lambda p, s, q: (p, 0, 0, 0))
    out_spec = pl.BlockSpec((1, 1, CH), lambda p, s, q: (p * S1 + s, 0, q))
    return pl.pallas_call(
        kernel,
        grid=(S0, S1, Q),
        in_specs=[g_spec, g_spec] + [plan_spec] * 6,
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((S0 * S1, 1, Mp), jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )


def strip_interp3(GR, GI, plan_arrays, *, S1: int, T: int, w: int,
                  chunk: int, interpret: bool = False):
    """3-D strip-resident pencil interpolation: GR/GI (S0, 2T, S1*T+T, n3)
    axis-0-windowed, axis-2-extended grids; returns (vr, vi), each
    (S0*S1, Mp)."""
    l0T, w0T, l1T, w1T, i2T, w2T = plan_arrays
    S0, win_pad, n2ext, n3 = GR.shape
    Mp = l0T.shape[2]
    w_pad = l0T.shape[1]
    CH = int(chunk)
    assert Mp % CH == 0 and win_pad == 2 * T and n2ext == S1 * T + T
    fn = _build_strip_interp(S0, S1, T, w_pad, Mp, CH, n3, w, interpret)
    vr, vi = fn(GR, GI, l0T, w0T, l1T, w1T, i2T, w2T)
    return vr[:, 0], vi[:, 0]


# ------------------------------------------- 2-D strip-resident pencils ----
#
# The 2-D slab kernels' dominant cost is NOT HBM traffic or MXU FLOPs but
# the axis-1 one-hot construction: U1 is built over ALL n2 fine-grid
# columns for every point chunk (w VPU passes over an (n2, CH) tile ==
# ~n2*w VPU ops per point; ~9.2k at 512^2/eps=1e-6).  Binning axis 1 as
# well (2-axis pencils, the 3-D insight applied to 2-D) shrinks the
# one-hot support to a (T1 + w - 1)-column window — an ~n2/win1 reduction
# in VPU work (~14x at 512^2).
#
# Layout: the strip accumulator stores COLUMNS AS SUBLANES —
# (1, n2ext, win0_pad), lanes = the 2T0 window rows — so each pencil's
# (win1_pad, win0_pad) window accumulates at the dynamic SUBLANE offset
# s1*T1 (T1 is a multiple of 8; Mosaic handles hinted 8-aligned dynamic
# sublane stores — the round-4 lesson).  Lane-dimension dynamic offsets
# (the untransposed layout) would need 128-alignment.  The strip stays
# VMEM-resident across its S1 x Q grid steps; the axis-1 overlap-add
# never exists in HBM.  Callers transpose back (tiny: 16 lanes), wrap-
# fold the n2ext extension, and 1-axis overlap-add axis 0 (as slab).

@functools.lru_cache(maxsize=64)
def _build_strip_spread2(S0, S1, T0, T1, w_pad, Mp, CH, win1_pad, w,
                         interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q = Mp // CH
    win0 = 2 * T0
    n2ext = S1 * T1 + (win1_pad - T1)

    def kernel(cr_ref, ci_ref, l0_ref, w0_ref, l1_ref, w1_ref,
               outr_ref, outi_ref):
        s1 = pl.program_id(1)
        q = pl.program_id(2)

        def onehot(idx, wt, n):
            return _onehot_tap(idx, wt, n, CH, w)

        @pl.when(jnp.logical_and(s1 == 0, q == 0))
        def _():
            outr_ref[...] = jnp.zeros((1, n2ext, win0), jnp.float32)
            outi_ref[...] = jnp.zeros((1, n2ext, win0), jnp.float32)

        U0 = onehot(l0_ref[0], w0_ref[0], win0)        # (win0, CH)
        U1 = onehot(l1_ref[0], w1_ref[0], win1_pad)    # (win1_pad, CH)
        dims = (((1,), (1,)), ((), ()))                # contract points
        Wr = jax.lax.dot_general(U1 * cr_ref[0], U0, dims,
                                 preferred_element_type=jnp.float32)
        Wi = jax.lax.dot_general(U1 * ci_ref[0], U0, dims,
                                 preferred_element_type=jnp.float32)
        off = pl.multiple_of(s1 * T1, 8)   # T1 is 8-rounded by the planner
        sl = (slice(None), pl.ds(off, win1_pad), slice(None))
        outr_ref[sl] = outr_ref[sl] + Wr[None]
        outi_ref[sl] = outi_ref[sl] + Wi[None]

    plan_spec = pl.BlockSpec((1, w_pad, CH), lambda p, s, q: (p * S1 + s, 0, q))
    pt_spec = pl.BlockSpec((1, 1, CH), lambda p, s, q: (p * S1 + s, 0, q))
    out_spec = pl.BlockSpec((1, n2ext, win0), lambda p, s, q: (p, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(S0, S1, Q),
        in_specs=[pt_spec, pt_spec] + [plan_spec] * 4,
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((S0, n2ext, win0), jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )


def strip_spread2(cr, ci, plan_arrays, *, S0: int, S1: int, T0: int,
                  T1: int, win1_pad: int, w: int, chunk: int,
                  interpret: bool = False):
    """2-D strip-resident pencil spreading: returns (Rr, Ri), each
    (S0, S1*T1 + win1_pad - T1, 2*T0) — COLUMN-MAJOR strips (axis-1
    overlap-add already done in VMEM); callers transpose, wrap-fold the
    column extension, and 1-axis overlap-add axis 0."""
    l0T, w0T, l1T, w1T = plan_arrays
    P, Mp = cr.shape
    w_pad = l0T.shape[1]
    CH = int(chunk)
    assert Mp % CH == 0 and P == S0 * S1
    fn = _build_strip_spread2(S0, S1, T0, T1, w_pad, Mp, CH, win1_pad, w,
                              interpret)
    return fn(cr[:, None, :], ci[:, None, :], l0T, w0T, l1T, w1T)


@functools.lru_cache(maxsize=64)
def _build_strip_interp2(S0, S1, T0, T1, w_pad, Mp, CH, win1_pad, w,
                         interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q = Mp // CH
    win0 = 2 * T0
    n2ext = S1 * T1 + (win1_pad - T1)

    def kernel(gr_ref, gi_ref, l0_ref, w0_ref, l1_ref, w1_ref,
               outr_ref, outi_ref):
        s1 = pl.program_id(1)

        def onehot(idx, wt, n):
            return _onehot_tap(idx, wt, n, CH, w)

        U0 = onehot(l0_ref[0], w0_ref[0], win0)        # (win0, CH)
        U1 = onehot(l1_ref[0], w1_ref[0], win1_pad)    # (win1_pad, CH)
        off = pl.multiple_of(s1 * T1, 8)
        G2 = gr_ref[0, pl.ds(off, win1_pad), :]        # (win1_pad, win0)
        H2 = gi_ref[0, pl.ds(off, win1_pad), :]
        # contract the LONG axis (win1_pad ~ 134) on the MXU K dim — the
        # win0-contracting order left only 16 of the 128 pipeline stages
        # busy — and stack re/im on M; the final U0-weighted reduce is
        # then over win0 = 16 rows instead of win1_pad
        dims = (((0,), (0,)), ((), ()))                # contract win1 rows
        GH = jnp.concatenate([G2, H2], axis=1)         # (win1_pad, 2*win0)
        T2 = jax.lax.dot_general(GH, U1, dims,
                                 preferred_element_type=jnp.float32)
        outr_ref[...] = jnp.sum(T2[:win0] * U0, axis=0,
                                keepdims=True)[None]
        outi_ref[...] = jnp.sum(T2[win0:] * U0, axis=0,
                                keepdims=True)[None]

    plan_spec = pl.BlockSpec((1, w_pad, CH), lambda p, s, q: (p * S1 + s, 0, q))
    g_spec = pl.BlockSpec((1, n2ext, win0), lambda p, s, q: (p, 0, 0))
    out_spec = pl.BlockSpec((1, 1, CH), lambda p, s, q: (p * S1 + s, 0, q))
    return pl.pallas_call(
        kernel,
        grid=(S0, S1, Q),
        in_specs=[g_spec, g_spec] + [plan_spec] * 4,
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((S0 * S1, 1, Mp), jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )


def strip_interp2(GR, GI, plan_arrays, *, S1: int, T0: int, T1: int,
                  w: int, chunk: int, interpret: bool = False):
    """2-D strip-resident pencil interpolation: GR/GI (S0, n2ext, 2*T0)
    column-major axis-0-windowed strips (transpose of
    :func:`strip_spread2`'s output layout); returns (vr, vi), each
    (S0*S1, Mp) pencil-ordered point values."""
    l0T, w0T, l1T, w1T = plan_arrays
    S0, n2ext, win0 = GR.shape
    Mp = l0T.shape[2]
    w_pad = l0T.shape[1]
    CH = int(chunk)
    win1_pad = n2ext - S1 * T1 + T1
    assert Mp % CH == 0 and win0 == 2 * T0
    fn = _build_strip_interp2(S0, S1, T0, T1, w_pad, Mp, CH, win1_pad, w,
                              interpret)
    vr, vi = fn(GR, GI, l0T, w0T, l1T, w1T)
    return vr[:, 0], vi[:, 0]


@functools.lru_cache(maxsize=64)
def _build_ragged_spread2(n_steps, S, w_pad, CH, win_pad, n2, w, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(slab_ref, first_ref, cr_ref, ci_ref, l0_ref, w0_ref,
               i1_ref, w1_ref, outr_ref, outi_ref):
        i = pl.program_id(0)
        U1 = _onehot_tap(i1_ref[0], w1_ref[0], n2, CH, w)       # (n2, CH)
        A = _onehot_tap(l0_ref[0], w0_ref[0], win_pad, CH, w)   # (win_pad, CH)
        dims = (((1,), (1,)), ((), ()))
        A2 = jnp.concatenate([A * cr_ref[0], A * ci_ref[0]], axis=0)
        R2 = jax.lax.dot_general(A2, U1, dims,
                                 preferred_element_type=jnp.float32)
        Rr = R2[:win_pad]
        Ri = R2[win_pad:]

        @pl.when(first_ref[i] == 1)
        def _():
            outr_ref[...] = Rr[None]
            outi_ref[...] = Ri[None]

        @pl.when(first_ref[i] == 0)
        def _():
            outr_ref[...] = outr_ref[...] + Rr[None]
            outi_ref[...] = outi_ref[...] + Ri[None]

    plan_spec = pl.BlockSpec((1, w_pad, CH), lambda i, sl, fi: (i, 0, 0))
    pt_spec = pl.BlockSpec((1, 1, CH), lambda i, sl, fi: (i, 0, 0))
    out_spec = pl.BlockSpec((1, win_pad, n2), lambda i, sl, fi: (sl[i], 0, 0))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=[pt_spec, pt_spec] + [plan_spec] * 4,
        out_specs=[out_spec, out_spec],
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((S, win_pad, n2), jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def ragged_spread2(step_slab, step_first, cr, ci, plan_arrays, *, S: int,
                   n2: int, win: int, w: int, interpret: bool = False):
    """2-D slab spreading over a ragged flat chunk list: each grid step i
    processes CH points of slab ``step_slab[i]`` (steps sorted by slab,
    ``step_first`` marks a slab's first step so the VMEM-resident output
    block initializes instead of accumulating).  No per-slab padding to a
    common max count, and empty slabs get NO steps — their (never
    written) output blocks are undefined and MUST be masked by the
    caller (``jnp.where(occ_mask, R, 0)``).  Returns (Rr, Ri), each
    (S, win_pad, n2)."""
    l0T, w0T, i1T, w1T = plan_arrays
    n_steps, w_pad, CH = l0T.shape
    win_pad = _round8(win)
    fn = _build_ragged_spread2(n_steps, S, w_pad, CH, win_pad, n2, w,
                               interpret)
    return fn(step_slab, step_first, cr[:, None, :], ci[:, None, :],
              l0T, w0T, i1T, w1T)


@functools.lru_cache(maxsize=64)
def _build_ragged_interp2(n_steps, S, w_pad, CH, win_pad, n2, w, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(slab_ref, l0_ref, w0_ref, i1_ref, w1_ref,
               gr_ref, gi_ref, outr_ref, outi_ref):
        del slab_ref                  # only consumed by the index maps
        U0 = _onehot_tap(l0_ref[0], w0_ref[0], win_pad, CH, w)
        dims = (((0,), (0,)), ((), ()))
        TRr = jax.lax.dot_general(gr_ref[0], U0, dims,
                                  preferred_element_type=jnp.float32)
        TRi = jax.lax.dot_general(gi_ref[0], U0, dims,
                                  preferred_element_type=jnp.float32)
        U1 = _onehot_tap(i1_ref[0], w1_ref[0], n2, CH, w)
        outr_ref[...] = jnp.sum(TRr * U1, axis=0, keepdims=True)[None]
        outi_ref[...] = jnp.sum(TRi * U1, axis=0, keepdims=True)[None]

    plan_spec = pl.BlockSpec((1, w_pad, CH), lambda i, sl: (i, 0, 0))
    g_spec = pl.BlockSpec((1, win_pad, n2), lambda i, sl: (sl[i], 0, 0))
    out_spec = pl.BlockSpec((1, 1, CH), lambda i, sl: (i, 0, 0))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[plan_spec] * 4 + [g_spec, g_spec],
        out_specs=[out_spec, out_spec],
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((n_steps, 1, CH), jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def ragged_interp2(step_slab, GR, GI, plan_arrays, *, w: int,
                   interpret: bool = False):
    """Transpose of :func:`ragged_spread2`: grid step i interpolates CH
    points of slab ``step_slab[i]`` from that slab's (win_pad, n2)
    window.  GR/GI: (S, win_pad, n2); returns (vr, vi), each
    (n_steps, CH) flat point values (caller gathers via invperm)."""
    l0T, w0T, i1T, w1T = plan_arrays
    n_steps, w_pad, CH = l0T.shape
    S, win_pad, n2 = GR.shape
    fn = _build_ragged_interp2(n_steps, S, w_pad, CH, win_pad, n2, w,
                               interpret)
    vr, vi = fn(step_slab, l0T, w0T, i1T, w1T, GR, GI)
    return vr[:, 0], vi[:, 0]


@functools.lru_cache(maxsize=64)
def _build_ragged_spread3(n_steps, S, w_pad, CH, win_pad, n2, n3, w,
                          interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(slab_ref, first_ref, cr_ref, ci_ref, l0_ref, w0_ref,
               i1_ref, w1_ref, i2_ref, w2_ref, outr_ref, outi_ref):
        i = pl.program_id(0)
        U0 = _onehot_tap(l0_ref[0], w0_ref[0], win_pad, CH, w)
        U1 = _onehot_tap(i1_ref[0], w1_ref[0], n2, CH, w)
        U2 = _onehot_tap(i2_ref[0], w2_ref[0], n3, CH, w)
        A = (U0[:, None, :] * U1[None, :, :]).reshape(win_pad * n2, CH)
        dims = (((1,), (1,)), ((), ()))
        Rr = jax.lax.dot_general(A * cr_ref[0], U2, dims,
                                 preferred_element_type=jnp.float32)
        Ri = jax.lax.dot_general(A * ci_ref[0], U2, dims,
                                 preferred_element_type=jnp.float32)

        @pl.when(first_ref[i] == 1)
        def _():
            outr_ref[...] = Rr[None]
            outi_ref[...] = Ri[None]

        @pl.when(first_ref[i] == 0)
        def _():
            outr_ref[...] = outr_ref[...] + Rr[None]
            outi_ref[...] = outi_ref[...] + Ri[None]

    plan_spec = pl.BlockSpec((1, w_pad, CH), lambda i, sl, fi: (i, 0, 0))
    pt_spec = pl.BlockSpec((1, 1, CH), lambda i, sl, fi: (i, 0, 0))
    out_spec = pl.BlockSpec((1, win_pad * n2, n3),
                            lambda i, sl, fi: (sl[i], 0, 0))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=[pt_spec, pt_spec] + [plan_spec] * 6,
        out_specs=[out_spec, out_spec],
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((S, win_pad * n2, n3),
                                        jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def ragged_spread3(step_slab, step_first, cr, ci, plan_arrays, *, S: int,
                   n2: int, n3: int, win: int, w: int,
                   interpret: bool = False):
    """3-D analog of :func:`ragged_spread2` (axis-0 slab bins only — the
    fallback between the pencil partition and XLA scatter for clustered
    3-D sets).  Returns (Rr, Ri), each (S, win_pad*n2, n3); unvisited
    slabs' blocks are undefined — callers mask with ``jnp.where``."""
    l0T, w0T, i1T, w1T, i2T, w2T = plan_arrays
    n_steps, w_pad, CH = l0T.shape
    win_pad = _round8(win)
    fn = _build_ragged_spread3(n_steps, S, w_pad, CH, win_pad, n2, n3, w,
                               interpret)
    return fn(step_slab, step_first, cr[:, None, :], ci[:, None, :],
              l0T, w0T, i1T, w1T, i2T, w2T)


@functools.lru_cache(maxsize=64)
def _build_ragged_interp3(n_steps, S, w_pad, CH, win_pad, n2, n3, w,
                          interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(slab_ref, l0_ref, w0_ref, i1_ref, w1_ref, i2_ref, w2_ref,
               gr_ref, gi_ref, outr_ref, outi_ref):
        del slab_ref
        U0 = _onehot_tap(l0_ref[0], w0_ref[0], win_pad, CH, w)
        U1 = _onehot_tap(i1_ref[0], w1_ref[0], n2, CH, w)
        U2 = _onehot_tap(i2_ref[0], w2_ref[0], n3, CH, w)
        A = (U0[:, None, :] * U1[None, :, :]).reshape(win_pad * n2, CH)
        dims = (((0,), (0,)), ((), ()))     # contract the window rows
        TRr = jax.lax.dot_general(gr_ref[0], A, dims,
                                  preferred_element_type=jnp.float32)
        TRi = jax.lax.dot_general(gi_ref[0], A, dims,
                                  preferred_element_type=jnp.float32)
        # TR* : (n3, CH); reduce with the axis-2 taps
        outr_ref[...] = jnp.sum(TRr * U2, axis=0, keepdims=True)[None]
        outi_ref[...] = jnp.sum(TRi * U2, axis=0, keepdims=True)[None]

    plan_spec = pl.BlockSpec((1, w_pad, CH), lambda i, sl: (i, 0, 0))
    g_spec = pl.BlockSpec((1, win_pad * n2, n3), lambda i, sl: (sl[i], 0, 0))
    out_spec = pl.BlockSpec((1, 1, CH), lambda i, sl: (i, 0, 0))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[plan_spec] * 6 + [g_spec, g_spec],
        out_specs=[out_spec, out_spec],
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((n_steps, 1, CH), jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def ragged_interp3(step_slab, GR, GI, plan_arrays, *, w: int,
                   interpret: bool = False):
    """Transpose of :func:`ragged_spread3`: GR/GI (S, win_pad*n2, n3)
    flattened slab windows; returns (vr, vi), each (n_steps, CH)."""
    l0T, w0T, i1T, w1T, i2T, w2T = plan_arrays
    n_steps, w_pad, CH = l0T.shape
    S, wn2, n3 = GR.shape
    win_pad = _round8(2 * w)            # T == w for slab windows
    assert wn2 % win_pad == 0
    fn = _build_ragged_interp3(n_steps, S, w_pad, CH, win_pad,
                               wn2 // win_pad, n3, w, interpret)
    vr, vi = fn(step_slab, l0T, w0T, i1T, w1T, i2T, w2T, GR, GI)
    return vr[:, 0], vi[:, 0]


# ---------------------------------------- ragged 3-D pencil (strip) kernels --
#
# Flat-chunk-list 2-axis pencil partition for CLUSTERED 3-D sets (type-3
# fine grids): each occupied (p0, p1) pencil contributes ceil(cnt/CH) steps
# to one flat list sorted by bin id, so all of an axis-0 row's steps are
# consecutive and the row's (2T, n2ext, n3) strip stays VMEM-resident
# across them (the ragged analog of strip_spread3).  Per-point tap work is
# (2w)^2 n3 MACs — n2/2w cheaper than the ragged slab fallback — while
# padding stays bounded at one chunk per occupied pencil.  Unvisited
# axis-0 rows' strips are UNDEFINED: callers mask with jnp.where.

@functools.lru_cache(maxsize=64)
def _build_ragged_pencil_spread3(n_steps, S0, S1, T, w_pad, CH, n3, w,
                                 interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    win_pad = 2 * T
    n2ext = S1 * T + T

    def kernel(bin_ref, sfirst_ref, cr_ref, ci_ref, l0_ref, w0_ref,
               l1_ref, w1_ref, i2_ref, w2_ref, outr_ref, outi_ref):
        i = pl.program_id(0)
        U0 = _onehot_tap(l0_ref[0], w0_ref[0], win_pad, CH, w)
        U1 = _onehot_tap(l1_ref[0], w1_ref[0], win_pad, CH, w)
        U2 = _onehot_tap(i2_ref[0], w2_ref[0], n3, CH, w)
        A = (U0[:, None, :] * U1[None, :, :]).reshape(win_pad * win_pad, CH)
        dims = (((1,), (1,)), ((), ()))
        Rr = jax.lax.dot_general(A * cr_ref[0], U2, dims,
                                 preferred_element_type=jnp.float32)
        Ri = jax.lax.dot_general(A * ci_ref[0], U2, dims,
                                 preferred_element_type=jnp.float32)

        @pl.when(sfirst_ref[i] == 1)
        def _():
            outr_ref[...] = jnp.zeros((1, win_pad, n2ext, n3), jnp.float32)
            outi_ref[...] = jnp.zeros((1, win_pad, n2ext, n3), jnp.float32)

        s1 = bin_ref[i] % S1
        off = pl.multiple_of(s1 * T, 8)     # T is 8-rounded by the planner
        shp = (1, win_pad, win_pad, n3)
        sl = (slice(None), slice(None), pl.ds(off, win_pad), slice(None))
        outr_ref[sl] = outr_ref[sl] + Rr.reshape(shp)
        outi_ref[sl] = outi_ref[sl] + Ri.reshape(shp)

    plan_spec = pl.BlockSpec((1, w_pad, CH), lambda i, bn, sf: (i, 0, 0))
    pt_spec = pl.BlockSpec((1, 1, CH), lambda i, bn, sf: (i, 0, 0))
    out_spec = pl.BlockSpec((1, win_pad, n2ext, n3),
                            lambda i, bn, sf: (bn[i] // S1, 0, 0, 0))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=[pt_spec, pt_spec] + [plan_spec] * 6,
        out_specs=[out_spec, out_spec],
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((S0, win_pad, n2ext, n3),
                                        jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def ragged_pencil_spread3(step_bin, strip_first, cr, ci, plan_arrays, *,
                          S0: int, S1: int, T: int, n3: int, w: int,
                          interpret: bool = False):
    """Ragged strip-resident 3-D pencil spreading: returns (Rr, Ri), each
    (S0, 2T, S1*T + T, n3) with axis-1 overlap-add done in VMEM; strips of
    unoccupied axis-0 rows are undefined (mask with the plan's occ0)."""
    l0T, w0T, l1T, w1T, i2T, w2T = plan_arrays
    n_steps, w_pad, CH = l0T.shape
    fn = _build_ragged_pencil_spread3(n_steps, S0, S1, T, w_pad, CH, n3, w,
                                      interpret)
    return fn(step_bin, strip_first, cr[:, None, :], ci[:, None, :],
              l0T, w0T, l1T, w1T, i2T, w2T)


@functools.lru_cache(maxsize=64)
def _build_ragged_pencil_interp3(n_steps, S0, S1, T, w_pad, CH, n3, w,
                                 interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    win_pad = 2 * T
    n2ext = S1 * T + T

    def kernel(bin_ref, l0_ref, w0_ref, l1_ref, w1_ref, i2_ref, w2_ref,
               gr_ref, gi_ref, outr_ref, outi_ref):
        i = pl.program_id(0)
        U0 = _onehot_tap(l0_ref[0], w0_ref[0], win_pad, CH, w)
        U1 = _onehot_tap(l1_ref[0], w1_ref[0], win_pad, CH, w)
        U2 = _onehot_tap(i2_ref[0], w2_ref[0], n3, CH, w)
        A = (U0[:, None, :] * U1[None, :, :]).reshape(win_pad * win_pad, CH)
        s1 = bin_ref[i] % S1
        off = pl.multiple_of(s1 * T, 8)
        sl = (0, slice(None), pl.ds(off, win_pad), slice(None))
        G2 = gr_ref[sl].reshape(win_pad * win_pad, n3)
        H2 = gi_ref[sl].reshape(win_pad * win_pad, n3)
        dims = (((1,), (0,)), ((), ()))     # (win^2, n3) @ (n3, CH)
        TRr = jax.lax.dot_general(G2, U2, dims,
                                  preferred_element_type=jnp.float32)
        TRi = jax.lax.dot_general(H2, U2, dims,
                                  preferred_element_type=jnp.float32)
        outr_ref[...] = jnp.sum(TRr * A, axis=0, keepdims=True)[None]
        outi_ref[...] = jnp.sum(TRi * A, axis=0, keepdims=True)[None]

    plan_spec = pl.BlockSpec((1, w_pad, CH), lambda i, bn: (i, 0, 0))
    g_spec = pl.BlockSpec((1, win_pad, n2ext, n3),
                          lambda i, bn: (bn[i] // S1, 0, 0, 0))
    out_spec = pl.BlockSpec((1, 1, CH), lambda i, bn: (i, 0, 0))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[plan_spec] * 6 + [g_spec, g_spec],
        out_specs=[out_spec, out_spec],
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((n_steps, 1, CH), jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def ragged_pencil_interp3(step_bin, GR, GI, plan_arrays, *, S1: int,
                          T: int, w: int, interpret: bool = False):
    """Transpose of :func:`ragged_pencil_spread3`: GR/GI (S0, 2T, S1*T+T,
    n3) axis-0-windowed, axis-1-extended grids; returns (vr, vi), each
    (n_steps, CH) flat point values (caller gathers via invperm)."""
    l0T, w0T, l1T, w1T, i2T, w2T = plan_arrays
    n_steps, w_pad, CH = l0T.shape
    S0 = GR.shape[0]
    n3 = GR.shape[3]
    fn = _build_ragged_pencil_interp3(n_steps, S0, S1, T, w_pad, CH, n3, w,
                                      interpret)
    vr, vi = fn(step_bin, l0T, w0T, l1T, w1T, i2T, w2T, GR, GI)
    return vr[:, 0], vi[:, 0]
