r"""Fused Condat-Vu TV-deconvolution iteration.

The headline workload's iteration (reference call stack: pds.py:429 m_step
-> stencil/pad applies, each a separate bandwidth-bound pass) is a chain of
small-halo stencil passes + BLAS-1 + a pointwise prox.  Evaluated through
the operator stack each piece round-trips HBM (~20 frame-traffics per
iteration at 4K); fusing the whole iteration into one band-partitioned
Pallas kernel cuts that to ~7 (x, z0, z1, b read once + x, z0, z1 written
once, plus halo overlap), which is the remaining ~2x of headroom measured
in BASELINE.md's per-op budget.

Pattern handled (the TV-deconvolution family, BASELINE workload 2):

    min_x 0.5*cst*||K x||^2 + <b, x> (+ const) + lam*||D x||_{2,1}

* ``K``: 2-D separable correlation, boundary mode ``symmetric`` or
  ``constant`` (pyxu Stencil semantics: pad -> valid corr; adjoint = full
  corr with flipped taps -> pad fold-back; reference stencil.py:564-607 and
  pad.py:84-130);
* ``D``: first-order forward-difference gradient, same boundary modes
  (reference diff.py:446-520);
* prox: per-pixel L21 block soft-threshold over the 2 gradient components
  (reference norm.py:296-366).

Two implementations with matching numerics:

* :func:`tv_step_xla` — full-frame jnp expression of one iteration (the
  operator semantics hand-inlined; CPU/fallback path and test oracle);
* :func:`tv_step_pallas` — band-partitioned Pallas TPU kernel.  Every input
  band is DMA'd with halo rows and then *virtualized*: re-indexed so local
  row ``j`` always corresponds to virtual image row ``band_start - top + j``
  with the boundary extension (symmetric reflection / zeros) materialized
  in VMEM.  All downstream indexing is static and identical across bands;
  image-boundary operator rules (fold-backs, gradient edge rows) are the
  only predicated pieces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["tv_step_xla", "tv_step_pallas", "tv_step2_pallas",
           "match_fused_tv", "match_fused_tv2"]


# ---------------------------------------------------------------- helpers --

def _fwd_axis(x, k, c, ax, mode):
    """Stencil forward along one axis: pad(mode) -> valid correlation."""
    L = int(k.shape[0])
    lo, hi = c, L - 1 - c
    pads = [(0, 0)] * x.ndim
    pads[ax] = (lo, hi)
    xp = jnp.pad(x, pads) if mode == "constant" else jnp.pad(x, pads, mode=mode)
    n = x.shape[ax]
    out = None
    for t in range(L):
        term = k[t] * jax.lax.slice_in_dim(xp, t, t + n, axis=ax)
        out = term if out is None else out + term
    return out


def _adj_axis(r, k, c, ax, mode):
    """Stencil adjoint along one axis: full correlation with the flipped
    kernel, then the Pad fold-back (pad.py adjoint semantics)."""
    L = int(k.shape[0])
    lo, hi = c, L - 1 - c
    n = r.shape[ax]
    pads = [(0, 0)] * r.ndim
    pads[ax] = (L - 1, L - 1)
    rp = jnp.pad(r, pads)
    out = None
    for t in range(L):
        term = k[L - 1 - t] * jax.lax.slice_in_dim(rp, t, t + n + L - 1, axis=ax)
        out = term if out is None else out + term
    core = jax.lax.slice_in_dim(out, lo, lo + n, axis=ax)
    if mode == "constant" or (lo == 0 and hi == 0):
        return core
    assert mode == "symmetric"
    if lo:
        ghost = jnp.flip(jax.lax.slice_in_dim(out, 0, lo, axis=ax), axis=ax)
        pad_spec = [(0, 0)] * r.ndim
        pad_spec[ax] = (0, n - lo)
        core = core + jnp.pad(ghost, pad_spec)
    if hi:
        ghost = jnp.flip(
            jax.lax.slice_in_dim(out, lo + n, lo + n + hi, axis=ax), axis=ax)
        pad_spec = [(0, 0)] * r.ndim
        pad_spec[ax] = (n - hi, 0)
        core = core + jnp.pad(ghost, pad_spec)
    return core


def _fdiff(v, ax, mode):
    """Forward difference with boundary pad (Gradient semantics)."""
    n = v.shape[ax]
    nxt = jax.lax.slice_in_dim(v, 1, n, axis=ax)
    cur = jax.lax.slice_in_dim(v, 0, n - 1, axis=ax)
    d = nxt - cur
    pad_spec = [(0, 0)] * v.ndim
    pad_spec[ax] = (0, 1)
    if mode == "symmetric":        # ghost = edge copy -> last diff 0
        return jnp.pad(d, pad_spec)
    # constant: ghost = 0 -> last diff = -v[n-1]
    last = -jax.lax.slice_in_dim(v, n - 1, n, axis=ax)
    return jnp.concatenate([d, last], axis=ax)


def _fdiff_adjoint(g, ax, mode):
    """Adjoint of _fdiff: d[0] = -g[0]; d[i] = g[i-1] - g[i]; symmetric
    fold adds g[n-1] back onto d[n-1]."""
    n = g.shape[ax]
    prev = jax.lax.slice_in_dim(g, 0, n - 1, axis=ax)
    cur = jax.lax.slice_in_dim(g, 1, n, axis=ax)
    inner = prev - cur
    first = -jax.lax.slice_in_dim(g, 0, 1, axis=ax)
    out = jnp.concatenate([first, inner], axis=ax)
    if mode == "symmetric":
        lastfix = jax.lax.slice_in_dim(g, n - 1, n, axis=ax)
        pad_spec = [(0, 0)] * g.ndim
        pad_spec[ax] = (n - 1, 0)
        out = out + jnp.pad(lastfix, pad_spec)
    return out


def _l21_fenchel(zt0, zt1, lam):
    """z - sigma*prox_{lam/sigma L21}(z/sigma) collapsed to the direct form
    zt * min(1, lam/||zt||) (matches L21Norm.prox + Moreau identity).
    Evaluated as ``min(lam * rsqrt(||zt||^2), 1)`` — one rsqrt instead of
    sqrt+divide (the prox runs on every pixel every iteration)."""
    n2 = zt0 * zt0 + zt1 * zt1
    tiny = jnp.asarray(np.finfo(np.float32).tiny, zt0.dtype)
    fac = jnp.minimum(lam * jax.lax.rsqrt(jnp.maximum(n2, tiny)), 1.0)
    return zt0 * fac, zt1 * fac


# ----------------------------------------------------------- XLA reference --

def tv_step_xla(x, z0, z1, b, k0, k1, c0, c1, *, cst, lam, tau, sigma, rho,
                mode_k="symmetric", mode_d="symmetric"):
    """One Condat-Vu iteration of the TV-deconvolution family, full-frame.

    Matches ``CondatVu.m_step`` on (f = 0.5*cst*||K.||^2 + <b,.> + t,
    g = None, h = lam*L21, K = Gradient) up to float reassociation.
    """
    Kx = _fwd_axis(_fwd_axis(x, k0, c0, 0, mode_k), k1, c1, 1, mode_k)
    KtKx = _adj_axis(_adj_axis(Kx, k1, c1, 1, mode_k), k0, c0, 0, mode_k)
    gf = cst * KtKx + b
    dtz = _fdiff_adjoint(z0, 0, mode_d) + _fdiff_adjoint(z1, 1, mode_d)
    xp = x - tau * (gf + dtz)
    v = 2.0 * xp - x
    zt0 = z0 + sigma * _fdiff(v, 0, mode_d)
    zt1 = z1 + sigma * _fdiff(v, 1, mode_d)
    zp0, zp1 = _l21_fenchel(zt0, zt1, lam)
    if rho == 1.0:
        return xp, zp0, zp1
    return (x + rho * (xp - x), z0 + rho * (zp0 - z0), z1 + rho * (zp1 - z1))


# ----------------------------------------- fused normal-op (K^T K) data ----

def _np_fwd_axis(x, k, c, ax, mode):
    """Numpy mirror of :func:`_fwd_axis` (float64, host)."""
    L = k.shape[0]
    lo, hi = c, L - 1 - c
    pads = [(0, 0)] * x.ndim
    pads[ax] = (lo, hi)
    xp = np.pad(x, pads) if mode == "constant" else np.pad(x, pads, mode=mode)
    n = x.shape[ax]
    out = 0.0
    for t in range(L):
        sl = [slice(None)] * x.ndim
        sl[ax] = slice(t, t + n)
        out = out + k[t] * xp[tuple(sl)]
    return out


def _np_adj_axis(r, k, c, ax, mode):
    """Numpy mirror of :func:`_adj_axis`."""
    L = k.shape[0]
    lo, hi = c, L - 1 - c
    n = r.shape[ax]
    pads = [(0, 0)] * r.ndim
    pads[ax] = (L - 1, L - 1)
    rp = np.pad(r, pads)
    out = 0.0
    for t in range(L):
        sl = [slice(None)] * r.ndim
        sl[ax] = slice(t, t + n + L - 1)
        out = out + k[L - 1 - t] * rp[tuple(sl)]

    def take(a, s0, s1):
        sl = [slice(None)] * r.ndim
        sl[ax] = slice(s0, s1)
        return a[tuple(sl)]

    core = take(out, lo, lo + n)
    if mode == "constant" or (lo == 0 and hi == 0):
        return core
    if lo:
        ghost = np.flip(take(out, 0, lo), axis=ax)
        pad_spec = [(0, 0)] * r.ndim
        pad_spec[ax] = (0, n - lo)
        core = core + np.pad(ghost, pad_spec)
    if hi:
        ghost = np.flip(take(out, lo + n, lo + n + hi), axis=ax)
        pad_spec = [(0, 0)] * r.ndim
        pad_spec[ax] = (n - hi, 0)
        core = core + np.pad(ghost, pad_spec)
    return core


def _col_block_mats(g1t, h1):
    """Three (128, 128) matrices expressing the banded column stage as
    block matmuls over 128-lane tiles: out tile j = aL_j @ Bm1 + a_j @ B0
    + aR_j @ Bp1, with aL/aR = whole-array lane rolls by +-128 (wrapped —
    the wrap garbage lands in the same <=h1 edge columns the S1/M1
    correction already subtracts, because the composite matrix equals the
    rolled-banded base exactly).  Opt-in (PYXU_TPU_FUSED_CMM=1) and
    MEASURED SLOWER on v5e at 4K/K=3: 0.830 vs 0.594 ms/iter — the 384
    f32 MACs/element (plus the rank-3 dot_general relayouts) cost more
    MXU time than the 33 VPU passes they replace.  Kept as a documented
    dead end (numerics verified 1.8e-7); don't re-enable without bf16
    operands or a layout-free tile matmul."""
    B0 = np.zeros((128, 128), np.float32)
    Bm1 = np.zeros((128, 128), np.float32)
    Bp1 = np.zeros((128, 128), np.float32)
    for k in range(128):
        for c in range(128):
            d = k - c
            if abs(d) <= h1:
                B0[k, c] = g1t[d + h1]
            d = k - 128 - c              # source tile j-1 (via aL)
            if abs(d) <= h1:
                Bm1[k, c] = g1t[d + h1]
            d = k + 128 - c              # source tile j+1 (via aR)
            if abs(d) <= h1:
                Bp1[k, c] = g1t[d + h1]
    return B0, Bm1, Bp1


def _row_stage_mats(g0t, D0t, D0b, r0t, r0b, hk, R, n_out, n_in, xT, oT):
    """Three (n_out, n_in) row-stage matrices — interior / first / last band.

    The row stage ``out[r] = sum_d g0[d+hk] x[xT-oT+r+d]`` is a BANDED
    matmul; evaluating it on the MXU reads the x window ONCE instead of
    2L-1 sliced passes — the kernel's exposed cost is VMEM-port traffic
    contending with the input DMA (tools/fused_tv_probe.py probe_overlap:
    register-resident compute hides behind DMA, VMEM-heavy compute is
    additive), so collapsing 17 sliced reads into one matmul stream is the
    lever, not FLOPs.  The first/last matrices additionally carry the G0
    corner-correction blocks, eliminating the separate correction dots and
    concats."""
    A = np.zeros((n_out, n_in), np.float32)
    base = xT - oT
    for r in range(n_out):
        for d in range(-hk, hk + 1):
            j = base + r + d
            if 0 <= j < n_in:
                A[r, j] += g0t[d + hk]
    Af = A.copy()
    # first band: out virtual rows [0, r0t) at local oT+vr; x virtual col c
    # at local xT+c
    for vr in range(min(r0t, n_out - oT)):
        for c in range(D0t.shape[1]):
            if xT + c < n_in:
                Af[oT + vr, xT + c] += D0t[vr, c]
    Al = A.copy()
    for vr in range(D0b.shape[0]):
        rr = R - r0b + oT + vr
        if not (0 <= rr < n_out):
            continue
        for c in range(D0b.shape[1]):
            jj = xT + R - D0b.shape[1] + c
            if 0 <= jj < n_in:
                Al[rr, jj] += D0b[vr, c]
    # B0-clip semantics baked in: the first/last matrices IGNORE window
    # rows that are outside the image (virtual < 0 / >= H), so callers
    # need not zero-mask their inputs (saves the per-band where-passes)
    Af[:, :xT] = 0.0
    Al[:, xT + R:] = 0.0
    return A, Af, Al


@functools.lru_cache(maxsize=32)
def _normal_op_data(H, W, k0, k1, c0, c1, mode_k):
    """Host-precomputed data for the FUSED normal operator ``K^T K``.

    ``K = R0 ∘ C0`` is separable, so ``K^T K = (R0^T R0) ∘ (C0^T C0)`` — one
    symmetric (2L-1)-tap stencil per axis instead of the four forward/adjoint
    stages (VERDICT r4 weak #1: the K stages were the kernel's only exposed
    VPU cost, 0.27 ms of the 0.99 ms iteration — tools/fused_tv_probe.py).
    Each axis factor is the exact dense normal matrix ``G = A^T A`` (pad +
    foldback semantics included), decomposed as

        G = banded(autocorr taps, clipped to [0, n))  +  sparse correction

    where the correction (boundary folds MINUS the wrap garbage of the
    kernel's unmasked lane-rolls, for the column axis) is confined to edge
    rows/columns and is applied as small MXU matmuls:

      axis 0 (rows):  D0 = G0 - B0_clip, nonzero only in the top-left /
          bottom-right corner blocks -> per-band matmul on first/last bands;
      axis 1 (cols):  D1 = G1 - B1_wrap (B1_wrap = what Σ_d g1[d]·roll(a, d)
          actually computes) -> corr = (a @ S1) @ M1 with S1 a column
          selector and M1 = D1[srcs, :] (both ~48 x W).

    All blocks are zero-padded to multiples of 8/128 so the in-kernel
    matmuls are Mosaic-tileable; the pads are zeros and contribute nothing.
    Returns numpy float32 arrays: (g0, D0_top, D0_bot, r0t, r0b, g1, S1, M1).
    """
    ka0 = np.asarray(k0, np.float64)
    ka1 = np.asarray(k1, np.float64)
    L0, L1 = ka0.shape[0], ka1.shape[0]

    def au(v, a=8):
        return -(-max(int(v), 1) // a) * a

    # ---- axis 0: exact normal matrix on the H grid -------------------------
    I = np.eye(H)
    G0 = _np_adj_axis(_np_fwd_axis(I, ka0, c0, 0, mode_k), ka0, c0, 0, mode_k)
    # kernel's banded part: out[r] = sum_d g0[d+L0-1] * x[r+d], zero outside
    g0 = np.correlate(ka0, ka0, "full")           # (2 L0 - 1,), symmetric
    B0 = np.zeros((H, H))
    for d in range(-(L0 - 1), L0):
        B0 += g0[d + L0 - 1] * np.eye(H, k=d)
    D0 = G0 - B0
    tol = 1e-12 * max(1.0, np.abs(G0).max())
    nz = np.argwhere(np.abs(D0) > tol)
    r0t = c0t = r0b = c0b = 0
    if nz.size:
        top = nz[(nz[:, 0] < H // 2) & (nz[:, 1] < H // 2)]
        bot = nz[(nz[:, 0] >= H // 2) & (nz[:, 1] >= H // 2)]
        assert len(top) + len(bot) == len(nz), "D0 support not corner-local"
        if len(top):
            r0t, c0t = int(top[:, 0].max()) + 1, int(top[:, 1].max()) + 1
        if len(bot):
            r0b = H - int(bot[:, 0].min())
            c0b = H - int(bot[:, 1].min())
    r0t, c0t, r0b, c0b = au(r0t), au(c0t), au(r0b), au(c0b)
    D0_top = D0[:r0t, :c0t].astype(np.float32)
    D0_bot = D0[H - r0b:, H - c0b:].astype(np.float32)

    # ---- axis 1: exact normal matrix on the W grid -------------------------
    I = np.eye(W)
    G1 = _np_adj_axis(_np_fwd_axis(I, ka1, c1, 1, mode_k), ka1, c1, 1, mode_k)
    # Y convention: out = a @ Y for a row-batch a (see _col_fwd orientation);
    # basis rows: Y[j, i] = (G1 e_j)[i] -> Y = G1^T (G1 symmetric anyway)
    Y = G1.T
    g1 = np.correlate(ka1, ka1, "full")
    Yb = np.zeros((W, W))
    for d in range(-(L1 - 1), L1):
        # kernel computes out[:, i] = sum_d g1[d] * a[:, (i + d) mod W]
        idx = (np.arange(W) + d) % W
        Yb[idx, np.arange(W)] += g1[d + L1 - 1]
    D1 = Y - Yb
    srcs = np.flatnonzero(np.abs(D1).max(axis=1) > tol)
    ns = au(len(srcs), 8)
    S1 = np.zeros((W, ns), np.float32)
    M1 = np.zeros((ns, W), np.float32)
    for m, s in enumerate(srcs):
        S1[s, m] = 1.0
        M1[m] = D1[s]
    return (g0.astype(np.float32), D0_top, D0_bot, r0t, r0b,
            g1.astype(np.float32), S1, M1)


# ------------------------------------------------------------ Pallas kernel --

def _band_size(H, target=128, align=8):
    """Largest divisor of H <= target, preferring multiples of ``align``.

    Band-size sweep at 4K on v5e (ms/iter): R=24 OOM-free but halo-heavy,
    48: 1.71, 80: 1.51, 120: 1.47, 216: 1.56, 240: 1.48, 432: VMEM OOM —
    ~128 rows balances halo amortization against VMEM pressure.  ``align``
    is the Mosaic sublane tile (8 for f32 buffers, 16 when any state buffer
    is bf16-stored: 2-byte dtypes tile as (16, 128))."""
    target = min(target, H // 2)       # the kernel needs >= 2 bands
    best = 1
    for r in range(1, min(H, target) + 1):
        if H % r == 0 and (r % align == 0, r) >= (best % align == 0, best):
            best = r
    return best


def tv_step_pallas(x, z, b, *, k0, k1, c0, c1, cst, lam, tau, sigma,
                   rho, mode_k="symmetric", mode_d="symmetric",
                   band=None, interpret=False):
    """Band-partitioned Pallas version of :func:`tv_step_xla`.

    ``z`` is the stacked dual state ``(2, H, W)`` (CondatVu's mstate layout)
    and the return is ``(x_new, z_new)`` with the same shapes — passing the
    stacked array straight through avoids 4 frame-copies per iteration that
    slicing/stacking around the pallas_call would cost.

    ``k0``/``k1`` are tap TUPLES (host floats), the rest plan scalars.  Grid
    over row bands; per band, DMA x/z/b windows with halo rows from HBM
    into VMEM scratch, virtualize their row indexing, run the whole
    iteration in VMEM, and write the (x, z) output bands.

    Mixed-precision storage: ``x``/``z`` may be float32 or bfloat16
    independently (``b`` follows ``x``).  All arithmetic runs in float32 in
    VMEM; bf16 state is cast on load and quantized once on store, so the
    only numerical effect is per-iteration state rounding.  bf16 halves the
    HBM traffic of the buffers it is applied to (the kernel is
    bandwidth-bound — BASELINE.md round-3/4).

    Deliberately NOT wrapped in jax.jit: an effectful (DMA-semaphore)
    closed_call nested inside an outer jit trips XLA's lowering cache;
    callers trace this inline and the pallas_call object is memoised on the
    static configuration instead.
    """
    import os
    fuse_g = os.environ.get("PYXU_TPU_FUSED_G", "1") != "0"
    return _build_tv_pallas(
        x.shape, str(x.dtype), str(z.dtype), tuple(float(v) for v in k0),
        tuple(float(v) for v in k1), int(c0), int(c1), float(cst),
        float(lam), float(tau), float(sigma), float(rho), mode_k, mode_d,
        band, interpret, fuse_g)(x, z, b)


@functools.lru_cache(maxsize=128)
def _build_tv_pallas(shape, dtype_str, z_dtype_str, k0, k1, c0, c1, cst, lam,
                     tau, sigma, rho, mode_k, mode_d, band, interpret,
                     fuse_g=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = shape
    ka0 = np.asarray(k0, np.float32)
    ka1 = np.asarray(k1, np.float32)
    L0, L1 = ka0.shape[0], ka1.shape[0]
    lo0, hi0 = c0, L0 - 1 - c0
    lo1, hi1 = c1, L1 - 1 - c1
    hk = lo0 + hi0                     # one-pass row halo of K
    sym_k = mode_k == "symmetric"
    sym_d = mode_d == "symmetric"
    assert mode_k in ("symmetric", "constant")
    assert mode_d in ("symmetric", "constant")

    xdt = jnp.dtype(dtype_str)
    zdt = jnp.dtype(z_dtype_str)
    bf16 = jnp.dtype(jnp.bfloat16)
    # compute dtype: all VMEM arithmetic runs in f32 when any state buffer
    # is bf16-stored (bf16 is a storage format here, not a compute format)
    if xdt == bf16 or zdt == bf16:
        cdt = jnp.dtype(jnp.float32)
    else:
        cdt = jnp.promote_types(xdt, zdt)
    bdt = cdt                          # linear term rides at compute precision
    # Mosaic sublane tiling: (8, 128) for 4-byte dtypes, (16, 128) for
    # 2-byte — DMA row-window starts/sizes must respect each buffer's tile
    ax_al = 16 if xdt == bf16 else 8
    az_al = 16 if zdt == bf16 else 8

    R = band or _band_size(H, align=max(ax_al, az_al))
    nb = H // R
    assert H % R == 0 and nb >= 2, (H, R)
    if fuse_g:
        # fused-normal-op eligibility: the host-precomputed correction
        # blocks must fit the band (decided BEFORE the window sizes, which
        # are narrower on the fused path)
        g0t, D0t_np, D0b_np, r0t, r0b, g1t, S1_np, M1_np = \
            _normal_op_data(H, W, k0, k1, c0, c1, mode_k)
        c0t = D0t_np.shape[1]
        c0b = D0b_np.shape[1]
        h1 = L1 - 1
        if max(r0t, r0b, c0t, c0b) > R:
            fuse_g = False
    # Virtual windows per input (rows [a0-T, a0-T+N)).  Mosaic constrains
    # HBM DMA row-slices to the dtype tiling: both the start offset and
    # the window size must be multiples of the sublane count.  With R, H,
    # T, N all aligned every clamped start a0-T stays aligned, so halos are
    # rounded up (the extra rows are dead weight in VMEM, nothing else).
    def _au(v, a):
        return -(-v // a) * a

    aligned = (R % max(ax_al, az_al) == 0) and (H % max(ax_al, az_al) == 0)
    assert aligned or interpret, (H, R)   # compiled path needs the tiling
    if aligned:
        # fused normal-op path needs only the +-hk row halo (the banded
        # taps); the 4-stage path additionally re-derives Kx rows, widening
        # the window by the kernel's center offsets
        TX = _au(hk if fuse_g else hk + lo0, ax_al)
        NX = _au(TX + R + hk + (0 if fuse_g else hi0) + 1, ax_al)
        TZ = az_al
        NZ = _au(TZ + R + 1, az_al)
        TB = 0
        NB_ = _au(R + 1, 8)
    else:                               # interpret mode: exact halos
        TX = hk if fuse_g else hk + lo0
        NX = TX + R + hk + (0 if fuse_g else hi0) + 1
        TZ = 1
        NZ = TZ + R + 1
        TB = 0
        NB_ = R + 1
    KR = R + 1 + 2 * hk                # Kx rows [a0-hk, a0+R+1+hk)
    # _virtualize assumes only the FIRST and LAST bands' clamped windows
    # shift: interior windows [a0-T, a0-T+N) must lie inside [0, H), i.e.
    # T <= R and N-R-T <= R.  Violations (tiny bands vs wide halos) would
    # silently mis-index every interior band.
    for (T_, N_) in ((TX, NX), (TZ, NZ), (TB, NB_)):
        assert T_ <= R and N_ - R - T_ <= R, \
            (f"band {R} smaller than halo window (T={T_}, N={N_}); "
             f"use a larger band or the generic path")
    dtype = cdt                        # kernel-body arithmetic dtype

    def _revrows(a, n):
        """First n rows of ``a`` in reverse order (Mosaic has no `rev`
        lowering; n is small — static concat of single rows)."""
        return jnp.concatenate([a[j:j + 1] for j in range(n - 1, -1, -1)],
                               axis=0)

    # ---- column operator (pad -> valid corr along axis 1) as band+edge ----
    # The axis-1 stencil stage is a structured WxW matrix F = B + E: B the
    # banded zero-pad correlation (diagonal d = t-lo1, coefficient k1[t]),
    # E the boundary-pad coupling (symmetric reflections land on <= lo1+hi1
    # edge source columns).  B is applied with pltpu.roll + wrap masking
    # (Mosaic lowers neither `rev` nor lane-unaligned concatenate, so the
    # reflect-pad-concat formulation is out); E as per-source-column
    # broadcasts against host-precomputed coefficient rows.  The adjoint
    # stage is exactly F^T = B^T + E^T.
    edge_fwd = {}                      # src col -> (W,) coefficient row
    if sym_k and (lo1 or hi1):
        for cc in list(range(lo1)) + list(range(W - hi1, W)):
            for t in range(L1):
                src = cc + t - lo1
                if 0 <= src < W:
                    continue
                m = -1 - src if src < 0 else 2 * W - 1 - src
                edge_fwd.setdefault(m, np.zeros(W, np.float32))[cc] += ka1[t]
    edge_ms = sorted(edge_fwd)
    n_edge = len(edge_ms)
    if n_edge:
        E_rows = np.stack([edge_fwd[m] for m in edge_ms])          # (n, W)
        O_rows = np.zeros((n_edge, W), np.float32)
        for j, m in enumerate(edge_ms):
            O_rows[j, m] = 1.0
    else:
        E_rows = O_rows = None

    def _shift_cols(a, d):
        """out[:, c] = a[:, c+d], zeros shifted in (static d)."""
        from jax.experimental.pallas import tpu as _pltpu
        if d == 0:
            return a
        Wa = a.shape[1]
        rolled = _pltpu.roll(a, (-d) % Wa, 1)   # pltpu.roll wants shift >= 0
        ids = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
        if d > 0:
            return jax.lax.select(ids >= Wa - d, jnp.zeros_like(a), rolled)
        return jax.lax.select(ids < -d, jnp.zeros_like(a), rolled)

    def _col_fwd(a, E, O):
        """Axis-1 stencil stage: pad(mode) -> valid correlation.  ``E``/``O``
        are the (n_edge, W) coefficient/onehot rows, passed as kernel inputs
        (pallas kernels cannot capture array constants)."""
        out = None
        for t in range(L1):
            term = float(ka1[t]) * _shift_cols(a, t - lo1)
            out = term if out is None else out + term
        for j, m in enumerate(edge_ms):
            out = out + a[:, m:m + 1] * E[j:j + 1, :]
        return out

    def _col_adj(a, E, O):
        """Transpose of :func:`_col_fwd` (full corr w/ flipped taps + pad
        fold-back, collapsed to B^T + E^T)."""
        out = None
        for t in range(L1):
            term = float(ka1[t]) * _shift_cols(a, lo1 - t)
            out = term if out is None else out + term
        for j in range(n_edge):
            contrib = jnp.sum(a * E[j:j + 1, :], axis=1, keepdims=True)
            out = out + contrib * O[j:j + 1, :]
        return out

    def _sel_band(pred, a, b):
        """a where pred (traced scalar bool) else b, as a vector select."""
        return jax.lax.select(jnp.broadcast_to(pred, a.shape), a, b)

    def _virtualize(buf, N, T, i, reflect):
        """Re-index a clamp-DMA'd band so local j == virtual row a0-T+j.

        Interior bands are untouched (their window was in range).  First
        band: window was [0, N); wanted [-T, N-T) -> top T rows become the
        boundary extension.  Last band: window was [H-N, H); wanted
        [a0-T, a0-T+N) with a0 = H-R -> shift by B = N-R-T and fill the
        bottom B rows.  Fill = symmetric reflection or zeros (constant) —
        zeros also stand in where the value is provably unused (see call
        sites), since select() never propagates the unselected branch.
        """
        B = N - R - T

        out = buf
        # Mosaic cannot legalize the scalar-predicate array select that
        # lax.cond lowers to inside kernels, so both fixes are computed for
        # every band (cheap VMEM shuffles) and chosen by broadcast masks.
        if T:
            top = _revrows(buf, T) if reflect else \
                jnp.zeros((T, W), buf.dtype)
            first = jnp.concatenate([top, buf[:N - T]], axis=0)
            out = _sel_band(i == 0, first, out)
        if B:
            bot = _revrows(buf[N - B:], B) if reflect else \
                jnp.zeros((B, W), buf.dtype)
            last = jnp.concatenate([buf[B:], bot], axis=0)
            out = _sel_band(i == nb - 1, last, out)
        return out

    def _corr_rows(a, taps, flip, out_rows, off):
        """axis-0 valid correlation at static offset."""
        L = taps.shape[0]
        out = None
        for t in range(L):
            coef = float(taps[L - 1 - t] if flip else taps[t])
            term = coef * jax.lax.slice_in_dim(a, off + t, off + t + out_rows,
                                               axis=0)
            out = term if out is None else out + term
        return out

    def _prologue(i, x_hbm, z_hbm, b_hbm, xs, zs, bs, sems, x_reflect):
        """Double-buffered input DMA + boundary virtualization.

        Scratch persists across sequential TPU grid steps: step i waits on
        the copies step i-1 prefetched into slot i%2 and starts band i+1's
        copies into the other slot, hiding input-DMA latency behind the
        band compute.  Clamped starts; row fixups in _virtualize."""
        def _copies(band, slot):
            base = band * R

            def _start(T, N, al):
                v = jax.lax.clamp(jnp.int32(0), base - jnp.int32(T),
                                  jnp.int32(H - N))
                # every reachable value is tile-aligned (R, H, T, N all
                # are), but Mosaic cannot prove it through the clamp — hint
                return pl.multiple_of(v, al) if aligned else v

            return (
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(_start(TX, NX, ax_al), NX), :],
                    xs.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(
                    z_hbm.at[:, pl.ds(_start(TZ, NZ, az_al), NZ), :],
                    zs.at[slot], sems.at[slot, 1]),
                pltpu.make_async_copy(
                    b_hbm.at[pl.ds(_start(TB, NB_, 8), NB_), :],
                    bs.at[slot], sems.at[slot, 2]),
            )

        slot = jax.lax.rem(i, jnp.int32(2))
        nxt = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

        @pl.when(i == 0)
        def _():
            for cp in _copies(i, slot):
                cp.start()

        @pl.when(i + 1 < nb)
        def _():
            for cp in _copies(i + 1, nxt):
                cp.start()

        for cp in _copies(i, slot):
            cp.wait()

        # bf16 state is cast to the compute dtype right after the boundary
        # virtualization — all downstream arithmetic runs at full precision
        xb = _virtualize(xs[slot], NX, TX, i, x_reflect).astype(dtype)
        z0b = _virtualize(zs[slot, 0], NZ, TZ, i, False).astype(dtype)
        z1b = _virtualize(zs[slot, 1], NZ, TZ, i, False).astype(dtype)
        bb = _virtualize(bs[slot], NB_, TB, i, False).astype(dtype)
        # (z/b fills are zeros: the affected rows are the gradient edge rows
        # handled by select, or the virtual row a0+R == H whose values only
        # reach u0's overridden last row.)
        return xb, z0b, z1b, bb

    def kernel(x_hbm, z_hbm, b_hbm, e_ref, o_ref, xo_ref, zo_ref,
               xs, zs, bs, sems):
        i = pl.program_id(0)
        a0 = i * R
        xb, z0b, z1b, bb = _prologue(i, x_hbm, z_hbm, b_hbm, xs, zs, bs,
                                     sems, sym_k)

        # ---- K x: rows [a0-hk, a0+R+1+hk) ----------------------------------
        t0 = _corr_rows(xb, ka0, False, KR, TX - hk - lo0)
        E = e_ref[...]
        O = o_ref[...]
        Kx = _col_fwd(t0, E, O)

        # zero virtual out-of-image Kx rows (the adjoint's full-corr input
        # is only supported on [0, H))
        if hk:
            rzero_top = jnp.concatenate(
                [jnp.zeros((hk, W), dtype), Kx[hk:]], axis=0)
            Kx = _sel_band(i == 0, rzero_top, Kx)
            rzero_bot = jnp.concatenate(
                [Kx[:R + hk], jnp.zeros((hk + 1, W), dtype)], axis=0)
            Kx = _sel_band(i == nb - 1, rzero_bot, Kx)

        # ---- K^T Kx ---------------------------------------------------------
        G1 = _col_adj(Kx, E, O)

        # axis 0: out[r] = sum_s k0[s] * G1[r + lo0 - s]; local(v) = v-a0+hk
        # -> slice offsets hk+lo0-s for s in [0, L0), out rows R+1
        KtK = None
        for s in range(L0):
            term = float(ka0[s]) * jax.lax.slice_in_dim(
                G1, hk + lo0 - s, hk + lo0 - s + R + 1, axis=0)
            KtK = term if KtK is None else KtK + term
        # row fold-backs (symmetric only; first/last bands)
        if sym_k and lo0:
            def fold_top(kt):
                adds = []
                for j in range(lo0):     # ghost virtual row -1-j -> row j
                    acc = None
                    for s in range(L0):
                        gi = hk - 1 - j + lo0 - s
                        term = float(ka0[s]) * G1[gi:gi + 1]
                        acc = term if acc is None else acc + term
                    adds.append(acc)
                add = jnp.concatenate(adds, axis=0)
                return kt + jnp.concatenate(
                    [add, jnp.zeros((R + 1 - lo0, W), dtype)], axis=0)
            KtK = _sel_band(i == 0, fold_top(KtK), KtK)
        if sym_k and hi0:
            def fold_bot(kt):
                adds = []
                for j in range(hi0 - 1, -1, -1):
                    # ghost row H+j folds onto image row H-1-j (local R-1-j)
                    acc = None
                    for s in range(L0):
                        gi = R + hk + j + lo0 - s
                        term = float(ka0[s]) * G1[gi:gi + 1]
                        acc = term if acc is None else acc + term
                    adds.append(acc)
                add = jnp.concatenate(adds, axis=0)   # rows R-hi0 .. R-1
                return kt + jnp.concatenate(
                    [jnp.zeros((R - hi0, W), dtype), add,
                     jnp.zeros((1, W), dtype)], axis=0)
            KtK = _sel_band(i == nb - 1, fold_bot(KtK), KtK)

        _epilogue(i, a0, KtK, xb, z0b, z1b, bb, xo_ref, zo_ref)

    def kernel_g(x_hbm, z_hbm, b_hbm, s1_ref, m1_ref, rowa_ref,
                 xo_ref, zo_ref, xs, zs, bs, sems):
        """Fused-normal-op variant: K^T K as ONE separable matmul row stage
        + (2L-1)-tap column stage (see :func:`_normal_op_data` /
        :func:`_row_stage_mats`).  x is zero-virtualized — all boundary
        semantics live in the row matrices / M1 correction.  The row stage
        runs on the MXU, reading the x window ONCE (the exposed kernel cost
        is VMEM-port traffic contending with the input DMA — probe_overlap)."""
        i = pl.program_id(0)
        a0 = i * R
        xb, z0b, z1b, bb = _prologue(i, x_hbm, z_hbm, b_hbm, xs, zs, bs,
                                     sems, False)

        # ---- row stage as ONE banded MXU matmul (out rows [a0, a0+R+1)):
        # interior/first/last matrices carry the G0 corner corrections
        A3 = rowa_ref[...]
        Asel = jax.lax.select(
            jnp.broadcast_to(i == 0, A3[1].shape), A3[1],
            jax.lax.select(jnp.broadcast_to(i == nb - 1, A3[2].shape),
                           A3[2], A3[0]))
        rowo = jnp.dot(Asel, xb, preferred_element_type=jnp.float32
                       ).astype(xb.dtype)

        # ---- column stage on the row-stage output ---------------------------
        KtK = None
        for d in range(-h1, h1 + 1):
            term = float(g1t[d + h1]) * _roll_cols(rowo, d)
            KtK = term if KtK is None else KtK + term
        corr = jnp.dot(jnp.dot(rowo, s1_ref[...],
                               preferred_element_type=jnp.float32),
                       m1_ref[...], preferred_element_type=jnp.float32)
        KtK = KtK + corr.astype(KtK.dtype)

        _epilogue(i, a0, KtK, xb, z0b, z1b, bb, xo_ref, zo_ref)

    def _roll_cols(a, d):
        """out[:, c] = a[:, (c+d) mod W] — UNMASKED lane roll; the wrap
        garbage it admits in the first/last |d| columns is subtracted back
        exactly by the M1 correction matmul."""
        if d == 0:
            return a
        return pltpu.roll(a, (-d) % a.shape[1], 1)

    def _epilogue(i, a0, KtK, xb, z0b, z1b, bb, xo_ref, zo_ref):
        # ---- gf, D^T z, xp, v ----------------------------------------------
        gf = cst * KtK + bb[TB:TB + R + 1]        # rows [a0, a0+R+1)

        prev0 = z0b[TZ - 1:TZ + R]                # z0 rows [a0-1, a0+R)
        cur0 = z0b[TZ:TZ + R + 1]                 # z0 rows [a0, a0+R+1)
        dt0 = prev0 - cur0
        rows1 = a0 + jax.lax.broadcasted_iota(jnp.int32, (R + 1, W), 0)
        dt0 = jax.lax.select(rows1 == 0, -cur0, dt0)
        if sym_d:
            dt0 = jax.lax.select(rows1 == H - 1, prev0, dt0)

        z1w = z1b[TZ:TZ + R + 1]                  # z1 rows [a0, a0+R+1)
        prev1 = _shift_cols(z1w, -1)              # col 0 zero => -z1w there
        dt1 = prev1 - z1w
        if sym_d:
            cols1 = jax.lax.broadcasted_iota(jnp.int32, (R + 1, W), 1)
            dt1 = jax.lax.select(cols1 == W - 1, prev1, dt1)

        xw = xb[TX:TX + R + 1]                    # x rows [a0, a0+R+1)
        xp_ = xw - tau * (gf + dt0 + dt1)
        v = 2.0 * xp_ - xw

        # ---- u = D v, prox, momentum, outputs -------------------------------
        u0 = v[1:R + 1] - v[:R]
        rowsR = a0 + jax.lax.broadcasted_iota(jnp.int32, (R, W), 0)
        if sym_d:
            u0 = jax.lax.select(rowsR == H - 1, jnp.zeros_like(u0), u0)
        else:
            u0 = jax.lax.select(rowsR == H - 1, -v[:R], u0)
        vR = v[:R]
        nxt1 = _shift_cols(vR, 1)                 # last col zero => -vR there
        u1 = nxt1 - vR
        if sym_d:                                 # symmetric: last diff is 0
            colsR = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
            u1 = jax.lax.select(colsR == W - 1, jnp.zeros_like(u1), u1)

        z0w = z0b[TZ:TZ + R]                      # z0 rows [a0, a0+R)
        z1wR = z1w[:R]
        zt0 = z0w + sigma * u0
        zt1 = z1wR + sigma * u1
        zp0, zp1 = _l21_fenchel(zt0, zt1, lam)

        # state quantizes to its storage dtype exactly once, on store
        if rho == 1.0:
            xo_ref[...] = xp_[:R].astype(xdt)
            zo_ref[0] = zp0.astype(zdt)
            zo_ref[1] = zp1.astype(zdt)
        else:
            xo_ref[...] = (xw[:R] + rho * (xp_[:R] - xw[:R])).astype(xdt)
            zo_ref[0] = (z0w + rho * (zp0 - z0w)).astype(zdt)
            zo_ref[1] = (z1wR + rho * (zp1 - z1wR)).astype(zdt)

    if fuse_g:
        rowA3 = np.stack(_row_stage_mats(
            g0t, D0t_np, D0b_np, r0t, r0b, hk, R, R + 1, NX, TX, 0))
        const_np = (S1_np, M1_np, rowA3)
        const_specs = [
            pl.BlockSpec(a.shape, lambda i, _n=a.ndim: (0,) * _n,
                         memory_space=pltpu.VMEM)
            for a in const_np
        ]
        body = kernel_g
    else:
        n_e = max(n_edge, 1)           # zero-size blocks are not allowed
        E_np = E_rows if n_edge else np.zeros((1, W), np.float32)
        O_np = O_rows if n_edge else np.zeros((1, W), np.float32)
        const_np = (E_np, O_np)
        const_specs = [
            pl.BlockSpec((n_e, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_e, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        body = kernel
    inner = pl.pallas_call(
        body,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3 + const_specs,
        out_specs=[
            pl.BlockSpec((R, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, R, W), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((H, W), xdt),
                   jax.ShapeDtypeStruct((2, H, W), zdt)],
        scratch_shapes=[
            pltpu.VMEM((2, NX, W), xdt),
            pltpu.VMEM((2, 2, NZ, W), zdt),
            pltpu.VMEM((2, NB_, W), bdt),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=114 * 1024 * 1024),
        interpret=interpret,
    )

    def fn(x, z, b):
        # host arrays converted per call: a device constant created inside
        # one trace must not be closed over by later traces (the builder is
        # lru-cached across jit scopes).  b rides at compute precision (it
        # is a trace constant inside solver loops — the cast folds away).
        return inner(x, z, b.astype(bdt),
                     *(jnp.asarray(a) for a in const_np))

    return fn


# ------------------------------------- temporal blocking: 2 iters / pass ----

def tv_step2_pallas(x, z, b, *, k0, k1, c0, c1, cst, lam, tau, sigma,
                    rho, mode_k="symmetric", mode_d="symmetric",
                    band=None, interpret=False):
    """TWO exact Condat-Vu iterations per band pass (temporal blocking).

    The single-iteration kernel is DMA-floor bound: ~7.6 frame-traffics per
    iteration at 4K, copy-clone floor 0.67 ms vs 0.89 ms full
    (tools/fused_tv_probe.py).  Running two iterations while the band is
    VMEM-resident amortizes every state read/write over two iterations —
    ~4.0 frame-traffics *per iteration* — at the price of wider halos
    (iteration 1 is recomputed on a ±(hk+1)-row apron so iteration 2's
    stencils see exact neighbours; the aprons of adjacent bands recompute
    the same rows, which costs VPU FLOPs, not HBM).  Numerics are the
    single kernel's applied twice: iteration-1 state is masked to zero
    outside the image (the zero-virtualized contract of the fused normal
    op) and round-tripped through the storage dtype, exactly as two
    separate passes would.  Returns None-equivalent fallbacks are the
    caller's job (see :func:`match_fused_tv2`)."""
    return tv_stepk_pallas(x, z, b, k0=k0, k1=k1, c0=c0, c1=c1, cst=cst,
                           lam=lam, tau=tau, sigma=sigma, rho=rho,
                           mode_k=mode_k, mode_d=mode_d, band=band,
                           interpret=interpret, n_steps=2)


def tv_stepk_pallas(x, z, b, *, k0, k1, c0, c1, cst, lam, tau, sigma,
                    rho, mode_k="symmetric", mode_d="symmetric",
                    band=None, interpret=False, n_steps=2):
    """``n_steps`` exact Condat-Vu iterations per band pass (general
    temporal blocking; the 2-step docstring's apron construction telescopes
    — level j runs on a ±(n_steps-j)*hk apron, feeding level j+1)."""
    import os
    col_mm = os.environ.get("PYXU_TPU_FUSED_CMM", "0") == "1"
    fn = _build_tv2_pallas(
        x.shape, str(x.dtype), str(z.dtype), tuple(float(v) for v in k0),
        tuple(float(v) for v in k1), int(c0), int(c1), float(cst),
        float(lam), float(tau), float(sigma), float(rho), mode_k, mode_d,
        band, interpret, int(n_steps), col_mm)
    if fn is None:
        raise ValueError("band/halo configuration not eligible for the "
                         f"{n_steps}-iteration kernel")
    return fn(x, z, b)


@functools.lru_cache(maxsize=64)
def _build_tv2_pallas(shape, dtype_str, z_dtype_str, k0, k1, c0, c1, cst,
                      lam, tau, sigma, rho, mode_k, mode_d, band, interpret,
                      n_steps=2, col_mm=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = shape
    L0, L1 = len(k0), len(k1)
    hk, h1 = L0 - 1, L1 - 1
    sym_d = mode_d == "symmetric"
    assert mode_k in ("symmetric", "constant")
    assert mode_d in ("symmetric", "constant")

    xdt = jnp.dtype(dtype_str)
    zdt = jnp.dtype(z_dtype_str)
    bf16 = jnp.dtype(jnp.bfloat16)
    cdt = jnp.dtype(jnp.float32) if bf16 in (xdt, zdt) \
        else jnp.promote_types(xdt, zdt)
    bdt = cdt
    ax_al = 16 if xdt == bf16 else 8
    az_al = 16 if zdt == bf16 else 8

    g0t, D0t_np, D0b_np, r0t, r0b, g1t, S1_np, M1_np = \
        _normal_op_data(H, W, k0, k1, c0, c1, mode_k)
    c0t = D0t_np.shape[1]
    c0b = D0b_np.shape[1]

    R = band or _band_size(H, align=max(ax_al, az_al))
    nb = H // R
    if H % R or nb < 2:
        return None

    def _au(v, a):
        return -(-v // a) * a

    aligned = (R % max(ax_al, az_al) == 0) and (H % max(ax_al, az_al) == 0)
    if not (aligned or interpret):
        return None
    K = int(n_steps)
    if K < 2:
        return None
    # Level-1 aprons (the K-step telescope: level j outputs xp on a
    # +-(K-j)*hk apron, zp on +-((K-j-1)*hk + 1)):
    #   x window:  [a0 - K*hk,           a0 + R + K*hk + 1)
    #   z window:  [a0 - (K-1)*hk - 1,   a0 + R + (K-1)*hk + 1)
    #   b window:  [a0 - (K-1)*hk,       a0 + R + (K-1)*hk + 1)
    if aligned:
        TX = _au(K * hk, ax_al)
        NX = _au(TX + R + K * hk + 1, ax_al)
        TZ = _au((K - 1) * hk + 1, az_al)
        NZ = _au(TZ + R + (K - 1) * hk + 1, az_al)
        TB = _au((K - 1) * hk, 8)
        NB_ = _au(TB + R + (K - 1) * hk + 1, 8)
    else:
        TX, NX = K * hk, 2 * K * hk + R + 1
        TZ, NZ = (K - 1) * hk + 1, R + 2 * (K - 1) * hk + 2
        TB, NB_ = (K - 1) * hk, R + 2 * (K - 1) * hk + 1
    # interior windows must not clamp; windows must fit the IMAGE (a
    # window larger than H makes the clamped DMA start negative); the
    # corrections must fit the band; level-1's apron must stay inside
    if not all(T <= R and N - R - T <= R and N <= H
               for T, N in ((TX, NX), (TZ, NZ), (TB, NB_))):
        return None
    if max(r0t, r0b, c0t, c0b) > R or R <= K * hk + 2:
        return None

    dtype = cdt

    def _sel_band(pred, a, b):
        return jax.lax.select(jnp.broadcast_to(pred, a.shape), a, b)

    def _virtualize(buf, N, T, i):
        """Zero-fill re-indexing of a clamped window (fused-G contract:
        out-of-image rows are zero; boundary physics lives in the
        correction blocks / edge selects)."""
        B = N - R - T
        out = buf
        if T:
            first = jnp.concatenate(
                [jnp.zeros((T, W), buf.dtype), buf[:N - T]], axis=0)
            out = _sel_band(i == 0, first, out)
        if B:
            last = jnp.concatenate(
                [buf[B:], jnp.zeros((B, W), buf.dtype)], axis=0)
            out = _sel_band(i == nb - 1, last, out)
        return out

    def _roll_cols(a, d):
        if d == 0:
            return a
        return pltpu.roll(a, (-d) % a.shape[1], 1)

    def _shift_cols(a, d):
        if d == 0:
            return a
        Wa = a.shape[1]
        rolled = pltpu.roll(a, (-d) % Wa, 1)
        ids = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
        if d > 0:
            return jax.lax.select(ids >= Wa - d, jnp.zeros_like(a), rolled)
        return jax.lax.select(ids < -d, jnp.zeros_like(a), rolled)

    def kernel(x_hbm, z_hbm, b_hbm, s1_ref, m1_ref, *refs):
        rowa_refs = refs[:K]
        if col_mm:
            b0_ref, bm1_ref, bp1_ref = refs[K:K + 3]
            xo_ref, zo_ref, xs, zs, bs, sems = refs[K + 3:]
        else:
            xo_ref, zo_ref, xs, zs, bs, sems = refs[K:]
        i = pl.program_id(0)
        a0 = i * R

        def _copies(band, slot):
            base = band * R

            def _start(T, N, al):
                v = jax.lax.clamp(jnp.int32(0), base - jnp.int32(T),
                                  jnp.int32(H - N))
                return pl.multiple_of(v, al) if aligned else v

            return (
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(_start(TX, NX, ax_al), NX), :],
                    xs.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(
                    z_hbm.at[:, pl.ds(_start(TZ, NZ, az_al), NZ), :],
                    zs.at[slot], sems.at[slot, 1]),
                pltpu.make_async_copy(
                    b_hbm.at[pl.ds(_start(TB, NB_, 8), NB_), :],
                    bs.at[slot], sems.at[slot, 2]),
            )

        slot = jax.lax.rem(i, jnp.int32(2))
        nxt = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

        @pl.when(i == 0)
        def _():
            for cp in _copies(i, slot):
                cp.start()

        @pl.when(i + 1 < nb)
        def _():
            for cp in _copies(i + 1, nxt):
                cp.start()

        for cp in _copies(i, slot):
            cp.wait()

        xb = _virtualize(xs[slot], NX, TX, i).astype(dtype)
        z0b = _virtualize(zs[slot, 0], NZ, TZ, i).astype(dtype)
        z1b = _virtualize(zs[slot, 1], NZ, TZ, i).astype(dtype)
        bb = _virtualize(bs[slot], NB_, TB, i).astype(dtype)

        S1 = s1_ref[...]
        M1 = m1_ref[...]

        def ktk(xarr, A3):
            """K^T K: banded MXU-matmul row stage (corner corrections
            folded into the first/last-band matrices — one VMEM read of
            the x window instead of 2L-1 sliced passes; probe_overlap
            showed VMEM-port traffic, not FLOPs, is the exposed cost) +
            rolled column stage with the M1 edge-correction matmul."""
            Asel = jax.lax.select(
                jnp.broadcast_to(i == 0, A3[1].shape), A3[1],
                jax.lax.select(jnp.broadcast_to(i == nb - 1, A3[2].shape),
                               A3[2], A3[0]))
            rowo = jnp.dot(Asel, xarr, preferred_element_type=jnp.float32
                           ).astype(xarr.dtype)
            if col_mm:
                n = rowo.shape[0]
                nt = W // 128
                aL = pltpu.roll(rowo, 128, 1)
                aR = pltpu.roll(rowo, W - 128, 1)

                def mm(x, Bref):
                    x3 = x.reshape(n, nt, 128)
                    y3 = jax.lax.dot_general(
                        x3, Bref[...], (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    return y3.reshape(n, W)

                col = (mm(aL, bm1_ref) + mm(rowo, b0_ref)
                       + mm(aR, bp1_ref)).astype(rowo.dtype)
            else:
                col = None
                for d in range(-h1, h1 + 1):
                    term = float(g1t[d + h1]) * _roll_cols(rowo, d)
                    col = term if col is None else col + term
            corr = jnp.dot(jnp.dot(rowo, S1,
                                   preferred_element_type=jnp.float32),
                           M1, preferred_element_type=jnp.float32)
            return col + corr.astype(col.dtype)

        def half_iter(xarr, xT, A3, z0a, z1a, zT, oT, n_out,
                      oz=None, nz=None):
            """One full Condat-Vu iteration: xp rows virtual
            [a0-oT, a0-oT+n_out), zp rows [a0-oz, a0-oz+nz) (defaults:
            oz=oT, nz=n_out-1 — the full primal window minus its last
            row).  A narrower (oz, nz) skips dual/prox work on apron rows
            the next consumer never reads (iteration 1 only needs zp on
            [a0-1, a0+R+1))."""
            oz = oT if oz is None else oz
            nz = n_out - 1 if nz is None else nz
            gf = cst * ktk(xarr, A3) \
                + bb[TB - oT:TB - oT + n_out]
            z0s = zT - oT
            prev0 = z0a[z0s - 1:z0s - 1 + n_out]
            cur0 = z0a[z0s:z0s + n_out]
            dt0 = prev0 - cur0
            rows = (a0 - oT) + jax.lax.broadcasted_iota(
                jnp.int32, (n_out, W), 0)
            dt0 = jax.lax.select(rows == 0, -cur0, dt0)
            if sym_d:
                dt0 = jax.lax.select(rows == H - 1, prev0, dt0)
            z1w = z1a[z0s:z0s + n_out]
            prev1 = _shift_cols(z1w, -1)
            dt1 = prev1 - z1w
            if sym_d:
                cols = jax.lax.broadcasted_iota(jnp.int32, (n_out, W), 1)
                dt1 = jax.lax.select(cols == W - 1, prev1, dt1)
            xw = xarr[xT - oT:xT - oT + n_out]
            xp_ = xw - tau * (gf + dt0 + dt1)
            v = 2.0 * xp_ - xw
            vo = oT - oz               # v local index of virtual a0-oz
            u0 = v[vo + 1:vo + 1 + nz] - v[vo:vo + nz]
            rowsn = (a0 - oz) + jax.lax.broadcasted_iota(
                jnp.int32, (nz, W), 0)
            vR = v[vo:vo + nz]
            if sym_d:
                u0 = jax.lax.select(rowsn == H - 1, jnp.zeros_like(u0), u0)
            else:
                u0 = jax.lax.select(rowsn == H - 1, -vR, u0)
            u1 = _shift_cols(vR, 1) - vR
            if sym_d:
                colsn = jax.lax.broadcasted_iota(jnp.int32, (nz, W), 1)
                u1 = jax.lax.select(colsn == W - 1, jnp.zeros_like(u1), u1)
            z0w = z0a[zT - oz:zT - oz + nz]
            z1wn = z1a[zT - oz:zT - oz + nz]
            zt0 = z0w + sigma * u0
            zt1 = z1wn + sigma * u1
            zp0, zp1 = _l21_fenchel(zt0, zt1, lam)
            if rho != 1.0:
                xpo = xw + rho * (xp_ - xw)
                zp0 = z0w + rho * (zp0 - z0w)
                zp1 = z1wn + rho * (zp1 - z1wn)
            else:
                xpo = xp_
            return xpo, zp0, zp1

        # ---- K telescoping levels ------------------------------------------
        # Level j (1-based) produces xp on a +-(K-j)*hk apron and zp on a
        # +-((K-j-1)*hk + 1) apron — exactly what level j+1's stencils
        # consume.  No out-of-image masking: each level's first/last-band
        # row matrices carry zeroed columns for virtual rows outside
        # [0, H) (see _row_stage_mats) and the dual-edge selects override
        # the rest.  State round-trips through the storage dtype between
        # levels, exactly as K separate kernel passes would.
        xp, zp0, zp1 = xb, z0b, z1b
        xT_cur, zT_cur = TX, TZ
        for j in range(1, K + 1):
            o = (K - j) * hk
            last = j == K
            oz = 0 if last else (K - j - 1) * hk + 1
            nz = R if last else R + 2 * oz
            xp, zp0, zp1 = half_iter(xp, xT_cur, rowa_refs[j - 1][...],
                                     zp0, zp1, zT_cur, o, R + 2 * o + 1,
                                     oz=oz, nz=nz)
            if not last:
                xp = xp.astype(xdt).astype(dtype)
                zp0 = zp0.astype(zdt).astype(dtype)
                zp1 = zp1.astype(zdt).astype(dtype)
                xT_cur, zT_cur = o, oz     # produced aprons = next offsets

        xo_ref[...] = xp[:R].astype(xdt)
        zo_ref[0] = zp0.astype(zdt)
        zo_ref[1] = zp1.astype(zdt)

    rowAs = []
    for j in range(1, K + 1):
        o = (K - j) * hk
        n_out = R + 2 * o + 1
        if j == 1:
            n_in, xT = NX, TX
        else:
            n_in = R + 2 * (o + hk) + 1    # previous level's n_out
            xT = o + hk
        rowAs.append(np.stack(_row_stage_mats(
            g0t, D0t_np, D0b_np, r0t, r0b, hk, R, n_out, n_in, xT, o)))
    const_np = (S1_np, M1_np, *rowAs)
    if col_mm:
        if W % 128:
            return None
        const_np = const_np + _col_block_mats(g1t, h1)
    const_specs = [
        pl.BlockSpec(a.shape, lambda i, _n=a.ndim: (0,) * _n,
                     memory_space=pltpu.VMEM)
        for a in const_np
    ]
    inner = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3 + const_specs,
        out_specs=[
            pl.BlockSpec((R, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, R, W), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((H, W), xdt),
                   jax.ShapeDtypeStruct((2, H, W), zdt)],
        scratch_shapes=[
            pltpu.VMEM((2, NX, W), xdt),
            pltpu.VMEM((2, 2, NZ, W), zdt),
            pltpu.VMEM((2, NB_, W), bdt),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=114 * 1024 * 1024),
        interpret=interpret,
    )

    def fn(x, z, b):
        return inner(x, z, b.astype(bdt),
                     *(jnp.asarray(a) for a in const_np))

    return fn


# ------------------------------------------------------------ pattern match --

def _unwrap_scale_cast(op):
    """Strip Cast/Scale wrappers, returning (base_op, accumulated_scale)."""
    from pyxu_tpu.abc.arithmetic import CastMixin, ScaleMixin
    cst = 1.0
    while True:
        if isinstance(op, ScaleMixin):
            cst *= op._cst
            op = op._op
        elif isinstance(op, CastMixin):
            op = op._op
        else:
            return op, cst


def _stencil_taps_2d(st):
    """(k0, c0, k1, c1, mode) of a 2-D separable Stencil, or None."""
    from pyxu_tpu.operator.linop.stencil import Stencil
    if not isinstance(st, Stencil) or st.dim_rank != 2:
        return None
    if st._mode not in ("symmetric", "constant"):
        return None
    ks = st._kernels_arr
    if len(ks) != 2:
        return None
    k0, k1 = (np.asarray(jax.device_get(k)) for k in ks)
    if not (k0.shape[1] == 1 and k1.shape[0] == 1):
        return None
    c0 = st._centers[0][0]
    c1 = st._centers[1][1]
    return (tuple(float(v) for v in k0.ravel()), int(c0),
            tuple(float(v) for v in k1.ravel()), int(c1), st._mode)


def _gradient_mode_2d(K):
    """Boundary mode of a 2-D first-order forward-difference Gradient, or
    None when K is not of that exact form."""
    from pyxu_tpu.operator.linop.diff import _StackedDiff
    from pyxu_tpu.operator.linop.stencil import Stencil
    if not isinstance(K, _StackedDiff) or len(K._ops) != 2:
        return None
    modes = []
    for ax, op in enumerate(K._ops):
        if not isinstance(op, Stencil) or op.dim_rank != 2:
            return None
        want = [1, 1]
        want[ax] = 2
        found = False
        for k, ctr in zip(op._kernels_arr, op._centers):
            k = np.asarray(jax.device_get(k))
            if ctr != (0, 0):
                return None
            if k.shape == (1, 1):          # identity factor on the other axis
                if not np.allclose(k.ravel(), [1.0]):
                    return None
                continue
            if found or k.shape != tuple(want) or \
                    not np.allclose(k.ravel(), [-1.0, 1.0]):
                return None
            found = True
        if not found:
            return None
        if op._mode not in ("symmetric", "constant"):
            return None
        modes.append(op._mode)
    if modes[0] != modes[1]:
        return None
    return modes[0]



@functools.partial(jax.jit, static_argnames=("shape",))
def _lin_grad_at_zero(c, shape):
    return c.grad(jnp.zeros(shape, jnp.float32))


def _grad_at_zero(c, shape):
    """b = c.grad(0) through a MODULE-LEVEL jit: operators are pytrees, so
    re-fits with the same problem structure hit the jit cache instead of
    recompiling a fresh lambda per fit (each relay compile costs seconds)."""
    return _lin_grad_at_zero(c, shape)


def match_fused_tv(f, g, h, K, *, tau, sigma, rho):
    """Return a fused ``(x, z) -> (x_new, z_new)`` step for the TV family,
    or None when the (f, g, h, K) spec / backend does not qualify.

    Controlled by ``PYXU_TPU_FUSED``: ``auto`` (default — Pallas on TPU
    backends, off elsewhere), ``0`` (off), ``1`` (force Pallas; interpreted
    off-TPU — tests only), ``xla`` (full-frame fused jnp path, any backend).
    """
    import os

    from pyxu_tpu.abc.operator import QuadraticFunc, _GramOp
    from pyxu_tpu.operator.linop.base import NullFunc
    from pyxu_tpu.operator.func.norm import L21Norm

    flag = os.environ.get("PYXU_TPU_FUSED", "auto")
    if flag == "0":
        return None
    backend = jax.default_backend()
    if flag == "auto" and backend in ("cpu", "gpu"):
        return None

    if not (g is None or isinstance(g, NullFunc)):
        return None
    if h is None or K is None:
        return None
    if type(f) is not QuadraticFunc:
        return None
    Q, c, _ = f._quad_spec()
    Qb, cst = _unwrap_scale_cast(Q)
    if not (isinstance(Qb, _GramOp) and not Qb._cogram):
        return None
    taps = _stencil_taps_2d(Qb._op)
    if taps is None or cst <= 0:
        return None
    k0, c0, k1, c1, mode_k = taps

    hb, lam = _unwrap_scale_cast(h)
    if not (isinstance(hb, L21Norm) and lam > 0):
        return None
    if hb._l2_axis != (0,) or hb.dim_rank != 3 or hb.dim_shape[0] != 2:
        return None

    mode_d = _gradient_mode_2d(K)
    if mode_d is None:
        return None

    H, W = f.dim_shape if len(f.dim_shape) == 2 else (None, None)
    if H is None or hb.dim_shape[1:] != (H, W):
        return None
    R = _band_size(H)
    hk = len(k0) - 1
    TX = -(-(hk + c0) // 8) * 8
    NX = -(-(TX + R + hk + (len(k0) - 1 - c0) + 1) // 8) * 8
    BX = NX - R - TX
    if (R >= H or H % R or R % 8 or H % 8
            or TX > R or BX > R            # interior windows must not clamp
            or max(NX, R + 16) > H):
        return None

    b = _grad_at_zero(c, (H, W))
    kw = dict(k0=k0, k1=k1, c0=c0, c1=c1, cst=float(cst), lam=float(lam),
              tau=float(tau), sigma=float(sigma), rho=float(rho),
              mode_k=mode_k, mode_d=mode_d)

    if flag == "xla":
        def step(x, z):
            # bf16 state computes at f32 (mirrors the Pallas kernel's
            # storage-vs-compute split) and re-quantizes on return, keeping
            # the solver carry dtype-stable
            cdt = (jnp.float32 if jnp.bfloat16 in (x.dtype, z.dtype)
                   else jnp.promote_types(x.dtype, z.dtype))
            xn, z0n, z1n = tv_step_xla(
                x.astype(cdt), z[0].astype(cdt), z[1].astype(cdt),
                b.astype(cdt), jnp.asarray(np.asarray(k0, np.float32)),
                jnp.asarray(np.asarray(k1, np.float32)), c0, c1,
                cst=float(cst), lam=float(lam), tau=float(tau),
                sigma=float(sigma), rho=float(rho),
                mode_k=mode_k, mode_d=mode_d)
            return (xn.astype(x.dtype),
                    jnp.stack([z0n, z1n]).astype(z.dtype))
        return step

    interp = backend in ("cpu", "gpu")

    def step(x, z):
        return tv_step_pallas(x, z, b, interpret=interp, **kw)

    return step


def match_fused_tv2(f, g, h, K, *, tau, sigma, rho):
    """Return a temporal-blocking ``(x, z) -> 2 iterations`` step, or None.

    Matches exactly when :func:`match_fused_tv` matches (same problem
    family), the fused-normal-op path is on, and the wider 2-iteration
    halos fit the band.  Controlled by ``PYXU_TPU_FUSED2``: ``auto``
    (default — on for TPU backends), ``0`` (off), ``1`` (force; interpreted
    off-TPU — tests only)."""
    import os
    flag2 = os.environ.get("PYXU_TPU_FUSED2", "auto")
    if flag2 == "0":
        return None
    if os.environ.get("PYXU_TPU_FUSED_G", "1") == "0":
        return None    # double-step exists only in fused-normal-op form
    backend = jax.default_backend()
    if flag2 == "auto" and backend in ("cpu", "gpu"):
        return None
    single = match_fused_tv(f, g, h, K, tau=tau, sigma=sigma, rho=rho)
    if single is None or os.environ.get("PYXU_TPU_FUSED", "auto") == "xla":
        return None
    # re-derive the matched parameters (match_fused_tv validated them)
    Q, c, _ = f._quad_spec()
    Qb, cst = _unwrap_scale_cast(Q)
    k0, c0, k1, c1, mode_k = _stencil_taps_2d(Qb._op)
    hb, lam = _unwrap_scale_cast(h)
    mode_d = _gradient_mode_2d(K)
    H, W = f.dim_shape
    b = _grad_at_zero(c, (H, W))
    interp = backend in ("cpu", "gpu")
    kw = dict(k0=k0, k1=k1, c0=c0, c1=c1, cst=float(cst), lam=float(lam),
              tau=float(tau), sigma=float(sigma), rho=float(rho),
              mode_k=mode_k, mode_d=mode_d)
    # levels per pass: measured on v5e at 4K (BASELINE round 11); override
    # with PYXU_TPU_FUSED2_K for A/B runs
    n_steps = int(os.environ.get("PYXU_TPU_FUSED2_K", "3"))
    # eligibility precheck at f32 alignment; the builder re-checks per
    # dtype at trace time and the caller's wrapper falls back on failure
    probe = None
    while n_steps >= 2 and probe is None:
        probe = _build_tv2_pallas(
            (H, W), "float32", "float32", tuple(map(float, k0)),
            tuple(map(float, k1)), int(c0), int(c1), float(cst),
            float(lam), float(tau), float(sigma), float(rho), mode_k,
            mode_d, None, interp, n_steps)
        if probe is None:
            n_steps -= 1
    if probe is None:
        return None

    def step2(x, z):
        return tv_stepk_pallas(x, z, b, interpret=interp,
                               n_steps=n_steps, **kw)

    step2.n_steps = n_steps
    return step2
