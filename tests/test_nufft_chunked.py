"""Chunked (domain-partitioned) type-3 NUFFT (reference `_NUFFT3_chunked`,
src/pyxu/operator/linop/fft/nufft.py:2027-2213)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyxu_tpu.operator.linop.nufft import NUFFT, nudft3
from pyxu_tpu.utils.complex import view_as_complex, view_as_real

rng0 = np.random.default_rng(113)


def _rel(a, b):
    return np.linalg.norm(np.asarray(a).ravel() - np.asarray(b).ravel()) / \
        np.linalg.norm(np.asarray(b).ravel())


@pytest.mark.parametrize("d", [1, 2])
def test_chunked_matches_direct(d):
    M, K = 300, 200
    x = rng0.uniform(-3, 3, (M, d))
    z = rng0.uniform(-25, 25, (K, d))
    c = rng0.standard_normal(M) + 1j * rng0.standard_normal(M)
    budget = {1: 0.0005, 2: 0.02}[d]  # force splits at these tiny sizes
    op = NUFFT.type3(jnp.asarray(x), jnp.asarray(z), eps=1e-7,
                     chunked=True, fft_mem_mb=budget)
    st = op.stats()
    assert st["n_x_blocks"] * st["n_z_blocks"] > 1  # budget forces a split
    got = view_as_complex(op.apply(view_as_real(jnp.asarray(c))))
    want = nudft3(c, x, z)
    assert _rel(got, want) < 1e-4


def test_chunked_adjoint_dot():
    M, K = 120, 90
    x = rng0.uniform(-2, 2, (M, 2))
    z = rng0.uniform(-15, 15, (K, 2))
    op = NUFFT.type3(jnp.asarray(x), jnp.asarray(z), eps=1e-6,
                     chunked=True, fft_mem_mb=0.02)
    c = view_as_real(jnp.asarray(
        rng0.standard_normal(M) + 1j * rng0.standard_normal(M)))
    f = view_as_real(jnp.asarray(
        rng0.standard_normal(K) + 1j * rng0.standard_normal(K)))
    d1 = float(jnp.vdot(op.apply(c).ravel(), f.ravel()))
    d2 = float(jnp.vdot(c.ravel(), op.adjoint(f).ravel()))
    assert abs(d1 - d2) <= 1e-6 * max(abs(d1), 1.0)


def test_chunked_matches_monolithic():
    M, K = 150, 100
    x = rng0.uniform(-2, 2, (M, 1))
    z = rng0.uniform(-30, 30, (K, 1))
    c = jnp.asarray(rng0.standard_normal(M) + 1j * rng0.standard_normal(M))
    mono = NUFFT.type3(jnp.asarray(x), jnp.asarray(z), eps=1e-7)
    chnk = NUFFT.type3(jnp.asarray(x), jnp.asarray(z), eps=1e-7,
                       chunked=True, fft_mem_mb=0.01)
    a = mono.apply(view_as_real(c))
    b = chnk.apply(view_as_real(c))
    assert np.allclose(a, b, atol=1e-5)


def test_auto_chunk_allocate_workflow():
    # reference workflow (nufft.py:1124-1269): auto_chunk() -> allocate()
    M, K = 150, 100
    x = rng0.uniform(-2, 2, (M, 2))
    z = rng0.uniform(-30, 30, (K, 2))
    c = jnp.asarray(rng0.standard_normal(M) + 1j * rng0.standard_normal(M))
    chnk = NUFFT.type3(jnp.asarray(x), jnp.asarray(z), eps=1e-7,
                       chunked=True, fft_mem_mb=64.0)
    ref = chnk.apply(view_as_real(c))
    x_chunks, z_chunks = chnk.auto_chunk(max_mem=0.01)
    # chunks partition the index ranges exactly
    assert np.array_equal(np.sort(np.concatenate(x_chunks)), np.arange(M))
    assert np.array_equal(np.sort(np.concatenate(z_chunks)), np.arange(K))
    chnk.allocate(x_chunks, z_chunks)
    assert len(chnk._x_parts) * len(chnk._z_parts) > 1
    out = chnk.apply(view_as_real(c))
    assert np.allclose(np.asarray(ref), np.asarray(out), atol=1e-5)
    # malformed chunk lists are rejected with a clear error
    import pytest
    with pytest.raises(ValueError, match="partition"):
        chnk.allocate([np.arange(M - 1)], z_chunks)


def test_chunked_only_surface_raises_on_type12():
    # reference defines auto_chunk/allocate/diagnostic_plot/stats on the
    # NUFFT base class as "(Only applies to chunked type-3 transforms.)"
    import pytest
    x = rng0.uniform(-np.pi, np.pi, (50, 2))
    op = NUFFT.type1(jnp.asarray(x), (8, 8), eps=1e-4)
    for name in ("auto_chunk", "allocate", "diagnostic_plot", "stats"):
        with pytest.raises(NotImplementedError, match="chunked type-3"):
            getattr(op, name)() if name != "allocate" else op.allocate([], [])


def test_auto_chunk_enforces_max_anisotropy():
    """Reference contract (nufft.py:1195-1209, constraints (d)/(e)): every
    chunk's normalized shape ratio bounded by max_anisotropy, within and
    across domains.  An elongated x-cloud would pass a pure memory-driven
    bisection as one long thin block; the anisotropy cap must split it."""
    from pyxu_tpu.operator.linop.nufft import _block_aniso_np, _norm_widths_np

    M, K = 400, 300
    # x strongly elongated (100:1), z mildly elongated
    x = np.stack([rng0.uniform(-50, 50, M), rng0.uniform(-0.5, 0.5, M)], -1)
    z = np.stack([rng0.uniform(-8, 8, K), rng0.uniform(-2, 2, K)], -1)
    chnk = NUFFT.type3(jnp.asarray(x), jnp.asarray(z), eps=1e-6,
                       chunked=True, fft_mem_mb=64.0)
    for alpha in (2.0, 5.0):
        x_chunks, z_chunks = chnk.auto_chunk(max_mem=64.0,
                                             max_anisotropy=alpha)
        # still exact partitions
        assert np.array_equal(np.sort(np.concatenate(x_chunks)), np.arange(M))
        assert np.array_equal(np.sort(np.concatenate(z_chunks)), np.arange(K))
        # constraint (d): per-block normalized shape within alpha (the data
        # box of a block is contained in its cell, so a small slack covers
        # box-vs-cell mismatch)
        for pts, chunks in ((x, x_chunks), (z, z_chunks)):
            X = pts.max(axis=0) - pts.min(axis=0)
            for ch in chunks:
                if len(ch) > 1:
                    r = _norm_widths_np(pts, ch, X)
                    assert _block_aniso_np(r) <= alpha * 1.01, (alpha, r)
        # the solve still works after allocate() on the capped chunks
        c = jnp.asarray(rng0.standard_normal(M) + 1j * rng0.standard_normal(M))
        ref = nudft3(np.asarray(c), x, z, +1)
        chnk.allocate(x_chunks, z_chunks)
        out = view_as_complex(chnk.apply(view_as_real(c)))
        assert _rel(out, ref) < 1e-5
