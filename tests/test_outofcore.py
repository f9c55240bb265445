"""Out-of-core streaming execution (parallel/outofcore.py) — the reference's
Dask larger-than-memory capability (stencil.py:578-607 map_overlap,
blocks.py:474-511 per-block evaluation) re-done as host-offload streaming.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pyxu_tpu.operator.func import L21Norm
from pyxu_tpu.operator.linop import Gradient, Stencil
from pyxu_tpu.parallel import (StreamedCondatVu, streamed_block_diag,
                               streamed_map_overlap)

rng0 = np.random.default_rng(7)


def _gauss1d(sigma, n):
    t = np.arange(n) - (n - 1) / 2
    k = np.exp(-0.5 * (t / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


@pytest.mark.parametrize("block_rows", [16, 37, 200])
def test_streamed_map_overlap_matches_global(block_rows):
    """Band-streamed stencil apply == one global apply (mode=constant)."""
    H, W = 120, 33
    x = rng0.standard_normal((H, W)).astype(np.float32)
    k1 = _gauss1d(1.5, 7)
    K = Stencil((H, W), [jnp.asarray(k1), jnp.asarray(k1)], [3, 3],
                mode="constant")
    want = np.asarray(K.apply(jnp.asarray(x)))

    # the band fn sees the extended band; radius 3 <= depth
    Rh = min(block_rows, H) + 2 * 4
    Kb = Stencil((Rh, W), [jnp.asarray(k1), jnp.asarray(k1)], [3, 3],
                 mode="constant")
    got = streamed_map_overlap(Kb.apply, x, depth=4, block_rows=block_rows)
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) < 1e-6 * max(1.0, np.abs(want).max())


def test_streamed_map_overlap_batch_axes():
    H, W = 40, 17
    x = rng0.standard_normal((3, H, W)).astype(np.float32)
    got = streamed_map_overlap(lambda b: 2.0 * b, x, depth=2, block_rows=16)
    assert np.allclose(got, 2.0 * x, atol=1e-7)


def test_streamed_block_diag_matches_ops():
    from pyxu_tpu.operator.linop.base import HomothetyOp
    ops = [HomothetyOp(dim_shape=(8, 5), cst=float(c)) for c in (1.0, -2.0, 0.5)]
    xs = [rng0.standard_normal((8, 5)).astype(np.float32) for _ in ops]
    ys = streamed_block_diag(ops, xs)
    for c, xb, yb in zip((1.0, -2.0, 0.5), xs, ys):
        assert np.allclose(yb, c * xb, atol=1e-6)
    with pytest.raises(ValueError, match="ops vs"):
        streamed_block_diag(ops, xs[:2])


def _reference_cv(y, k1, lam, tau, sigma, n_iters):
    """In-memory global Condat-Vu with the same operators/boundary."""
    H, W = y.shape
    c = (len(k1) - 1) // 2
    K = Stencil((H, W), [jnp.asarray(k1), jnp.asarray(k1)], [c, c],
                mode="constant")
    D = Gradient((H, W), mode="constant")
    h = lam * L21Norm((2, H, W), l2_axis=0)
    x = jnp.asarray(y)
    z = jnp.zeros((2, H, W), jnp.float32)
    yj = jnp.asarray(y)
    for _ in range(n_iters):
        gf = K.adjoint(K.apply(x) - yj)
        xp = x - tau * (gf + D.adjoint(z))
        u = D.apply(2.0 * xp - x)
        z = h.fenchel_prox(z + sigma * u, sigma)
        x = xp
    return np.asarray(x), np.asarray(z)


@pytest.mark.parametrize("block_rows", [24, 50])
def test_streamed_condatvu_matches_in_memory(block_rows):
    """The streamed solve IS the global iteration (not block-Jacobi):
    per-iteration state matches the in-memory solver to f32 tolerance."""
    H, W = 96, 41
    k1 = _gauss1d(2.0, 9)
    x_true = rng0.random((H, W), dtype=np.float32)
    y = np.asarray(Stencil((H, W), [jnp.asarray(k1)] * 2, [4, 4],
                           mode="constant").apply(jnp.asarray(x_true)))
    slv = StreamedCondatVu(y, k1, lam=0.02, block_rows=block_rows)
    slv.fit(n_iters=6)
    want_x, _ = _reference_cv(y, k1, 0.02, slv._tau, slv._sigma, 6)
    err = np.max(np.abs(slv.solution() - want_x))
    assert err < 5e-6 * max(1.0, np.abs(want_x).max()), err


@pytest.mark.slow
def test_streamed_condatvu_large_state_smoke():
    """State exceeding a typical HBM budget streams fine (host-resident);
    2 iterations, finiteness + scale sanity.  The >16 GB giga-pixel demo
    is tools/giga_tv_demo.py (too slow for CI on this 2-vCPU host)."""
    H, W = 6000, 4000          # state x+z+y = 4 frames = 384 MB
    k1 = _gauss1d(2.0, 9)
    y = rng0.random((H, W), dtype=np.float32)
    slv = StreamedCondatVu(y, k1, lam=0.02, block_rows=1024)
    assert slv.state_bytes == 4 * H * W * 4
    slv.fit(n_iters=2)
    out = slv.solution()
    assert np.isfinite(out).all()
    assert np.abs(out - y).max() > 0   # it moved


def test_streamed_condatvu_memmap_state(tmp_path):
    """Disk-backed y (np.memmap) streams identically — the documented
    larger-than-RAM entry point."""
    H, W = 64, 33
    k1 = _gauss1d(1.5, 7)
    rng = np.random.default_rng(3)
    y_arr = rng.random((H, W), dtype=np.float32)
    p = tmp_path / "y.dat"
    mm = np.memmap(p, dtype=np.float32, mode="w+", shape=(H, W))
    mm[:] = y_arr
    mm.flush()
    slv_mm = StreamedCondatVu(np.memmap(p, dtype=np.float32, mode="r",
                                        shape=(H, W)), k1, lam=0.02,
                              block_rows=16)
    slv = StreamedCondatVu(y_arr, k1, lam=0.02, block_rows=16)
    slv_mm.fit(n_iters=4)
    slv.fit(n_iters=4)
    assert np.abs(slv_mm.solution() - slv.solution()).max() < 1e-7
