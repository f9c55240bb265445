"""Native C++ planner (pyxu_tpu.native) vs numpy planners — exact parity.

The reference's NUFFT plan work lives in FINUFFT's C++ (nufft.py:275-277);
ours is pyxu_tpu/native/planner.cpp with numpy fallback.  These tests skip
when no compiler is available (the loader degrades gracefully).
"""

import numpy as np
import pytest

import pyxu_tpu.native as native
import pyxu_tpu.operator.linop.nufft as nf

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native planner unavailable")


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(7)
    return rng.uniform(0, 2 * np.pi, (30_000, 2))


def test_tap_weights_match_numpy(cloud):
    w, beta = nf._es_params(1e-7)
    nfs = (128, 96)
    # numpy reference (force the pure-numpy branch via small-M slicing of
    # the same formulas: call the private planner on a copy below threshold)
    idxs_np, wts_np = nf._tap_weights_np(cloud[:8000], nfs, w, beta)
    for ax in range(2):
        idx, wt = native.tap_weights(cloud[:8000], ax, 2 * np.pi / nfs[ax],
                                     nfs[ax], w, beta)
        np.testing.assert_array_equal(idx, idxs_np[ax])
        np.testing.assert_allclose(wt, wts_np[ax], rtol=1e-13)


def test_tap_weights_freq_spacing(cloud):
    """h=1 (type-3 frequency taps): same formula on raw coordinates."""
    w, beta = nf._es_params(1e-6)
    s = (cloud[:5000] - np.pi) * 3.0
    idx, wt = native.tap_weights(s, 0, 1.0, 64, w, beta)
    i0 = np.ceil(s[:, 0] - w / 2.0).astype(np.int64)
    t = np.arange(w)
    ref_idx = np.mod(i0[:, None] + t[None, :], 64).astype(np.int32)
    z = (i0[:, None] + t[None, :] - s[:, 0][:, None]) * (2.0 / w)
    ref_wt = np.where(np.abs(z) <= 1.0,
                      np.exp(beta * (np.sqrt(np.clip(1 - z * z, 0, None)) - 1)),
                      0.0)
    np.testing.assert_array_equal(idx, ref_idx)
    np.testing.assert_allclose(wt, ref_wt, rtol=1e-13)


def test_slab_permutation_stable(cloud):
    w, beta = nf._es_params(1e-6)
    base = nf._slab_base_np(cloud[:, 0], 128, w)
    T = w
    S = -(-128 // T)
    slab = base // T
    counts = np.bincount(slab, minlength=S)
    Mp = int(counts.max()) + 3
    perm, inv = native.slab_permutation(slab, counts, Mp)
    M = slab.shape[0]
    # numpy stable reference
    order = np.argsort(slab, kind="stable")
    ref = np.full((S, Mp), M, np.int32)
    off = 0
    for p in range(S):
        c = counts[p]
        ref[p, :c] = order[off:off + c]
        off += c
    np.testing.assert_array_equal(perm, ref)
    # inv round-trips
    np.testing.assert_array_equal(perm.ravel()[inv], np.arange(M))


def test_gather_rows(cloud):
    rng = np.random.default_rng(0)
    a = rng.normal(size=(100, 5))
    perm = rng.integers(0, 101, size=(7, 13)).astype(np.int32)  # 100 = dummy
    out = native.gather_rows(a, perm, -2.5)
    ref = np.concatenate([a, np.full((1, 5), -2.5)], 0)[perm]
    np.testing.assert_allclose(out, ref)
    ai = (a * 10).astype(np.int32)
    outi = native.gather_rows(ai, perm, 9)
    refi = np.concatenate([ai, np.full((1, 5), 9, np.int32)], 0)[perm]
    np.testing.assert_array_equal(outi, refi)


def test_full_plan_native_equals_numpy():
    """End-to-end: a type-1 transform planned above the native threshold
    equals the numpy-planned one (PYXU_TPU_NATIVE honored via monkeypatch
    of the loader state)."""
    import jax.numpy as jnp
    from pyxu_tpu.operator import NUFFT
    rng = np.random.default_rng(3)
    x = rng.uniform(-np.pi, np.pi, (20_000, 2))
    A = NUFFT.type1(x, N=(32, 32), eps=1e-6)     # native path (M >= 16384)
    lib, tried = native._LIB, native._TRIED
    try:
        native._LIB, native._TRIED = None, True  # force numpy fallback
        B = NUFFT.type1(x, N=(32, 32), eps=1e-6)
    finally:
        native._LIB, native._TRIED = lib, tried
    c = rng.normal(size=(20_000, 2)).astype(np.float32)
    ya = np.asarray(A.apply(jnp.asarray(c)))
    yb = np.asarray(B.apply(jnp.asarray(c)))
    np.testing.assert_allclose(ya, yb, atol=1e-5)
