"""Pallas kernels, run in interpreter mode on CPU (compiled path exercises
the same kernel code on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.ndimage as snd

from pyxu_tpu.ops.pallas_stencil import separable_correlate2d


@pytest.mark.parametrize("shape", [(50, 70), (64, 128), (33, 257)])
@pytest.mark.parametrize("taps", [(3, 4), (9, 9), (1, 5)])
def test_separable_correlate2d(shape, taps):
    rng = np.random.default_rng(1)
    x = rng.standard_normal(shape).astype(np.float32)
    lh, lw = taps
    kh = rng.standard_normal(lh).astype(np.float32)
    kw = rng.standard_normal(lw).astype(np.float32)
    ch, cw = lh // 2, lw // 2
    got = np.asarray(separable_correlate2d(
        jnp.asarray(x), kh, kw, ch, cw, tile_rows=16, interpret=True))
    want = snd.correlate1d(
        snd.correlate1d(x.astype(np.float64), kh.astype(np.float64), axis=0,
                        origin=ch - lh // 2, mode="constant"),
        kw.astype(np.float64), axis=1, origin=cw - lw // 2, mode="constant")
    assert np.allclose(got, want, atol=1e-4)
