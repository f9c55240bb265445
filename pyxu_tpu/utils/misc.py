"""Shape canonicalisation, FFT-friendly sizes, synthetic test images.

Reference: src/pyxu/util/misc.py:12-147.  Test images (`peaks`,
`star_like_sample`) are re-implemented from their mathematical definitions so
the conformance/bench suites have deterministic inputs.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

__all__ = [
    "as_canonical_shape",
    "broadcast_shapes_leading",
    "next_fast_len",
    "peaks",
    "star_like_sample",
    "infer_sum_shape",
    "infer_composition_shape",
]


def as_canonical_shape(shape) -> tuple:
    """Normalise a shape spec to a tuple of ints.

    Accepts an int, an iterable of ints, or ``()`` (scalar / functional
    codomain).  Reference: src/pyxu/util/misc.py:12-21.
    """
    if shape is None:
        return ()
    if isinstance(shape, (int, np.integer)):
        return (int(shape),)
    shape = tuple(int(s) for s in shape)
    return shape


def broadcast_shapes_leading(arr_shape: tuple, core_shape: tuple) -> tuple:
    """Split ``arr_shape`` into (batch_dims, core_dims) given trailing core shape."""
    nc = len(core_shape)
    if nc == 0:
        return arr_shape, ()
    batch, core = arr_shape[: len(arr_shape) - nc], arr_shape[len(arr_shape) - nc :]
    if tuple(core) != tuple(core_shape):
        raise ValueError(f"array shape {arr_shape} does not end with core shape {core_shape}")
    return batch, core


def next_fast_len(n: int, even: bool = False) -> int:
    """Smallest 5-smooth number >= n (reference: util/misc.py:22-40).

    XLA's FFT is efficient for sizes with small prime factors; 5-smooth sizes
    match the reference's scipy.fft.next_fast_len behavior.
    """
    if n <= 1:
        return 2 if even else 1
    best = None
    # Search 2^a 3^b 5^c >= n.
    a_max = int(math.ceil(math.log2(n))) + 1
    for a in range(a_max + 1):
        pa = 2**a
        if pa >= 8 * n:
            break
        b = 0
        while True:
            pb = pa * 3**b
            if pb >= 8 * n:
                break
            c = 0
            while True:
                p = pb * 5**c
                if p >= n:
                    if (not even or p % 2 == 0) and (best is None or p < best):
                        best = p
                    break
                c += 1
            b += 1
    return best


def peaks(x, y):
    """MATLAB-style ``peaks`` function (reference: util/misc.py:41-87).

    f(x,y) = 3(1-x)^2 exp(-x^2-(y+1)^2) - 10(x/5-x^3-y^5) exp(-x^2-y^2)
             - 1/3 exp(-(x+1)^2 - y^2)
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    a = 3 * (1 - x) ** 2 * jnp.exp(-(x**2) - (y + 1) ** 2)
    b = -10 * (x / 5 - x**3 - y**5) * jnp.exp(-(x**2) - (y**2))
    c = -jnp.exp(-((x + 1) ** 2) - (y**2)) / 3
    return a + b + c


def star_like_sample(N: int, w: int, s: float, po: int, x0: float, ndim: int = 2):
    """Star-shaped phantom (reference: util/misc.py:88-147).

    An ``ndim``-dimensional grid on [-1,1]^ndim where a sinusoidal angular
    pattern is modulated by a radial sigmoid envelope — standard test image
    for derivative/TV operators.
    """
    assert ndim == 2, "only the 2-D phantom is provided (as in the reference docs)"
    grid = jnp.linspace(-1.0, 1.0, N)
    xx, yy = jnp.meshgrid(grid, grid, indexing="ij")
    theta = jnp.arctan2(yy, xx)
    r = jnp.sqrt(xx**2 + yy**2)
    env = 1.0 / (1.0 + jnp.exp(s * (r - x0)))
    pattern = (1 + jnp.cos(w * theta)) ** po / 2**po
    return env * pattern


def infer_sum_shape(sh1, sh2):
    """Output (codim, dim) of op1 + op2 given their (codim_shape, dim_shape)
    pairs (reference `infer_sum_shape`, util/operator.py:21-27)."""
    (co1, di1), (co2, di2) = sh1, sh2
    co1, di1 = as_canonical_shape(co1), as_canonical_shape(di1)
    co2, di2 = as_canonical_shape(co2), as_canonical_shape(di2)
    if di1 != di2:
        raise ValueError(f"addition of {sh1} and {sh2} operators forbidden")
    import numpy as _np
    try:
        co = tuple(_np.broadcast_shapes(co1, co2))
    except ValueError:
        raise ValueError(f"addition of {sh1} and {sh2} operators forbidden")
    return (co, di1)


def infer_composition_shape(sh1, sh2):
    """Output (codim, dim) of op1 * op2 (reference
    `infer_composition_shape`, util/operator.py:30-35)."""
    (co1, di1), (co2, di2) = sh1, sh2
    if as_canonical_shape(di1) != as_canonical_shape(co2):
        raise ValueError(f"composition of {sh1} and {sh2} operators forbidden")
    return (as_canonical_shape(co1), as_canonical_shape(di2))


def asarray_astype(arr, dtype):
    """``jnp.asarray(arr, dtype)`` that casts HOST inputs host-side first —
    a dtype-converting asarray of a host array transfers the raw bytes then
    converts ON DEVICE (CLAUDE.md gotcha: 2x bytes over slow relays)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    if not isinstance(arr, jax.Array):
        return jnp.asarray(np.asarray(arr).astype(dtype))
    return jnp.asarray(arr, dtype)
