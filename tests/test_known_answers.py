"""Hard-coded, paper-verifiable ground truth for families previously
covered only by self-consistency identities (VERDICT r4 item 9).

Reference discipline: src/pyxu_tests/operator/examples/ — every operator
family ships at least one ``data_apply``-style fixture whose expected value
is computable by hand (or from a textbook closed form), so a sign/scale bug
that is self-consistent across apply/adjoint still gets caught.

Families here: indicator functionals (apply + hand-computed projections),
kron / khatri_rao (literal 2x2 blocks), ufunc Jacobian diagonals (literal
derivative values), X-ray transforms (the analytic Radon transform of an
isotropic Gaussian), and the streamed out-of-core path (streamed result ==
in-memory result on a literal array).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyxu_tpu.operator.linop.kron import khatri_rao, kron
from pyxu_tpu.operator.func import (
    HyperSlab,
    L1Ball,
    L2Ball,
    LInfinityBall,
    PositiveOrthant,
)
from pyxu_tpu.operator.linop import ExplicitLinOp


# ------------------------------------------------------------- indicators --

def test_indicator_apply_membership():
    """iota_C(x) = 0 inside, +inf outside — literal points."""
    inf = np.inf
    cases = [
        (L1Ball((5,), radius=2.0), [1.0, -0.5, 0, 0.3, 0], 0.0),
        (L1Ball((5,), radius=2.0), [2.0, -0.5, 0, 0, 0], inf),   # sum 2.5
        (L2Ball((4,), radius=1.5), [0.9, 0.8, 0.6, 0.4], 0.0),   # ||.||~1.40
        (L2Ball((4,), radius=1.5), [1.5, 1.5, 0, 0], inf),       # ||.||~2.12
        (LInfinityBall((4,), radius=0.7), [0.5, -0.7, 0, 0.2], 0.0),
        (LInfinityBall((4,), radius=0.7), [0.71, 0, 0, 0], inf),
        (PositiveOrthant((3,)), [0.0, 1.0, 2.0], 0.0),
        (PositiveOrthant((3,)), [0.0, -1e-3, 2.0], inf),
        # a = (1, 2, 1/2): <a, (1/2, 1/4, 1)> = 3/2 in [-1, 2]
        (HyperSlab(jnp.asarray([1.0, 2.0, 0.5]), lb=-1.0, ub=2.0),
         [0.5, 0.25, 1.0], 0.0),
        # <a, (3, 3, 3)> = 21/2 > 2
        (HyperSlab(jnp.asarray([1.0, 2.0, 0.5]), lb=-1.0, ub=2.0),
         [3.0, 3.0, 3.0], inf),
    ]
    for op, x, want in cases:
        got = float(op.apply(jnp.asarray(x, jnp.float32)))
        if math.isinf(want):
            assert math.isinf(got), (op, x, got)
        else:
            assert got == 0.0, (op, x, got)


def test_indicator_projection_known_answers():
    """Hand-computed Euclidean projections (prox of the indicator, any tau).

    * L1 ball r=2, x=(2,1,0,0,0): soft-threshold t solves
      (2-t)+(1-t)=2 -> t=1/2 -> p=(3/2, 1/2, 0, 0, 0).
    * L2 ball r=3/2, x=(3,4,0,0): p = (3/2)*x/5 = (9/10, 6/5, 0, 0).
    * Positive orthant: clip at 0.
    * Hyperslab a=(1,2,1/2), ub=2, x=(3,3,3): <a,x>=21/2, ||a||^2=21/4,
      p = x - ((21/2-2)/(21/4)) a = (29/21, -5/21, 46/21)  (<a,p>=2).
    """
    cases = [
        (L1Ball((5,), radius=2.0), [2.0, 1.0, 0, 0, 0],
         [1.5, 0.5, 0, 0, 0]),
        (L2Ball((4,), radius=1.5), [3.0, 4.0, 0, 0], [0.9, 1.2, 0, 0]),
        (LInfinityBall((3,), radius=0.7), [1.0, -2.0, 0.3],
         [0.7, -0.7, 0.3]),
        (PositiveOrthant((5,)), [-1.0, 2.0, -0.5, 0.0, 3.0],
         [0.0, 2.0, 0.0, 0.0, 3.0]),
        (HyperSlab(jnp.asarray([1.0, 2.0, 0.5]), lb=-1.0, ub=2.0),
         [3.0, 3.0, 3.0], [29 / 21, -5 / 21, 46 / 21]),
    ]
    for op, x, want in cases:
        for tau in (0.5, 1.0, 3.0):   # projections are tau-independent
            got = np.asarray(op.prox(jnp.asarray(x, jnp.float32), tau))
            assert np.allclose(got, want, atol=1e-5), (op, tau, got, want)


# --------------------------------------------------------- kron/khatri-rao --

_A = np.asarray([[1.0, 2.0], [3.0, 4.0]])
_B = np.asarray([[0.0, 1.0], [1.0, 0.0]])


def test_kron_known_answer():
    """kron(A, B) with A=[[1,2],[3,4]], B=[[0,1],[1,0]]:

        [[0 1 0 2]      [1]     [10]
         [1 0 2 0]   @  [2]  =  [ 7]
         [0 3 0 4]      [3]     [22]
         [3 0 4 0]]     [4]     [15]
    """
    op = kron(ExplicitLinOp(jnp.asarray(_A, jnp.float32)),
              ExplicitLinOp(jnp.asarray(_B, jnp.float32)))
    got = np.asarray(op.apply(jnp.asarray([1.0, 2.0, 3.0, 4.0])))
    assert np.allclose(got, [10.0, 7.0, 22.0, 15.0], atol=1e-6), got


def test_khatri_rao_known_answer():
    """khatri_rao columns are kron of matching columns:
    col0 = kron((1,3),(0,1)) = (0,1,0,3); col1 = kron((2,4),(1,0)) =
    (2,0,4,0); x=(1,2) -> (4, 1, 8, 3)."""
    op = khatri_rao(ExplicitLinOp(jnp.asarray(_A, jnp.float32)),
                    ExplicitLinOp(jnp.asarray(_B, jnp.float32)))
    got = np.asarray(op.apply(jnp.asarray([1.0, 2.0])))
    assert np.allclose(got, [4.0, 1.0, 8.0, 3.0], atol=1e-6), got


# ------------------------------------------------------- ufunc Jacobians --

def test_ufunc_jacobian_diagonals():
    """Jacobian of an element-wise map is diag(f'(x)) — literal derivative
    values at convention-revealing points."""
    from pyxu_tpu.operator.map.ufunc import Cos, Exp, Sin, Sqrt, Tanh
    ln2 = float(np.log(2.0))
    cases = [
        (Sin((3,)), [0.0, np.pi / 2, np.pi], [1.0, 0.0, -1.0]),   # cos
        (Cos((2,)), [0.0, np.pi / 2], [0.0, -1.0]),               # -sin
        (Exp((2,)), [0.0, ln2], [1.0, 2.0]),                      # exp
        (Sqrt((2,)), [1.0, 4.0], [0.5, 0.25]),                    # 1/(2 sqrt)
        (Tanh((2,)), [0.0, np.inf], [1.0, 0.0]),                  # sech^2
    ]
    for op, x, want in cases:
        x = jnp.asarray(x, jnp.float32)
        J = op.jacobian(x)
        ones = jnp.ones_like(x)
        got = np.asarray(J.apply(ones))      # J @ 1 = diagonal
        assert np.allclose(got, want, atol=1e-5), (op, got, want)


# ------------------------------------------------------------------ X-ray --

def _gaussian_image(n, sigma):
    c = (n - 1) / 2.0
    yy, xx = np.meshgrid(np.arange(n) - c, np.arange(n) - c, indexing="ij")
    return np.exp(-(xx**2 + yy**2) / (2 * sigma**2)).astype(np.float32)


@pytest.mark.parametrize("cls_name", ["RadonTransform", "FourierRadon"])
def test_radon_of_gaussian_is_analytic(cls_name):
    """The Radon transform of exp(-r^2 / 2 s^2) at ANY angle is the
    textbook marginal s*sqrt(2 pi)*exp(-t^2 / 2 s^2) (rotation invariance
    + Gaussian integral) — in pixel units, since the quadrature integrates
    with ds in pixels.  Checks absolute scale, offset convention, and the
    detector-axis parameterization of both X-ray backends."""
    import pyxu_tpu.operator.linop.xray as xray
    n, sigma = 63, 5.0
    img = _gaussian_image(n, sigma)
    angles = np.asarray([0.0, np.pi / 6, np.pi / 4, np.pi / 2, 2.1])
    A = getattr(xray, cls_name)((n, n), angles)
    got = np.asarray(jax.jit(A.apply)(jnp.asarray(img)))
    if cls_name == "RadonTransform":
        t = np.asarray(A._t)                      # linspace(-R, R, n_det)
    else:   # FourierRadon: t_m = (m - (n_det-1)/2) * 1 px (xray.py:105)
        t = np.arange(A._n_det) - (A._n_det - 1) / 2.0
    want = sigma * np.sqrt(2 * np.pi) * np.exp(-t**2 / (2 * sigma**2))
    peak = want.max()     # = sigma sqrt(2 pi) ~ 12.5
    for a in range(len(angles)):
        assert np.abs(got[a] - want).max() < 2e-2 * peak, (
            cls_name, a, np.abs(got[a] - want).max())


# ------------------------------------------------------------ out-of-core --

def test_streamed_map_overlap_matches_in_memory():
    """Streamed band evaluation == one-shot evaluation on a literal array
    (reference Dask map_overlap contract, stencil.py:578-607)."""
    from pyxu_tpu.operator.linop import Stencil
    from pyxu_tpu.parallel.outofcore import streamed_map_overlap

    H, W = 37, 8
    x = np.arange(H * W, dtype=np.float32).reshape(H, W)
    k = jnp.asarray([1.0, -2.0, 1.0])
    op = Stencil((H, W), k.reshape(3, 1), (1, 0), mode="constant")
    want = np.asarray(op.apply(jnp.asarray(x)))

    # band fn must be built OUTSIDE the stream's jit: Stencil.__init__
    # reduces its taps eagerly, which inside a trace yields a tracer
    # (the jnp-of-constant hazard, CLAUDE.md) — prebuild for the uniform
    # extended band shape (block + 2*depth rows)
    op_ext = Stencil((8 + 2, W), k.reshape(3, 1), (1, 0), mode="constant")
    got = streamed_map_overlap(op_ext.apply, x, depth=1, block_rows=8)
    assert np.allclose(got, want, atol=1e-6)
    # hand-verifiable interior row: (1,-2,1) vertical stencil on row r is
    # x[r-1] - 2 x[r] + x[r+1] = 0 for the linear ramp
    assert np.allclose(got[1:-1], 0.0, atol=1e-5)
    # boundary rows: ghost zeros -> -2 x[0] + x[1] at the top
    assert np.allclose(got[0], -2 * x[0] + x[1], atol=1e-5)


def test_streamed_block_diag_matches_in_memory():
    from pyxu_tpu.operator.linop import DiagonalOp
    from pyxu_tpu.parallel.outofcore import streamed_block_diag

    xs = [np.full((4,), float(i + 1), np.float32) for i in range(3)]
    ops = [DiagonalOp(jnp.full((4,), 10.0 ** i)) for i in range(3)]
    got = streamed_block_diag(ops, xs)
    want = [[1.0] * 4, [20.0] * 4, [300.0] * 4]
    for g, w in zip(got, want):
        assert np.allclose(np.asarray(g), w, atol=1e-5)
