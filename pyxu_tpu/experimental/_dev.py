"""Dev helpers mirrored from the reference's `experimental/_dev`
(reference: src/pyxu/experimental/_dev/__init__.py:1-206): thin
specializations kept for migration parity — the first-class equivalents are
the norm functionals, `PartialDerivative.finite_difference`, and
`SubSample`."""

from __future__ import annotations

import numpy as np

from pyxu_tpu.operator.func.norm import L1Norm, SquaredL2Norm  # noqa: F401
from pyxu_tpu.operator.linop.select import SubSample
from pyxu_tpu.utils.misc import as_canonical_shape

__all__ = ["SquaredL2Norm", "L1Norm", "FirstDerivative", "DownSampling"]


def FirstDerivative(size: int, axis: int = -1, sampling: float = 1.0,
                    kind: str = "forward"):
    """First derivative along one axis of a 1-D signal (reference
    `FirstDerivative`, experimental/_dev/__init__.py:37-120) via the
    first-class :class:`PartialDerivative` factory."""
    from pyxu_tpu.operator.linop.base import DiagonalOp
    from pyxu_tpu.operator.linop.diff import PartialDerivative
    scheme = {"forward": "forward", "backward": "backward",
              "centered": "central"}[kind]
    pd = PartialDerivative.finite_difference(
        (int(size),), order=(1,), scheme=scheme, sampling=sampling)
    # reference zeroes the boundary rows (experimental/_dev/__init__.py:
    # 60-64: forward y[-1]=0, backward y[0]=0, centered both edges) —
    # the zero-pad stencil alone leaves them nonzero
    mask = np.ones(int(size), np.float32)
    if kind == "forward":
        mask[-1] = 0.0
    elif kind == "backward":
        mask[0] = 0.0
    else:
        mask[0] = mask[-1] = 0.0
    return DiagonalOp(mask) * pd


def DownSampling(size, sampling_rate: int, axis: int = None):
    """Keep every ``sampling_rate``-th sample (reference `DownSampling`,
    experimental/_dev/__init__.py:121-206) via :class:`SubSample`."""
    dim_shape = as_canonical_shape(size)
    idx = []
    for ax, n in enumerate(dim_shape):
        if axis is None or ax == (axis % len(dim_shape)):
            idx.append(slice(0, n, int(sampling_rate)))
        else:
            idx.append(slice(None))
    return SubSample(dim_shape, *idx)
