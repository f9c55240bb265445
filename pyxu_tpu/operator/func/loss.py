"""Loss construction helpers (reference: src/pyxu/operator/func/loss.py:8-29)."""

from __future__ import annotations

import jax.numpy as jnp

from pyxu_tpu.abc.operator import Func

__all__ = ["shift_loss"]


def shift_loss(op: Func, data=None) -> Func:
    """f(x) -> f(x - data): turn a functional into a loss centred on data."""
    if data is None:
        return op
    return op.argshift(-jnp.asarray(data))
