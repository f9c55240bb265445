"""Concrete operator library (reference: src/pyxu/operator/__init__.py:1-4
re-exports blocks/func/linop/map the same way)."""

from pyxu_tpu.operator.blocks import (  # noqa: F401
    block,
    block_diag,
    coo_block,
    hstack,
    stack,
    vstack,
)
from pyxu_tpu.operator.func import *  # noqa: F401,F403
from pyxu_tpu.operator.linop import *  # noqa: F401,F403
from pyxu_tpu.operator.map import *  # noqa: F401,F403
from pyxu_tpu.operator.map import ConstantValued  # noqa: F401
