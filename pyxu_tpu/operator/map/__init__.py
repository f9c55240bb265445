from pyxu_tpu.operator.map.base import ConstantValued  # noqa: F401
from pyxu_tpu.operator.map.ufunc import *  # noqa: F401,F403
