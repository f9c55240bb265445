from pyxu_tpu.operator.interop.jax import from_jax  # noqa: F401
from pyxu_tpu.operator.interop.sciop import from_sciop  # noqa: F401
from pyxu_tpu.operator.interop.source import from_source  # noqa: F401
from pyxu_tpu.operator.interop.torch import asarray, astensor, from_torch  # noqa: F401
