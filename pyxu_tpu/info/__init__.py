from pyxu_tpu.info.dtypes import (  # noqa: F401
    CWidth,
    Precision,
    Width,
    atol_for,
    coerce,
    default_cdtype,
    default_fdtype,
    enable_x64,
    enforce_precision,
    lowered_matmul_precision,
    set_default_width,
)
from pyxu_tpu.info import warnings  # noqa: F401
