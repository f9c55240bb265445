from pyxu_tpu.info.dtypes import (  # noqa: F401
    CWidth,
    Precision,
    Width,
    atol_for,
    default_cdtype,
    default_fdtype,
    enable_x64,
    lowered_matmul_precision,
    set_default_width,
)
from pyxu_tpu.info import warnings  # noqa: F401
