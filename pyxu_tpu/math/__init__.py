from pyxu_tpu.math.cg import cg_solve  # noqa: F401
from pyxu_tpu.math.linalg import hutchpp, norm, spectral_norm, svdvals, trace  # noqa: F401
from pyxu_tpu.math.linesearch import backtracking_linesearch  # noqa: F401
