from pyxu_tpu.opt.solver.cg import CG  # noqa: F401
from pyxu_tpu.opt.solver.pgd import PGD  # noqa: F401
