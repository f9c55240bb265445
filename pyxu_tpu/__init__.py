"""pyxu-tpu: a TPU-native computational-imaging / inverse-problem framework.

Built from scratch with the capabilities of the reference framework Pyxu
(AdriaJ/pyxu): a property-typed operator algebra, a matrix-free linear-operator
toolbox, and jit-compiled first-order proximal solvers — designed for JAX/XLA
on TPU (Pallas kernels for hot paths, `jax.sharding` meshes for scale-out).
"""

__version__ = "0.1.0"

from pyxu_tpu import info  # noqa: F401  (sets matmul precision policy)
from pyxu_tpu.abc import (  # noqa: F401
    DiffFunc,
    DiffMap,
    Func,
    LinFunc,
    LinOp,
    Map,
    Mode,
    NormalOp,
    Operator,
    OrthProjOp,
    PosDefOp,
    ProjOp,
    Property,
    ProxDiffFunc,
    ProxFunc,
    QuadraticFunc,
    SelfAdjointOp,
    Solver,
    SquareOp,
    StoppingCriterion,
    UnitOp,
    arithmetic,
    core_operators,
    infer_operator_class,
)
from pyxu_tpu import operator  # noqa: F401
from pyxu_tpu.opt import stop  # noqa: F401
from pyxu_tpu.opt import solver  # noqa: F401
from pyxu_tpu.opt.solver import CG, PGD  # noqa: F401
from pyxu_tpu import parallel  # noqa: F401
from pyxu_tpu import sampler  # noqa: F401
from pyxu_tpu.operator import interop  # noqa: F401
