"""Reference namespace parity: ``pyxu.experimental`` hosted the MCMC
samplers and a handful of dev helpers (reference:
src/pyxu/experimental/{sampler,_dev}).  Here the samplers are first-class
(:mod:`pyxu_tpu.sampler`); this package keeps the reference import paths
working."""

import sys as _sys

from pyxu_tpu import sampler  # noqa: F401
from pyxu_tpu.experimental import _dev  # noqa: F401

# make `import pyxu_tpu.experimental.sampler` (the reference's documented
# idiom, `import pyxu.experimental.sampler as pxes`) resolve as a module,
# not just an attribute
_sys.modules[__name__ + ".sampler"] = sampler
