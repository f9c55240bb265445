"""Reference namespace parity: ``pyxu.experimental`` hosted the MCMC
samplers and a handful of dev helpers (reference:
src/pyxu/experimental/{sampler,_dev}).  Here the samplers are first-class
(:mod:`pyxu_tpu.sampler`); this package keeps the reference import paths
working."""

from pyxu_tpu import sampler  # noqa: F401
from pyxu_tpu.experimental import _dev  # noqa: F401
