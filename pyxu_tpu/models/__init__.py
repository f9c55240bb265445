"""End-to-end inverse-problem recipes (the BASELINE.md workload configs).

Each factory returns ``(solver, fit_kwargs, aux)`` ready for
``solver.fit(**fit_kwargs)`` — the runnable equivalents of the reference's
primer/tomography example notebooks (reference: doc/ examples; SURVEY §6).
"""

from pyxu_tpu.models.workloads import (  # noqa: F401
    consensus_tiles,
    lasso_deconvolution,
    radio_interferometry,
    sparse_view_ct,
    tv_deconvolution,
)
