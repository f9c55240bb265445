"""Sparse-view CT with positivity + TV (the reference's tomography notebook
analog; BASELINE workload 3).

Run: JAX_PLATFORMS=cpu python examples/tomography.py
"""

import numpy as np

from pyxu_tpu.models import sparse_view_ct
from pyxu_tpu.opt.stop import MaxIter, RelError


def main(n=96, n_angles=24):
    solver, fit_kw, aux = sparse_view_ct(shape=(n, n), n_angles=n_angles,
                                         lam=0.005)
    solver.fit(stop_crit=RelError(eps=1e-6, var="x", rank=2) | MaxIter(300),
               max_iter=300, **fit_kw)
    x = np.asarray(solver.solution())
    err = np.linalg.norm(x - aux["x_true"]) / np.linalg.norm(aux["x_true"])
    print(f"{n_angles}-view CT reconstruction: rel err {err:.4f}, "
          f"min {x.min():.2e} (positivity)")
    return x


if __name__ == "__main__":
    main()
