"""Radio-interferometric imaging: NUFFT forward model + sparsity (CLEAN-style;
BASELINE workload 4).

Run: JAX_PLATFORMS=cpu python examples/radio_interferometry.py
"""

import numpy as np

from pyxu_tpu.models import radio_interferometry
from pyxu_tpu.opt.stop import MaxIter, RelError


def main(n=128, n_vis=3000):
    solver, fit_kw, aux = radio_interferometry(shape=(n, n), n_vis=n_vis,
                                               lam=0.02)
    # real_sky=True (default): iterates are real (n, n) images (rank 2);
    # real_sky=False keeps the complex (n, n, 2) formulation (rank 3).
    rank = fit_kw["x0"].ndim
    solver.fit(stop_crit=RelError(eps=1e-6, var="x", rank=rank) | MaxIter(200),
               max_iter=200, **fit_kw)
    x = np.asarray(solver.solution())
    if x.ndim == 3:        # complex formulation: take the real channel
        x = x[..., 0]
    err = np.linalg.norm(x - aux["x_true"]) / np.linalg.norm(aux["x_true"])
    print(f"RI imaging from {n_vis} visibilities: rel err {err:.4f}")
    return x


if __name__ == "__main__":
    main()
