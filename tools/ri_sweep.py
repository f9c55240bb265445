"""Sweep (tau, inner CG maxiter) on the ri_admm_256 bench workload (CPU).

Goal: the bench metric counts OUTER iterations/s; each outer costs
``maxiter+1`` Toeplitz-gram applies (the dominant device cost), so the
figure of merit is gram-applies-per-outer at equal reconstruction error.
Quality gate (VERDICT r4): rel err <= 0.11% at the bench's exact config
(150 outers, 256^2, n_vis=20k, lam=0.02, real sky).

Run:  python tools/ri_sweep.py            (CPU, ~10 min)
"""

import json
import sys
import time

import jax

# Force CPU before anything touches the backend (env vars are too late
# under the hosted sitecustomize — CLAUDE.md).
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from pyxu_tpu.models.workloads import radio_interferometry
    from pyxu_tpu.opt.stop import MaxIter

    n_outer = 150
    slv0, fit_kw, aux = radio_interferometry(shape=(256, 256), n_vis=20_000)
    x_true = aux["x_true"]
    xt = np.asarray(x_true)
    nrm = np.linalg.norm(xt)

    from pyxu_tpu.opt.solver import ADMM

    f = slv0._f
    h = slv0._h

    results = []
    grid_tau = [0.05, 0.1, 0.2, 0.5, 1.0, 2.0]
    grid_mi = [4, 6, 8, 12, 16, 24]
    for tau in grid_tau:
        for mi in grid_mi:
            slv = ADMM(f=f, h=h, solver_kwargs=dict(maxiter=mi),
                       show_progress=False)
            t0 = time.time()
            slv.fit(x0=jnp.zeros((256, 256)), tau=tau,
                    stop_crit=MaxIter(n_outer), max_iter=n_outer,
                    segment_size=n_outer)
            x = np.asarray(slv.solution())
            err = float(np.linalg.norm(x - xt) / nrm)
            rec = {"tau": tau, "maxiter": mi, "rel_err_pct": 100 * err,
                   "grams_per_outer": mi + 1, "wall_s": round(time.time() - t0, 1)}
            results.append(rec)
            print(json.dumps(rec), flush=True)

    results.sort(key=lambda r: (r["grams_per_outer"], r["rel_err_pct"]))
    ok = [r for r in results if r["rel_err_pct"] <= 0.11]
    print("# passing configs by cost:", file=sys.stderr)
    for r in ok[:10]:
        print(json.dumps(r), file=sys.stderr)


if __name__ == "__main__":
    main()
