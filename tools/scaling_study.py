"""Virtual-mesh scaling study (BASELINE workload 5 / SURVEY §2.4 evidence).

Real multi-chip hardware is not reachable in this environment (one v5e chip
behind a tunnel), so this measures the closest admissible proxy for the
">=80% scaling efficiency 1->N" BASELINE target: the SAME fixed-total-size
problem run on 1, 2, 4, 8 *virtual* CPU devices
(``--xla_force_host_platform_device_count``).  The physical compute resource
(this host's CPU) is constant across legs, so the ideal result is *constant*
wall-clock — any slowdown vs the 1-device leg is pure partitioning overhead
(halo exchanges / all-reduces / resharding inserted by ``pjit``).  We report

    overhead_eff(N) = iter_per_s(N) / iter_per_s(1)

per workload.  ``overhead_eff ~ 1`` means the sharded program adds no
measurable collective/partitioning cost at compute-dominated sizes, i.e. on
real chips (where each device brings its own FLOPs/HBM) scaling would be
compute-limited, not framework-limited.  This cannot prove ICI-bandwidth
sufficiency — only hardware can — but it bounds the framework-side cost.

Workloads:
  - ``tv_sharded``:  TV Condat-Vu on an HxW image, rows sharded over the
    mesh, ShardedStencil halo exchange (ppermute) each iteration.
  - ``consensus``:   ConsensusADMM over B image tiles, block axis sharded
    (psum mean each iteration) — BASELINE workload config 5.

Usage:
  python tools/scaling_study.py                # full study, table + JSON
  python tools/scaling_study.py --child N ...  # internal (one mesh size)

Each mesh size runs in its own subprocess because the virtual device count
is fixed at backend initialization.
"""

import argparse
import json
import os
import subprocess
import sys
import time

DEFAULT_DEVICES = (1, 2, 4, 8)


# ------------------------------------------------------------------ child --
def _child(n_dev: int, size: int, tiles: int, tile: int, iters: int) -> None:
    import re
    flags = os.environ.get("XLA_FLAGS", "")
    # REPLACE any inherited count (e.g. the test conftest exports 8)
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_dev}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from pyxu_tpu.models.workloads import consensus_tiles
    from pyxu_tpu.operator.func import L21Norm, SquaredL2Norm
    from pyxu_tpu.operator.linop import Gradient
    from pyxu_tpu.opt.solver import CondatVu
    from pyxu_tpu.opt.stop import MaxIter
    from pyxu_tpu.parallel import P, ShardedStencil, auto_mesh, shard

    assert len(jax.devices()) == n_dev, (len(jax.devices()), n_dev)
    mesh = auto_mesh()
    out = {"n_devices": n_dev}

    def timed_fit(slv, fit_kw, crit, iters):
        slv.fit(stop_crit=crit, max_iter=iters, segment_size=iters, **fit_kw)
        jax.block_until_ready(slv.solution())
        # the engine's crash-proof dispatch turns segment errors into
        # silent zero-iteration fits — fail loudly instead of timing those
        hist = slv.stats()[1]
        done = int(np.asarray(hist["iteration"])[-1]) if len(
            np.asarray(hist["iteration"])) else 0
        if done < iters:
            raise RuntimeError(
                f"fit ran {done}/{iters} iterations — segment crashed? "
                "(see solver log)")
        t0 = time.perf_counter()
        slv.fit(stop_crit=crit, max_iter=iters, segment_size=iters, **fit_kw)
        jax.block_until_ready(slv.solution())
        return iters / (time.perf_counter() - t0)

    # --- tv_sharded: fixed-total-size TV solve, rows sharded over the mesh
    H = W = size
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.random((H, W), dtype=np.float32))
    k1 = jnp.asarray(np.array([0.25, 0.5, 0.25], np.float32))
    K = ShardedStencil((H, W), [k1, k1], [1, 1], mesh, shard_axis=0,
                       mode="constant")
    ys = K.apply(shard(y, mesh, P("s", None)))
    f = 0.5 * SquaredL2Norm((H, W)).asloss(ys) * K
    D = Gradient((H, W), mode="constant")
    h = 0.01 * L21Norm((2, H, W), l2_axis=0)
    slv = CondatVu(f=f, h=h, K=D, stop_rate=iters)
    x0 = shard(y, mesh, P("s", None))
    out["tv_sharded_iter_per_s"] = round(
        timed_fit(slv, dict(x0=x0), MaxIter(iters), iters), 3)

    # --- consensus: B tiles sharded on the block axis (workload 5)
    slv, fit_kw, _ = consensus_tiles(tile=(tile, tile), n_tiles=tiles,
                                     mesh=mesh)
    slv._stop_rate = iters
    out["consensus_iter_per_s"] = round(
        timed_fit(slv, fit_kw, MaxIter(iters), iters), 3)

    print(json.dumps(out))


# ----------------------------------------------------------------- parent --
def run_study(devices=DEFAULT_DEVICES, size=1024, tiles=8, tile=256,
              iters=60, quiet=False):
    """Run one subprocess per mesh size; return the consolidated dict."""
    rows = []
    for n in devices:
        cmd = [sys.executable, os.path.abspath(__file__), "--child", str(n),
               "--size", str(size), "--tiles", str(tiles),
               "--tile", str(tile), "--iters", str(iters)]
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ)
        # keep any existing PYTHONPATH entries (the hosted axon site rides
        # PYTHONPATH — CLAUDE.md) and prepend the repo root for pyxu_tpu
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=1200,
                           cwd=repo, env=env)
        if r.returncode != 0:
            raise RuntimeError(f"child n={n} failed:\n{r.stderr[-2000:]}")
        rows.append(json.loads(r.stdout.strip().splitlines()[-1]))
        if not quiet:
            print(f"# n={n}: {rows[-1]}", file=sys.stderr, flush=True)
    base = rows[0]
    study = {"kind": "virtual_mesh_fixed_total_work",
             "size": size, "tiles": tiles, "tile": tile, "iters": iters,
             "legs": []}
    for row in rows:
        leg = dict(row)
        for k in ("tv_sharded", "consensus"):
            leg[f"{k}_overhead_eff"] = round(
                row[f"{k}_iter_per_s"] / base[f"{k}_iter_per_s"], 3)
        study["legs"].append(leg)
    return study


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--tiles", type=int, default=8)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--iters", type=int, default=60)
    args = ap.parse_args()
    if args.child is not None:
        _child(args.child, args.size, args.tiles, args.tile, args.iters)
        return
    study = run_study(size=args.size, tiles=args.tiles, tile=args.tile,
                      iters=args.iters)
    print(json.dumps(study, indent=2))


if __name__ == "__main__":
    main()
