"""Profiling helpers.

The reference's observability is per-iteration history + Dask dashboards
(SURVEY §5); on TPU the native tool is the JAX/XLA profiler.  These are thin
conveniences over `jax.profiler` so solver runs can be traced without
boilerplate.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "timed"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA profile viewable in TensorBoard/Perfetto:

    >>> with trace("/tmp/jax-trace"):
    ...     solver.fit(...)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str = "", sync=None):
    """Wall-clock a block.  Store device results in the yielded dict
    (``with timed("fit") as out: out["x"] = slv.solution()``) — they are
    blocked on before the clock stops, so async dispatch is not counted.
    On relay-tunneled TPU runtimes block_until_ready can be unreliable for
    micro-benchmarks (see CLAUDE.md): force a scalar fetch for those."""
    t0 = time.perf_counter()
    out = {}
    try:
        yield out
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        for v in list(out.values()):
            try:
                jax.block_until_ready(v)
            except Exception:
                pass
        out["seconds"] = time.perf_counter() - t0
        if label:
            print(f"[{label}] {out['seconds']:.4f}s")
