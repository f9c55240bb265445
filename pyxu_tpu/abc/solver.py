"""Iterative-solver engine.

Reference: src/pyxu/abc/solver.py:26-719 (``Solver``, ``Mode``,
``StoppingCriterion`` protocol, ASYNC worker thread, history, writeback).

TPU re-design (SURVEY §3.2): the reference pays Python dispatch per iteration
(`_step` loop, abc/solver.py:588-663) and a device->host sync at every
stop-check.  Here ``fit`` compiles *segments* of the iteration as one
``lax.while_loop`` whose body is ``stop_rate`` x ``m_step`` plus an on-device
stop-criterion evaluation and an on-device history write; the host is touched
once per segment (for logging / writeback / wall-clock criteria).  With the
default single segment, an entire solve is one XLA computation.

Subclass contract (same shape as the reference's):

* ``m_init(**kwargs) -> mstate``  — a dict pytree of jnp arrays;
* ``m_step(mstate) -> mstate``    — pure, jit-traceable;
* ``default_stop_crit()``         — per-solver default;
* ``objective_func(mstate)``      — optional, for ``track_objective``.

Modes (reference: abc/solver.py:26-34):

* ``Mode.BLOCK``  — run to completion, return;
* ``Mode.MANUAL`` — ``steps()`` generator of mstates (one jitted step each);
* ``Mode.ASYNC``  — background thread running BLOCK segments; ``busy()`` /
  ``stop()`` / ``solution()``.
"""

from __future__ import annotations

import datetime as dt
import enum
import functools
import logging
import pathlib
import tempfile
import threading

import jax
import jax.numpy as jnp
import numpy as np

from pyxu_tpu.opt.stop import MaxDuration, MaxIter, StoppingCriterion


@functools.lru_cache(maxsize=8)
def _tree_cast_fn(dtype_name: str):
    """Jitted whole-state dtype cast, one jit object per dtype (see
    Solver._fit_scheduled.cast)."""
    dtype = jnp.dtype(dtype_name)

    @jax.jit
    def f(st):
        return jax.tree_util.tree_map(
            lambda a: a.astype(dtype)
            if (hasattr(a, "dtype") and a.ndim > 0
                and jnp.issubdtype(a.dtype, jnp.floating))
            else a, st)

    return f

__all__ = ["Mode", "Solver", "StoppingCriterion"]


class Mode(enum.Enum):
    BLOCK = enum.auto()
    MANUAL = enum.auto()
    ASYNC = enum.auto()


class Solver:
    """Iterative solver skeleton (reference: abc/solver.py:119-719)."""

    def __init__(self, *, log_var=("x",), verbosity: int = None,
                 show_progress: bool = False, folder=None, exist_ok: bool = False,
                 stop_rate: int = 1, writeback_rate: int = None,
                 checkpoint_backend: str = "npz", operand_mode: str = "static"):
        assert checkpoint_backend in ("npz", "orbax"), checkpoint_backend
        assert operand_mode in ("static", "dynamic"), operand_mode
        self._ckpt_backend = checkpoint_backend
        # "static": operator arrays are closure constants of the compiled
        # segment — fastest codegen (measured ~8% per-iteration win at 4K:
        # XLA folds kernel taps/step scalars into the fused loop body).
        # "dynamic": operands ride as jit arguments so update_operands()
        # swaps recompile-free.  update_operands() on a static solver flips
        # it to dynamic (one retrace at the next fit, then free swaps).
        self._operand_mode = operand_mode
        self._log_var = tuple(log_var)
        self._verbosity = verbosity
        self._show_progress = bool(show_progress)
        self._stop_rate = int(stop_rate)
        self._writeback_rate = writeback_rate
        self._folder = folder
        self._exist_ok = exist_ok
        self._mstate: dict = {}
        self._history = None
        self._astate = {
            "active": None, "worker": None, "mode": None, "logger": None,
            "stop_crit": None, "wb_dir": None,
        }

    # ------------------------------------------------------------ subclass --
    def _hyper_key(self):
        """Hashable fingerprint of scalar hyperparameters (tau/sigma/rho/
        variant/restart/...) that m_step reads off ``self`` and which
        therefore become TRACE CONSTANTS of the compiled segment: a re-fit
        that changes one must not reuse a program compiled with the old
        value baked in."""
        def scalarish(v):
            if isinstance(v, (bool, int, float, str)) or v is None:
                return True
            if isinstance(v, tuple):
                return all(scalarish(e) for e in v)
            return False

        items = []
        for k, v in self.__dict__.items():
            if k in ("_mstate", "_history", "_seg_cache", "_step_cache",
                     "_metric_keys", "_astate", "_segment"):
                continue
            if isinstance(v, dict):
                if all(isinstance(kk, str) and scalarish(vv)
                       for kk, vv in v.items()):
                    items.append((k, tuple(sorted(v.items()))))
                continue
            if scalarish(v):
                items.append((k, v))
        return tuple(sorted(items, key=lambda t: t[0]))

    def m_init(self, **kwargs) -> dict:
        raise NotImplementedError

    def m_step(self, mstate: dict) -> dict:
        raise NotImplementedError

    def default_stop_crit(self) -> StoppingCriterion:
        from pyxu_tpu.opt.stop import RelError
        return RelError(eps=1e-4, var="x")

    def objective_func(self, mstate: dict):
        raise NotImplementedError

    # ----------------------------------------------------------------- fit --
    def fit(self, *, mode: Mode = Mode.BLOCK, stop_crit: StoppingCriterion = None,
            max_iter: int = 10_000, segment_size: int = None,
            track_objective: bool = False, warm_start: bool = False,
            precision_schedule=None, **m_init_kwargs):
        """Solve.  ``max_iter`` is a hard cap (it sizes the device-resident
        history buffer); ``segment_size`` = iterations per host round-trip
        (default: writeback/verbosity cadence, else the whole solve).

        ``warm_start=True`` continues from the previous fit's math state
        (``m_init`` is skipped; hyper-parameters such as step sizes persist).
        Combine with :meth:`update_operands` to re-solve against new data
        without recompiling — after the first swap the solver passes operator
        arrays as jit arguments (``operand_mode="dynamic"``), so
        same-structure swaps hit the compiled segment cache.

        ``precision_schedule``: list of ``(dtype, n_iters)`` phases — the
        measured two-phase mixed-precision recipe (BASELINE rounds 2/6: a
        bf16 warm phase runs ~1.65x faster; an f32 polish recovers the full
        f32 objective) promoted to an API.  Floating math-state arrays are
        cast to each phase's dtype and the solve warm-starts through the
        phases; the LAST phase may use ``n_iters=None`` to run under the
        real ``stop_crit`` with the remaining ``max_iter`` budget.  E.g.
        ``fit(x0=x0, precision_schedule=[(jnp.bfloat16, 700),
        (jnp.float32, None)], max_iter=1000)``.  BLOCK mode only.
        """
        if precision_schedule is not None:
            return self._fit_scheduled(
                precision_schedule, mode=mode, stop_crit=stop_crit,
                max_iter=max_iter, segment_size=segment_size,
                track_objective=track_objective, warm_start=warm_start,
                m_init_kwargs=m_init_kwargs)
        self._astate["mode"] = mode
        # stale ASYNC state (a cleared Event from a stop()) must not truncate
        # a later BLOCK/MANUAL fit
        self._astate["active"] = None
        self._astate["worker"] = None
        self._fit_init(stop_crit, max_iter, segment_size, track_objective)
        if warm_start:
            assert self._mstate, "warm_start=True requires a previous fit"
            assert not m_init_kwargs, \
                "warm_start=True skips m_init; m_init kwargs have no effect"
        else:
            self._mstate = self.m_init(**m_init_kwargs)
        if mode is Mode.BLOCK:
            self._fit_run()
            return self
        if mode is Mode.MANUAL:
            return self.steps()
        if mode is Mode.ASYNC:
            w = threading.Thread(target=self._fit_run, daemon=True)
            self._astate["worker"] = w
            self._astate["active"] = threading.Event()
            self._astate["active"].set()
            w.start()
            return self
        raise ValueError(mode)

    def _fit_scheduled(self, schedule, *, mode, stop_crit, max_iter,
                       segment_size, track_objective, warm_start,
                       m_init_kwargs):
        """Run the phases of a ``precision_schedule`` (see :meth:`fit`)."""
        if mode is not Mode.BLOCK:
            raise ValueError("precision_schedule supports BLOCK mode only")
        phases = [(jnp.dtype(d), n) for d, n in schedule]
        if not phases:
            raise ValueError("precision_schedule must be non-empty")
        for d, n in phases[:-1]:
            if not (isinstance(n, int) and n > 0):
                raise ValueError(
                    "every phase but the last needs a positive iteration "
                    f"count, got {n!r}")
        if phases[-1][1] is not None and not (
                isinstance(phases[-1][1], int) and phases[-1][1] > 0):
            raise ValueError("last phase n_iters must be a positive int or "
                             "None (= run under the stop criterion)")
        fixed = sum(n for _, n in phases if n is not None)
        if fixed > int(max_iter):
            raise ValueError(
                f"precision_schedule phases request {fixed} iterations but "
                f"max_iter={max_iter} is a hard cap")

        def cast(dtype):
            # non-scalar floating leaves only: 0-d entries are counters /
            # flags (e.g. PGD's momentum counter is deliberately f32 — bf16
            # would freeze it at 256).  ONE jitted call (per-leaf eager
            # casts each pay a ~25 ms relay dispatch), memoized per dtype
            # (a fresh jit per phase would recompile every phase).
            self._mstate = _tree_cast_fn(jnp.dtype(dtype).name)(self._mstate)

        if warm_start:
            assert self._mstate, "warm_start=True requires a previous fit"
        else:
            self._mstate = self.m_init(**m_init_kwargs)
        used = 0
        self._dtype_lock = True   # segment enforces m_step dtype stability
        try:
            for i, (dtype, n) in enumerate(phases):
                last = i == len(phases) - 1
                if last and n is None:
                    budget = int(max_iter) - used
                    if budget <= 0:     # fixed phases consumed the cap
                        break
                else:
                    budget = int(n)
                cast(dtype)
                crit = stop_crit if (last and n is None) else MaxIter(budget)
                self.fit(mode=Mode.BLOCK, stop_crit=crit, max_iter=budget,
                         segment_size=segment_size,
                         track_objective=track_objective, warm_start=True)
                used += budget
        finally:
            self._dtype_lock = False
        return self

    def _fit_init(self, stop_crit, max_iter, segment_size, track_objective):
        stop = stop_crit if stop_crit is not None else self.default_stop_crit()
        self._astate["stop_crit"] = stop
        self._max_iter = int(max_iter)
        self._track_objective = bool(track_objective)
        cadence = [s for s in (self._writeback_rate, self._verbosity) if s]
        self._segment = int(segment_size or (min(cadence) if cadence else self._max_iter))
        if segment_size is None and stop.has_host_part():
            # wall-clock/carbon budgets only fire between segments: a
            # whole-solve segment would make them unenforceable (and on
            # remote TPU runtimes minutes-long programs can crash the
            # worker) — bound the segment so the host is consulted
            self._segment = min(self._segment, max(self._stop_rate, 50))
        if self._folder is not None:
            wb = pathlib.Path(self._folder).expanduser().resolve()
            wb.mkdir(parents=True, exist_ok=self._exist_ok)
        elif self._writeback_rate is not None:
            # one auto tempdir per solver (not per fit: parameter sweeps
            # would otherwise leak a dir + file handle per re-fit)
            wb = getattr(self, "_auto_wb_dir", None)
            if wb is None:
                wb = pathlib.Path(tempfile.mkdtemp(prefix="pyxu_tpu_"))
                self._auto_wb_dir = wb
        else:
            wb = None
        self._astate["wb_dir"] = wb
        # logger identity includes the workdir so a re-fit with a new folder
        # gets its own solver.log (not appended to the first run's)
        logger = logging.getLogger(
            f"pyxu_tpu.{type(self).__name__}.{id(self):x}.{wb or 'nolog'}")
        logger.setLevel(logging.DEBUG)
        prev = self._astate.get("logger")
        if prev is not None and prev is not logger:
            for h in list(prev.handlers):   # close the old fit's handlers
                h.close()
                prev.removeHandler(h)
        if wb is not None and not logger.handlers:
            fh = logging.FileHandler(wb / "solver.log")
            fh.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
            logger.addHandler(fh)
        if self._show_progress and not any(
            isinstance(h, logging.StreamHandler) for h in logger.handlers
        ):
            logger.addHandler(logging.StreamHandler())
        self._astate["logger"] = logger

    # ------------------------------------------------------- jitted segment --
    def _op_operands(self) -> dict:
        """Operator-valued attributes, passed to the jitted segment as pytree
        ARGUMENTS rather than closure constants — large operator data
        (NUFFT tap tables, explicit matrices) must not be baked into the
        compiled program."""
        from pyxu_tpu.abc.operator import Operator
        return {k: v for k, v in self.__dict__.items()
                if isinstance(v, Operator)}

    def update_operands(self, **ops):
        """Swap operator attributes with pytree-compatible replacements
        (e.g. ``slv.update_operands(f=new_loss)`` after new data arrives).

        In ``operand_mode="dynamic"`` operators are passed to the jitted
        segment as *arguments* (see :meth:`_op_operands`), so replacing one
        whose pytree structure — class, static aux, array shapes — matches
        the old keeps the compiled while-loop program and only re-feeds the
        new array leaves.  A structure mismatch still works but triggers a
        recompile (warned).  Solvers default to ``"static"`` (operands baked
        as constants — faster iterations); the first update_operands() call
        flips the instance to dynamic, costing one retrace at the next fit.
        """
        import warnings

        from pyxu_tpu.abc.operator import Operator
        if self._operand_mode == "static":
            # flipping the mode changes _hyper_key -> the next fit rebuilds
            # the segment with operands as arguments; swaps are free after
            self._operand_mode = "dynamic"
        for name, new in ops.items():
            attr = name if name in self.__dict__ else f"_{name}"
            old = self.__dict__.get(attr)
            assert isinstance(old, Operator), \
                f"{type(self).__name__} has no operator operand {name!r}"
            assert isinstance(new, Operator), new
            if (jax.tree_util.tree_structure(new)
                    != jax.tree_util.tree_structure(old)):
                warnings.warn(
                    f"update_operands({name}=...): pytree structure differs "
                    "from the current operand — the next fit() will recompile.")
            self.__dict__[attr] = new

    def _with_ops(self, ops: dict, fn, *args):
        """Run ``fn`` with self's operator attributes temporarily replaced by
        (traced) ``ops`` — trace-time only."""
        old = {k: self.__dict__[k] for k in ops}
        self.__dict__.update(ops)
        try:
            return fn(*args)
        finally:
            self.__dict__.update(old)

    def _build_segment(self, cstate0):
        stop = self._astate["stop_crit"]
        stop_rate = self._stop_rate
        track = self._track_objective

        def check(mstate, cstate, k):
            cstate, stop_now, metrics = stop.update(cstate, mstate, k)
            metrics = {"iteration": jnp.asarray(k, jnp.int32), **metrics}
            if track:
                obj = jnp.asarray(self.objective_func(mstate))
                metrics["objective"] = (
                    obj if obj.ndim == 0 else jnp.max(obj)
                ).astype(jnp.float32)
            return cstate, stop_now, metrics

        # metric structure (shapes/dtypes) without running anything:
        _, _, metric_shapes = jax.eval_shape(check, self._mstate, cstate0, jnp.asarray(0))
        self._metric_keys = tuple(metric_shapes.keys())
        n_rec = self._max_iter // stop_rate + 2

        def make_hist():
            return {
                name: jnp.zeros((n_rec,), dtype=sd.dtype)
                for name, sd in metric_shapes.items()
            }

        step = self.m_step
        if getattr(self, "_dtype_lock", False):
            # precision_schedule phases: operator data may live in a higher
            # precision than the iterate (f32 taps on bf16 state), so m_step
            # output leaves are cast back to their input dtypes — the
            # iterate stays at the phase dtype, counters stay f32.  No-op
            # (traced away) when m_step is already dtype-stable.
            def step(s, _orig=self.m_step):
                out = _orig(s)
                return jax.tree_util.tree_map(
                    lambda o, i: o.astype(i.dtype)
                    if hasattr(i, "dtype") else o, out, s)

        # optional temporal-blocking step: a solver may install
        # ``self._m_step2`` (ONE call advances ``self._m_step2_iters``
        # exact iterations — e.g. the fused-TV K-iteration Pallas kernel,
        # ops/fused_tv.py); the segment then runs stop_rate // k
        # multi-steps (+ single-step tail).  ``self._m_step2_on`` /
        # ``_m_step2_iters`` mirror the choice into _hyper_key so compiled
        # segments never alias across modes.
        step2 = getattr(self, "_m_step2", None)
        kk = int(getattr(self, "_m_step2_iters", 2) or 2)
        if step2 is not None and getattr(self, "_dtype_lock", False):
            def step2(s, _orig=self._m_step2):
                out = _orig(s)
                return jax.tree_util.tree_map(
                    lambda o, i: o.astype(i.dtype)
                    if hasattr(i, "dtype") else o, out, s)

        def _segment_loop(mstate, cstate, k, stopped, hist, hist_n, k_end):
            def cond(carry):
                mstate, cstate, k, stopped, hist, hist_n = carry
                return jnp.logical_and(jnp.logical_not(stopped), k < k_end)

            def body(carry):
                mstate, cstate, k, stopped, hist, hist_n = carry
                if step2 is not None and stop_rate >= kk:
                    mstate = jax.lax.fori_loop(
                        0, stop_rate // kk, lambda i, s: step2(s), mstate)
                    for _ in range(stop_rate % kk):
                        mstate = step(mstate)
                else:
                    mstate = jax.lax.fori_loop(
                        0, stop_rate, lambda i, s: step(s), mstate)
                k = k + stop_rate
                cstate, stop_now, metrics = check(mstate, cstate, k)
                hist = {
                    name: hist[name].at[hist_n].set(metrics[name])
                    for name in hist
                }
                return (mstate, cstate, k, stop_now, hist, hist_n + 1)

            out = jax.lax.while_loop(
                cond, body, (mstate, cstate, k, stopped, hist, hist_n))
            # (k, stopped, hist_n) packed into ONE tiny array: the host
            # fetches a single buffer per segment (each device->host read
            # costs a full relay round-trip, ~40 ms on tunneled TPUs)
            packed = jnp.stack([out[2].astype(jnp.int32),
                                out[3].astype(jnp.int32),
                                out[5].astype(jnp.int32)])
            return out + (packed,)

        if self._operand_mode == "static":
            # operator data baked as closure constants: XLA folds kernel
            # taps / step scalars into the fused loop body (~8% faster
            # iterations measured at 4K vs traced arguments)
            def seg_fn(ops, mstate, cstate, k, stopped, hist, hist_n, k_end):
                del ops
                return _segment_loop(mstate, cstate, k, stopped, hist,
                                     hist_n, k_end)
            return jax.jit(seg_fn, static_argnums=0), make_hist

        def seg_fn(ops, mstate, cstate, k, stopped, hist, hist_n, k_end):
            # operator data rides as traced arguments (see _op_operands)
            return self._with_ops(
                ops, _segment_loop, mstate, cstate, k, stopped, hist,
                hist_n, k_end)

        return jax.jit(seg_fn), make_hist

    def _warm_operand_caches(self):
        """Eagerly fill operator-held constant caches (e.g. the linear-
        functional chain gradient, arithmetic.py `_warm_grad_cache`) BEFORE
        the segment traces: inside the trace these constants ride opaque
        custom calls that XLA cannot hoist out of the iteration loop
        (measured: 1.2 ms/iter of repeated NUFFT adjoint in the CT PD3O
        workload — the entire per-iteration budget)."""
        from pyxu_tpu.abc.operator import Operator
        # EVERY distinct non-scalar floating dtype: ChainMixin.grad keys its
        # cache on the ITERATE dtype, and mixed-dtype states are the norm
        # (bf16 iterate + f32 counters) — warming only the widest dtype
        # would leave the bf16 entry to re-trace inside the loop body
        dts = {jnp.dtype(v.dtype).name
               for v in jax.tree_util.tree_leaves(self._mstate)
               if (hasattr(v, "dtype") and v.ndim > 0
                   and jnp.issubdtype(v.dtype, jnp.floating))}
        if not dts:
            return
        seen = set()

        def walk(op):
            if id(op) in seen:
                return
            seen.add(id(op))
            warm = getattr(op, "_warm_grad_cache", None)
            if warm is not None:
                for dt in sorted(dts):
                    warm(dt)
            for v in op.__dict__.values():
                if isinstance(v, Operator):
                    walk(v)
                elif isinstance(v, (list, tuple)):
                    for e in v:
                        if isinstance(e, Operator):
                            walk(e)

        for v in self.__dict__.values():
            if isinstance(v, Operator):
                walk(v)

    def _fit_run(self):
        stop = self._astate["stop_crit"]
        logger = self._astate["logger"]
        stop.host_init()
        self._warm_operand_caches()
        cstate = stop.init_state(self._mstate)
        # Re-fitting with identical (stop_crit, cadence, cap) reuses the
        # compiled segment — loop+MXU programs can take minutes to compile on
        # some backends, so never rebuild the jitted closure needlessly.
        # The stop criterion contributes its STRUCTURAL key, so inline
        # fresh-but-identical instances (MaxIter(200) per fit) still hit.
        key = (stop.cache_key(), self._stop_rate, self._max_iter,
               self._track_objective, self._hyper_key())
        cache = getattr(self, "_seg_cache", None)
        if cache is None or not isinstance(cache, dict):
            cache = self._seg_cache = {}
        hit = cache.get(key)
        if hit is not None:
            seg_fn, make_hist = hit
        else:
            seg_fn, make_hist = self._build_segment(cstate)
            if len(cache) >= 8:     # bounded: alternating-phase fits
                cache.pop(next(iter(cache)))    # (precision_schedule) must
            cache[key] = (seg_fn, make_hist)    # not rebuild per phase
        hist = make_hist()
        ops = None if self._operand_mode == "static" else self._op_operands()
        host_records = []   # (history row, host metric dict) per segment
        # host mirrors of (k, hist_n), synced via `packed` — int(k) here
        # would be a SECOND device fetch per segment (~40 ms on relays)
        k_host, histn_host = 0, 0
        mstate, k, stopped, hist_n = self._mstate, jnp.asarray(0), jnp.asarray(False), jnp.asarray(0)
        while True:
            k_end = min(k_host + self._segment, self._max_iter)
            try:
                # dispatch is async: a runtime failure inside the segment
                # surfaces at the first blocking host read below, so the
                # sync must be INSIDE the guard for the last good state to
                # survive (reference crash-proofing: abc/solver.py:653-663).
                *new_state, packed = seg_fn(
                    ops, mstate, cstate, k, stopped, hist, hist_n, jnp.asarray(k_end)
                )
                # --- host round-trip: ONE packed fetch per segment ---
                k_host, stopped_flag, histn_host = (
                    int(v) for v in np.asarray(jax.device_get(packed)))
                stopped_host = bool(stopped_flag)
            except Exception:
                import traceback
                if logger is not None:
                    logger.error("solver segment raised; stopping fit:\n%s",
                                 traceback.format_exc())
                break
            mstate, cstate, k, stopped, hist, hist_n = new_state
            if logger is not None and (self._verbosity or self._show_progress):
                idx = max(histn_host - 1, 0)
                msg = ", ".join(
                    f"{name}={float(jax.device_get(hist[name][idx])):.4e}"
                    for name in self._metric_keys if name != "iteration"
                )
                logger.info("[%d] %s", k_host, msg)
            if self._writeback_rate is not None:
                self._mstate = mstate
                self.writeback()
            # latch host-side firing into the device carry so composed
            # criteria (& / |) see it on the next segment
            cstate = stop.refresh_host(cstate)
            hm = stop.host_metrics()
            if hm:
                host_records.append((max(histn_host - 1, 0), hm))
            host_stop = stop.host_check()
            if stopped_host or host_stop or k_host >= self._max_iter:
                break
            if self._astate["active"] is not None and not self._astate["active"].is_set():
                break
        self._mstate = mstate
        # history assembly is LAZY: the column fetch is a host round-trip
        # (~40 ms on tunneled TPUs) that hot re-fit loops never look at —
        # stats()/writeback() materialize it on first access
        self._history = None
        self._history_pending = (hist, histn_host, host_records)
        if self._astate["wb_dir"] is not None:
            try:
                self.writeback()
            except Exception:
                import traceback
                if logger is not None:
                    logger.error("history/writeback failed:\n%s",
                                 traceback.format_exc())

    def _ensure_history(self):
        pending = getattr(self, "_history_pending", None)
        if self._history is None and pending is not None:
            try:
                self._history = self._assemble_history(*pending)
            except Exception:
                import traceback
                logger = self._astate.get("logger")
                if logger is not None:
                    logger.error("history assembly failed:\n%s",
                                 traceback.format_exc())
            self._history_pending = None
        return self._history

    def _assemble_history(self, hist, n, host_records=None):
        names = list(self._metric_keys)
        # one device_get over the whole pytree: the async copies are all
        # issued before the first blocking wait (one relay round-trip
        # instead of one per metric column)
        fetched = jax.device_get({name: hist[name][:n] for name in names})
        arrays = {name: np.asarray(fetched[name]) for name in names}
        # host-side criterion metrics (duration / carbon_kg, reference
        # opt/stop.py records them via info()) — one sample per segment,
        # NaN elsewhere
        host_cols = {}
        for idx, hm in (host_records or []):
            for hname, hval in hm.items():
                col = host_cols.setdefault(
                    hname, np.full(n, np.nan, np.float64))
                if 0 <= idx < n:
                    col[idx] = float(hval)
        arrays.update(host_cols)
        names = names + [h for h in host_cols if h not in names]
        dtypes = [(name, arrays[name].dtype) for name in names]
        out = np.empty(n, dtype=dtypes)
        for name in names:
            out[name] = arrays[name]
        return out

    # -------------------------------------------------------- MANUAL mode --
    def steps(self, n: int = None):
        """Generator of mstates, one (jitted) iteration at a time
        (reference: abc/solver.py:330-360)."""
        stop = self._astate["stop_crit"]
        stop.host_init()
        cstate = stop.init_state(self._mstate)

        # MANUAL steps reuse a cached jitted step like BLOCK segments do
        # (a fresh @jax.jit closure per call would recompile every session)
        key = ("manual", stop.cache_key(), self._hyper_key())
        cached = getattr(self, "_step_cache", None)
        if cached is not None and cached[0] == key:
            one = cached[1]
        else:
            @jax.jit
            def one(ops, mstate, cstate, k):
                def run():
                    m = self.m_step(mstate)
                    cs, stop_now, metrics = stop.update(cstate, m, k + 1)
                    return m, cs, stop_now, metrics
                return self._with_ops(ops, run)

            self._step_cache = (key, one)

        ops = self._op_operands()
        k = 0
        records = []
        while (n is None or k < n) and k < self._max_iter:
            self._mstate, cstate, stop_now, metrics = one(ops, self._mstate, cstate, jnp.asarray(k))
            k += 1
            records.append({m: np.asarray(jax.device_get(v)) for m, v in
                            {"iteration": jnp.asarray(k), **metrics}.items()})
            yield self._mstate
            if bool(stop_now) or stop.host_check():
                break
        self._history = _records_to_struct(records)
        self._history_pending = None

    # --------------------------------------------------------- ASYNC mode --
    def busy(self) -> bool:
        w = self._astate["worker"]
        return w is not None and w.is_alive()

    def stop(self):
        """Politely interrupt an ASYNC fit at the next segment boundary
        (reference: abc/solver.py:361-388)."""
        if self._astate["active"] is not None:
            self._astate["active"].clear()
        w = self._astate["worker"]
        if w is not None:
            w.join()

    # ------------------------------------------------------------- results --
    def solution(self):
        return self._mstate.get("x")

    def stats(self):
        """(mstate dict, history structured array) — reference abc/solver.py:389-412."""
        return self._mstate, self._ensure_history()

    def writeback(self):
        """Checkpoint log-variables + history (reference: abc/solver.py:562-570).

        ``checkpoint_backend="npz"``: device->host fetch + ``data.npz``.
        ``checkpoint_backend="orbax"``: orbax PyTree checkpoint of the FULL
        math state (sharded-array aware, no host gather of the pytree into
        one process) + history sidecar; preferred for large / multi-chip
        states.
        """
        wb = self._astate["wb_dir"]
        if wb is None:
            return
        hist = self._ensure_history()
        if self._ckpt_backend == "orbax":
            import orbax.checkpoint as ocp
            with ocp.PyTreeCheckpointer() as ckptr:
                ckptr.save(pathlib.Path(wb) / "ckpt", self._mstate, force=True)
            if hist is not None:
                np.savez(wb / "history.npz", history=hist)
            return
        data = {f"mstate_{kk}": np.asarray(jax.device_get(vv))
                for kk, vv in self._mstate.items() if kk in self._log_var or not self._log_var}
        if hist is not None:
            data["history"] = hist
        np.savez(wb / "data.npz", **data)

    @property
    def workdir(self):
        return self._astate["wb_dir"]

    @property
    def logfile(self):
        """Path of the per-fit log file (reference: abc/solver.py:424-432);
        None when no workdir is configured."""
        wd = self.workdir
        return None if wd is None else pathlib.Path(wd) / "solver.log"

    @property
    def datafile(self):
        """Path of the checkpoint file written by :meth:`writeback`
        (reference: abc/solver.py:434-443).  For the orbax backend this is
        the ``ckpt/`` directory instead of ``data.npz``."""
        wd = self.workdir
        if wd is None:
            return None
        wd = pathlib.Path(wd)
        return wd / ("ckpt" if self._ckpt_backend == "orbax" else "data.npz")

    @staticmethod
    def read_checkpoint(folder):
        """Load a ``writeback()`` checkpoint: returns (mstate dict, history).

        Auto-detects the backend: an orbax ``ckpt/`` directory is restored
        with orbax (arrays come back device-resident); otherwise ``data.npz``.
        The reference has no load path (resume is manual, SURVEY §5); here
        ``fit(x0=mstate["x"], ...)`` resumes from the stored iterate.
        """
        folder = pathlib.Path(folder)
        if (folder / "ckpt").exists():
            import orbax.checkpoint as ocp
            with ocp.PyTreeCheckpointer() as ckptr:
                mstate = ckptr.restore(folder / "ckpt")
            history = None
            if (folder / "history.npz").exists():
                history = np.load(folder / "history.npz")["history"]
            return mstate, history
        data = np.load(folder / "data.npz")
        mstate = {k[len("mstate_"):]: data[k] for k in data.files
                  if k.startswith("mstate_")}
        history = data["history"] if "history" in data.files else None
        return mstate, history


def _records_to_struct(records):
    if not records:
        return None
    names = list(records[0].keys())
    dtypes = [(n, np.asarray(records[0][n]).dtype) for n in names]
    out = np.empty(len(records), dtype=dtypes)
    for i, r in enumerate(records):
        for n in names:
            out[i][n] = r[n]
    return out
