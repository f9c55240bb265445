"""Composable stopping criteria, device-resident.

Reference: src/pyxu/opt/stop.py:29-396 (MaxIter, ManualStop, MaxDuration,
MaxCarbon, Memorize, AbsError, RelError) and the StoppingCriterion protocol
(src/pyxu/abc/solver.py:37-116).

TPU re-design: the reference calls ``pxu.compute()`` inside Abs/RelError which
forces a device->host sync every ``stop_rate`` iterations (opt/stop.py:258-296).
Here criteria are split into a *device part* — ``init_state/update`` pure
functions folded into the solver's ``lax.while_loop`` predicate, so the loop
never leaves the chip — and an optional *host part* (``host_check``, e.g.
wall-clock / carbon budgets) evaluated once per jitted segment.

Criteria compose with ``&`` (stop when both) and ``|`` (stop when either),
like the reference (abc/solver.py:95-116).
"""

from __future__ import annotations

import datetime as dt
import time

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "StoppingCriterion",
    "MaxIter",
    "ManualStop",
    "MaxDuration",
    "MaxCarbon",
    "Memorize",
    "AbsError",
    "RelError",
]


class StoppingCriterion:
    """Device-side protocol: ``init_state(mstate)`` builds a carry pytree;
    ``update(cstate, mstate, k)`` returns ``(cstate', stop_bool, metrics)``
    with ``stop_bool`` a jnp scalar and ``metrics`` a dict of jnp scalars
    recorded into the solver history."""

    def init_state(self, mstate) -> typ_any:
        return ()

    def update(self, cstate, mstate, k):
        return cstate, jnp.asarray(False), {}

    # host-side part, evaluated between jitted segments
    def host_init(self) -> None:
        pass

    def host_check(self) -> bool:
        return False

    def refresh_host(self, cstate):
        """Latch host-side firing into the device carry at segment
        boundaries (used by composed criteria so e.g.
        ``MaxDuration(...) & AbsError(...)`` combines a host-only with a
        device-only condition correctly)."""
        return cstate

    def host_metrics(self) -> dict:
        return {}

    def has_host_part(self) -> bool:
        """True when the criterion (or a sub-criterion) can only fire on the
        host (wall-clock / carbon budgets): the solver bounds its segment
        size so the budget is actually consulted mid-solve."""
        return False

    def cache_key(self):
        """Structural identity for the solver's compiled-segment cache: two
        criteria with equal keys trace to the same device program, so a
        re-fit with a fresh-but-identical instance (e.g. ``MaxIter(200)``
        built inline per fit) reuses the compiled while-loop instead of
        recompiling.  Default: object identity (always safe)."""
        return id(self)

    # -- reference-protocol adapter (eager, host-side) ----------------------
    # The reference's StoppingCriterion API is ``clear() / stop(state) /
    # info()`` evaluated on host every stop-check (reference:
    # abc/solver.py:37-95).  The solver engine here uses the device
    # protocol above; these adapters run the same criterion eagerly so
    # reference-style driver loops port unchanged.
    def clear(self) -> None:
        """Reset state before a fresh fit (reference: abc/solver.py:58-66)."""
        self.host_init()
        self._eager = {"cstate": None, "k": 0, "metrics": {}}

    def stop(self, state: dict) -> bool:
        """Eagerly evaluate the criterion on a math-state dict
        (reference: abc/solver.py:68-81)."""
        if getattr(self, "_eager", None) is None:
            self.clear()
        e = self._eager
        if e["cstate"] is None:
            e["cstate"] = self.init_state(state)
        cs = self.refresh_host(e["cstate"])
        cs, s, m = self.update(cs, state, e["k"])
        e["cstate"] = cs
        e["k"] += 1
        e["metrics"] = {k: np.asarray(v) for k, v in m.items()}
        e["metrics"].update(self.host_metrics())
        return bool(s) or bool(self.host_check())

    def info(self) -> dict:
        """Stats of the last :meth:`stop` call, one scalar per history column
        (reference: abc/solver.py:83-94)."""
        e = getattr(self, "_eager", None) or {"metrics": {}}
        return {k: float(np.asarray(v)) for k, v in e["metrics"].items()}

    def __and__(self, other: "StoppingCriterion") -> "StoppingCriterion":
        return _Combined(self, other, all_of=True)

    def __or__(self, other: "StoppingCriterion") -> "StoppingCriterion":
        return _Combined(self, other, all_of=False)


typ_any = object  # typing alias kept local


class _Combined(StoppingCriterion):
    """A leaf "fires" when its device stop OR its (latched) host check is
    true; `&`/`|` combine per-leaf firing.  Host firing is folded into the
    device carry once per segment via :meth:`refresh_host`, so mixed
    host-only / device-only compositions evaluate in one place (the
    reference evaluates everything host-side, abc/solver.py:95-116)."""

    def __init__(self, lhs, rhs, all_of: bool):
        self._lhs, self._rhs, self._all = lhs, rhs, all_of

    def init_state(self, mstate):
        return (self._lhs.init_state(mstate), self._rhs.init_state(mstate),
                jnp.zeros(2, dtype=bool))

    def update(self, cstate, mstate, k):
        cl, sl, ml = self._lhs.update(cstate[0], mstate, k)
        cr, sr, mr = self._rhs.update(cstate[1], mstate, k)
        host_flags = cstate[2]
        fl = jnp.logical_or(sl, host_flags[0])
        fr = jnp.logical_or(sr, host_flags[1])
        stop = jnp.logical_and(fl, fr) if self._all else jnp.logical_or(fl, fr)
        # deterministic disambiguation: identical metric names from both
        # sides (e.g. two RelError[x] legs) must not silently overwrite
        metrics = dict(ml)
        for name, val in mr.items():
            while name in metrics:
                name = name + "'"
            metrics[name] = val
        return (cl, cr, host_flags), stop, metrics

    def host_init(self):
        self._lhs.host_init()
        self._rhs.host_init()

    def host_check(self) -> bool:
        hl, hr = self._lhs.host_check(), self._rhs.host_check()
        return (hl and hr) if self._all else (hl or hr)

    def refresh_host(self, cstate):
        cl = self._lhs.refresh_host(cstate[0])
        cr = self._rhs.refresh_host(cstate[1])
        flags = jnp.asarray([bool(self._lhs.host_check()),
                             bool(self._rhs.host_check())])
        return (cl, cr, flags)

    def host_metrics(self) -> dict:
        return {**self._lhs.host_metrics(), **self._rhs.host_metrics()}

    def has_host_part(self) -> bool:
        return self._lhs.has_host_part() or self._rhs.has_host_part()

    def cache_key(self):
        return (type(self), self._lhs.cache_key(), self._rhs.cache_key(),
                self._all)


class MaxIter(StoppingCriterion):
    """Stop after n iterations (reference: opt/stop.py:29-70)."""

    def __init__(self, n: int):
        assert n > 0
        self._n = int(n)

    def update(self, cstate, mstate, k):
        return cstate, k >= self._n, {"N_iter": jnp.asarray(k, jnp.int32)}

    def cache_key(self):
        return (type(self), self._n)


class ManualStop(StoppingCriterion):
    """Never stops on its own (reference: opt/stop.py:71-92); for ASYNC fits
    interrupted by the user."""

    def cache_key(self):
        return (type(self),)


class MaxDuration(StoppingCriterion):
    """Wall-clock budget, host-side (reference: opt/stop.py:93-125)."""

    def __init__(self, t: dt.timedelta):
        self._budget = t.total_seconds() if isinstance(t, dt.timedelta) else float(t)
        self._t0 = None

    def host_init(self):
        self._t0 = time.monotonic()

    def host_check(self) -> bool:
        return (time.monotonic() - self._t0) >= self._budget

    def host_metrics(self) -> dict:
        return {"duration": time.monotonic() - (self._t0 or time.monotonic())}

    def has_host_part(self) -> bool:
        return True

    def cache_key(self):
        # host-only criterion: the traced device program does not depend on
        # the budget value
        return (type(self),)


class MaxCarbon(MaxDuration):
    """CO2-equivalent budget (reference: opt/stop.py:126-178 via codecarbon).

    Without codecarbon (not in the TPU image) we integrate a constant
    chip-power model: kgCO2 = watts * hours * intensity / 1000.
    """

    def __init__(self, budget_kg: float, watts: float = 200.0,
                 intensity_g_per_kwh: float = 475.0):
        seconds = budget_kg / (watts * intensity_g_per_kwh / 1000.0 / 1000.0 / 3600.0)
        super().__init__(seconds)
        self._watts = watts
        self._intensity = intensity_g_per_kwh

    def host_metrics(self) -> dict:
        el = time.monotonic() - (self._t0 or time.monotonic())
        kg = self._watts * (el / 3600.0) * self._intensity / 1e6
        return {"carbon_kg": kg}


class Memorize(StoppingCriterion):
    """Record a variable every stop-check; never stops
    (reference: opt/stop.py:181-221).  Non-scalar variables are recorded by
    their L2 norm."""

    def __init__(self, var: str = "x"):
        self._var = var

    def update(self, cstate, mstate, k):
        v = jnp.asarray(mstate[self._var])
        val = v if v.ndim == 0 else jnp.linalg.norm(v.ravel())
        return cstate, jnp.asarray(False), {f"Memorize[{self._var}]": val}

    def cache_key(self):
        return (type(self), self._var)


def _batched_norm(v, rank: int, ord):
    """Per-batch-element norm over the trailing ``rank`` axes."""
    v = jnp.asarray(v)
    if not 0 <= rank <= v.ndim:
        raise ValueError(
            f"rank={rank} incompatible with a variable of ndim {v.ndim}: "
            "rank counts the trailing axes that form one solution point "
            "(e.g. rank=2 for an (H, W) image, rank=3 for an (H, W, 2) "
            "complex-as-real view).")
    axes = tuple(range(v.ndim - rank, v.ndim))
    if ord == 2:
        return jnp.sqrt(jnp.sum(v * v, axis=axes))
    if ord in (jnp.inf, np.inf, "inf"):
        return jnp.max(jnp.abs(v), axis=axes)
    if ord == 1:
        return jnp.sum(jnp.abs(v), axis=axes)
    return jnp.sum(jnp.abs(v) ** ord, axis=axes) ** (1.0 / ord)


class AbsError(StoppingCriterion):
    """Stop when ||f(var)|| <= eps (reference: opt/stop.py:222-299).

    ``rank`` = trailing axes forming one solution (leading axes = batch);
    ``satisfy_all`` controls all-vs-any over the batch.
    """

    def __init__(self, eps: float, var: str = "x", rank: int = None, f=None,
                 norm=2, satisfy_all: bool = True):
        self._eps = float(eps)
        self._var = var
        self._rank = rank
        self._f = f
        self._norm = norm
        self._all = satisfy_all

    def update(self, cstate, mstate, k):
        v = jnp.asarray(mstate[self._var])
        if self._f is not None:
            v = self._f(v)
        rank = v.ndim if self._rank is None else self._rank
        val = _batched_norm(v, rank, self._norm)
        stop = jnp.all(val <= self._eps) if self._all else jnp.any(val <= self._eps)
        return cstate, stop, {f"AbsError[{self._var}]": jnp.max(val)}

    def cache_key(self):
        if self._f is not None:  # arbitrary callable: identity only
            return id(self)
        return (type(self), self._eps, self._var, self._rank, self._norm,
                self._all)


class RelError(StoppingCriterion):
    """Stop when ||x_k - x_{k-1}|| <= eps ||x_{k-1}||
    (reference: opt/stop.py:300-396)."""

    def __init__(self, eps: float, var: str = "x", rank: int = None, f=None,
                 norm=2, satisfy_all: bool = True):
        self._eps = float(eps)
        self._var = var
        self._rank = rank
        self._f = f
        self._norm = norm
        self._all = satisfy_all

    def init_state(self, mstate):
        v = jnp.asarray(mstate[self._var])
        if self._f is not None:
            v = self._f(v)
        # explicit first-iteration flag: a NaN sentinel in `prev` would be
        # indistinguishable from a DIVERGED iterate (NaN x), which must not
        # disable the criterion and burn the full max_iter on device
        return {"prev": jnp.zeros_like(v), "have": jnp.asarray(False)}

    def update(self, cstate, mstate, k):
        v = jnp.asarray(mstate[self._var])
        if self._f is not None:
            v = self._f(v)
        rank = v.ndim if self._rank is None else self._rank
        prev = cstate["prev"]
        num = _batched_norm(v - prev, rank, self._norm)
        den = _batched_norm(prev, rank, self._norm)
        val = num / jnp.maximum(den, jnp.finfo(v.dtype).tiny)
        valid = cstate["have"]
        stop_elem = val <= self._eps
        stop = jnp.all(stop_elem) if self._all else jnp.any(stop_elem)
        stop = jnp.logical_and(stop, valid)
        # a diverged iterate (NaN/Inf) can never satisfy the tolerance —
        # stop instead of burning the remaining max_iter on device
        diverged = jnp.logical_not(jnp.all(jnp.isfinite(v)))
        stop = jnp.logical_or(stop, jnp.logical_and(diverged, valid))
        metric = jnp.where(valid, jnp.max(val), jnp.inf)
        return ({"prev": v, "have": jnp.asarray(True)}, stop,
                {f"RelError[{self._var}]": metric})

    def cache_key(self):
        if self._f is not None:  # arbitrary callable: identity only
            return id(self)
        return (type(self), self._eps, self._var, self._rank, self._norm,
                self._all)
