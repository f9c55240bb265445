"""Welford-style online statistics over sample streams.

Reference: src/pyxu/experimental/sampler/statistics.py:103-222
(`OnlineMoment` :103, `OnlineCenteredMoment` :126, `OnlineVariance` :174,
`OnlineStd`, `OnlineSkewness`, `OnlineKurtosis` :174-222) with a stat
algebra (`+,-,*,/,**` compose statistics).

These are **host-driven streaming** statistics (like the reference): state
lives on the Python object and ``update`` must be fed one concrete device
array per sample, outside ``jit``.  Calling ``update`` under a trace would
silently freeze the Python-side counters at trace time, so it raises
instead; to accumulate inside a compiled loop, carry (n, acc/moments) in
the scan state yourself and feed the totals to numpy afterwards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _check_concrete(x):
    if isinstance(x, jax.core.Tracer):
        raise RuntimeError(
            "OnlineStat.update() called under jit/scan tracing: the "
            "Python-side counters would freeze at trace time and every "
            "result would be wrong. Call update() eagerly (one concrete "
            "sample at a time), or carry the accumulators in your own "
            "scan state.")
    return x

__all__ = [
    "OnlineStat",
    "OnlineMoment",
    "OnlineCenteredMoment",
    "OnlineVariance",
    "OnlineStd",
    "OnlineSkewness",
    "OnlineKurtosis",
]


class OnlineStat:
    """Streaming statistic: ``update(x)`` folds one sample, ``stat()``
    returns the current value.  Compose with +,-,*,/,** like the reference
    (statistics.py:30-102)."""

    def update(self, x):
        raise NotImplementedError

    def stat(self):
        raise NotImplementedError

    def __add__(self, other):
        return _BinStat(self, other, jnp.add)

    def __sub__(self, other):
        return _BinStat(self, other, jnp.subtract)

    def __mul__(self, other):
        return _BinStat(self, other, jnp.multiply)

    def __truediv__(self, other):
        return _BinStat(self, other, jnp.divide)

    def __pow__(self, k):
        return _PowStat(self, k)


class _BinStat(OnlineStat):
    def __init__(self, lhs, rhs, fn):
        self._l, self._r, self._fn = lhs, rhs, fn

    def update(self, x):
        lv = self._l.update(x) if isinstance(self._l, OnlineStat) else self._l
        rv = self._r.update(x) if isinstance(self._r, OnlineStat) else self._r
        return self._fn(lv, rv)

    def stat(self):
        lv = self._l.stat() if isinstance(self._l, OnlineStat) else self._l
        rv = self._r.stat() if isinstance(self._r, OnlineStat) else self._r
        return self._fn(lv, rv)


class _PowStat(OnlineStat):
    def __init__(self, base, k):
        self._b, self._k = base, k

    def update(self, x):
        return self._b.update(x) ** self._k

    def stat(self):
        return self._b.stat() ** self._k


class OnlineMoment(OnlineStat):
    """E[x^k] (reference: statistics.py:103-125)."""

    def __init__(self, order: int = 1):
        self._k = int(order)
        self._n = 0
        self._acc = None

    def update(self, x):
        x = _check_concrete(jnp.asarray(x))
        v = x ** self._k
        self._acc = v if self._acc is None else self._acc + v
        self._n += 1
        return self._acc / self._n

    def stat(self):
        if self._acc is None:
            raise RuntimeError("OnlineMoment.stat() before any update()")
        return self._acc / self._n


class OnlineCenteredMoment(OnlineStat):
    """E[(x - mean)^k], k in {2, 3, 4}, via the exact single-pass Pebay
    recurrences (reference: statistics.py:126-173 uses the same family)."""

    def __init__(self, order: int = 2):
        assert 2 <= order <= 4
        self._k = int(order)
        self._n = 0
        self._mean = None
        self._M2 = self._M3 = self._M4 = None

    def update(self, x):
        x = _check_concrete(jnp.asarray(x))
        if self._mean is None:
            z = jnp.zeros_like(x)
            self._mean, self._M2, self._M3, self._M4 = z, z, z, z
        n1 = self._n
        self._n = n = n1 + 1
        delta = x - self._mean
        d_n = delta / n
        d_n2 = d_n * d_n
        term1 = delta * d_n * n1
        self._mean = self._mean + d_n
        if self._k >= 4:
            self._M4 = (self._M4 + term1 * d_n2 * (n * n - 3 * n + 3)
                        + 6 * d_n2 * self._M2 - 4 * d_n * self._M3)
        if self._k >= 3:
            self._M3 = self._M3 + term1 * d_n * (n - 2) - 3 * d_n * self._M2
        self._M2 = self._M2 + term1
        return self.stat()

    def stat(self):
        if self._n == 0:
            raise RuntimeError(
                "OnlineCenteredMoment.stat() before any update()")
        M = {2: self._M2, 3: self._M3, 4: self._M4}[self._k]
        return M / self._n


def OnlineVariance():
    """reference: statistics.py:174-189"""
    return OnlineCenteredMoment(2)


def OnlineStd():
    """reference: statistics.py:190-199"""
    return OnlineCenteredMoment(2) ** 0.5


def OnlineSkewness():
    """E[(x-mu)^3] / sigma^3 (reference: statistics.py:200-210)."""
    return OnlineCenteredMoment(3) / (OnlineCenteredMoment(2) ** 1.5)


def OnlineKurtosis():
    """E[(x-mu)^4] / sigma^4 (reference: statistics.py:211-222)."""
    return OnlineCenteredMoment(4) / (OnlineCenteredMoment(2) ** 2)
