"""MCMC samplers for uncertainty quantification.

Reference: src/pyxu/experimental/sampler/_sampler.py:105-488 (`_Sampler`
generator protocol :105, `ULA` unadjusted Langevin :127, `MYULA`
Moreau-Yosida ULA :381).

TPU design: the sample chain is a pure ``(state, key) -> (state, key)``
kernel; ``samples()`` yields device arrays one step at a time (generator
protocol like the reference), and ``run(n)`` draws n samples inside one
``lax.scan`` for device-resident bulk sampling.
"""

from __future__ import annotations

import math as _math

import jax
import jax.numpy as jnp

__all__ = ["Sampler", "_Sampler", "ULA", "MYULA"]


class Sampler:
    """Generator protocol (reference: _sampler.py:105-125)."""

    def _step(self, x, key):
        raise NotImplementedError

    def samples(self, x0, seed: int = 0):
        """Infinite generator of samples (one jitted step per draw)."""
        key = jax.random.PRNGKey(seed)
        x = jnp.asarray(x0)
        step = jax.jit(self._step)
        while True:
            key, sub = jax.random.split(key)
            x = step(x, sub)
            yield x

    def run(self, x0, n: int, seed: int = 0, thin: int = 1, burn_in: int = 0):
        """Draw ``n`` samples in ONE compiled scan (thin/burn-in on device).

        The jitted chain is cached per (thin, burn_in, n): repeated runs
        with the same schedule reuse the compiled scan (compiles through
        the remote backend are expensive — CLAUDE.md)."""
        key = jax.random.PRNGKey(seed)
        x0 = jnp.asarray(x0)
        cache = getattr(self, "_chain_cache", None)
        if cache is None:
            cache = self._chain_cache = {}
        fn = cache.get((thin, burn_in, n))
        if fn is None:
            def chain(x0, key):
                def body(carry, k):
                    x, = carry
                    keys = jax.random.split(k, thin)
                    for i in range(thin):
                        x = self._step(x, keys[i])
                    return (x,), x

                def body_burn(carry, k):
                    # burn-in: no per-step output (stacking burn_in full
                    # states would materialize an (n_burn, *shape) array)
                    new, _ = body(carry, k)
                    return new, None

                keys = jax.random.split(key, burn_in + n)
                if burn_in:
                    (xb,), _ = jax.lax.scan(body_burn, (x0,), keys[:burn_in])
                else:
                    xb = x0
                (_,), samples = jax.lax.scan(body, (xb,), keys[burn_in:])
                return samples

            fn = cache[(thin, burn_in, n)] = jax.jit(chain)
        return fn(x0, key)


class ULA(Sampler):
    r"""Unadjusted Langevin: x+ = x - g ∇F(x) + sqrt(2 g) w
    (reference: _sampler.py:127-380; default g from diff-Lipschitz :300-330).
    """

    def __init__(self, f, gamma: float = None):
        self._f = f
        if gamma is None:
            beta = f.diff_lipschitz
            if not _math.isfinite(beta) or beta == 0:
                beta = f.estimate_diff_lipschitz()
            gamma = 0.98 / beta
        self._gamma = float(gamma)

    @property
    def gamma(self) -> float:
        return self._gamma

    def _step(self, x, key):
        g = self._gamma
        w = jax.random.normal(key, x.shape, x.dtype)
        return x - g * self._f.grad(x) + _math.sqrt(2 * g) * w

    def objective_func(self, x):
        return self._f.apply(x)


class MYULA(ULA):
    r"""ULA on the Moreau-Yosida smoothing of f + g
    (reference: _sampler.py:381-488): drift uses
    ∇f(x) + (x - prox_{lambda g}(x)) / lambda.
    """

    def __init__(self, f=None, g=None, gamma: float = None, lamb: float = None):
        from pyxu_tpu.operator.map.base import ConstantValued
        assert f is not None or g is not None
        dim_shape = (f or g).dim_shape
        if f is None:
            f = ConstantValued(dim_shape, (), 0.0)
        self._g = g
        beta_f = f.diff_lipschitz if _math.isfinite(f.diff_lipschitz) else \
            f.estimate_diff_lipschitz()
        if lamb is None:
            lamb = 2.0 if beta_f == 0 else min(2.0, 1.0 / beta_f)
        self._lamb = float(lamb)
        beta = beta_f + 1.0 / self._lamb
        if gamma is None:
            gamma = 0.98 / beta
        self._f = f
        self._gamma = float(gamma)

    def _step(self, x, key):
        g = self._gamma
        drift = self._f.grad(x)
        if self._g is not None:
            drift = drift + (x - self._g.prox(x, self._lamb)) / self._lamb
        w = jax.random.normal(key, x.shape, x.dtype)
        return x - g * drift + _math.sqrt(2 * g) * w

    def objective_func(self, x):
        """Negative log-target F + G^lambda — includes the Moreau-Yosida
        envelope of g (reference _sampler.py:476-478), not just f."""
        val = self._f.apply(x)
        if self._g is not None:
            p = self._g.prox(x, self._lamb)
            d = (x - p).ravel()
            val = val + self._g.apply(p) + (d @ d) / (2.0 * self._lamb)
        return val


#: Reference-private alias (``pyxu.experimental.sampler._Sampler``,
#: _sampler.py:105-125): plugin code subclasses the generator protocol
#: under this name.
_Sampler = Sampler
