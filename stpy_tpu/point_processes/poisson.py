"""Inhomogeneous Poisson point-process simulator.

Parity: stpy/point_processes/poisson.py:9 (PoissonPointProcess: rate-volume
integration, discretized multinomial sampling :51-61, thinning :74-108,
visualization) and seasonal_point_process.py:7.

TPU rewrite: rate integrals use fixed Gauss-Legendre tensor quadrature under
jit (the reference calls scipy.integrate.quad/dblquad per set), sampling uses
jax.random.poisson + categorical with an explicit key.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from stpy_tpu.config import default_dtype


class PoissonPointProcess:
    """Ground-truth process with a known rate function λ(x)."""

    def __init__(self, d=1, B=1.0, b=0.2, rate=None, rate_volume=None):
        self.B = B
        self.d = d
        self.b = b
        self.rate = rate if rate is not None else self.rate_default
        self.rate_volume_f = rate_volume
        self.exact = True

    def rate_default(self, x, dt=1.0):
        x = jnp.asarray(x)
        val = self.B * jnp.sum(
            jnp.exp(-(x + 1)) * jnp.sin(2 * x * jnp.pi) ** 2, axis=1
        ).reshape(-1, 1)
        return (val + self.b) * dt

    def rate_volume(self, S, dt=1.0, rate=None, n_quad=64):
        """∫_S λ — Gauss-Legendre tensor quadrature (jit-compatible)."""
        if self.rate_volume_f is not None:
            return float(self.rate_volume_f(S)) * dt
        rate = rate if rate is not None else self.rate
        w, nodes = S.return_legendre_discretization(n_quad)
        return float(jnp.sum(w * rate(nodes).reshape(-1))) * dt

    def rate_sets(self, Sets, dt=1.0):
        return [self.rate_volume(S, dt=dt) for S in Sets]

    def sample_discretized(self, key, S, dt, n=50):
        """Poisson count + categorical placement on a discretization grid
        (parity: poisson.py:51-61)."""
        lam = max(self.rate_volume(S, dt), 0.0)
        k1, k2 = jax.random.split(key)
        count = int(jax.random.poisson(k1, lam))
        if count == 0:
            return None
        x = S.return_discretization(n)
        r = jnp.maximum(self.rate(x).reshape(-1) * dt, 0.0)
        idx = jax.random.categorical(
            k2, jnp.log(r + 1e-30), shape=(count,)
        )
        return x[idx, :]

    def sample_thinning(self, key, S, dt=1.0, rate=None):
        """Rejection (thinning) sampler (parity: poisson.py:74-108)."""
        rate = rate if rate is not None else self.rate
        lam_bar = (self.B + self.b) * dt  # upper bound on rate
        lam_tot = lam_bar * S.volume()
        k1, k2, k3 = jax.random.split(key, 3)
        n_prop = int(jax.random.poisson(k1, lam_tot))
        if n_prop == 0:
            return None
        props = S.uniform_sample(k2, n_prop)
        u = jax.random.uniform(k3, (n_prop,), default_dtype())
        acc = u < (rate(props).reshape(-1) * dt / lam_bar)
        pts = props[acc]
        return pts if pts.shape[0] > 0 else None

    def sample(self, key, S, dt=1.0, verbose=False, rate=None):
        if self.exact:
            return self.sample_discretized(key, S, dt)
        return self.sample_thinning(key, S, dt=dt, rate=rate)

    def visualize(self, S, samples=2, n=64, dt=1.0, show=True, key=None):
        import matplotlib.pyplot as plt

        key = key if key is not None else jax.random.PRNGKey(0)
        xtest = S.return_discretization(n)
        rate = self.rate(xtest)
        if self.d == 1:
            plt.plot(np.asarray(xtest), np.asarray(rate), lw=3, label="rate")
            for i in range(samples):
                key, sub = jax.random.split(key)
                x = self.sample(sub, S, dt=dt)
                if x is not None:
                    plt.plot(
                        np.asarray(x), np.zeros(x.shape[0]), "o",
                        label=f"sample n={x.shape[0]}",
                    )
            plt.legend()
        if show:
            plt.show()


class SeasonalPoissonPointProcess(PoissonPointProcess):
    """Time-modulated rate λ(x)·w(t) (seasonal_point_process.py:7)."""

    def __init__(self, *args, modulation=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.modulation = modulation if modulation is not None else (
            lambda t: 1.0 + 0.5 * np.sin(2 * np.pi * t)
        )

    def rate_at_time(self, x, t, dt=1.0):
        return self.rate(x, dt=dt) * self.modulation(t)

    def sample_at_time(self, key, S, t, dt=1.0):
        mod = float(self.modulation(t))
        orig = self.rate
        try:
            self.rate = lambda x, dt=1.0: orig(x, dt) * mod
            return self.sample(key, S, dt=dt)
        finally:
            self.rate = orig
