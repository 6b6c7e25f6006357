"""Data-generating noise models with explicit-PRNG sampling and pure-jnp
log-likelihoods.

Parity: stpy/probability/noise_models.py:11-317 (Gaussian, Huber-mixture,
bounded, misspecified, Laplace, Gumbel, two-sided Weibull, Bernoulli,
(Log)Weibull, Poisson). The reference mixes numpy global-RNG sampling with
cvxpy/numpy log-likelihood emitters; here sampling takes a jax PRNG key and
the log-likelihood is one jnp function usable under jit/grad.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np
import jax
import jax.numpy as jnp

from stpy_tpu.config import as_array, default_dtype


class NoiseModel(ABC):
    """Interface: sample noisy observations and evaluate their likelihood."""

    @abstractmethod
    def sample_noise(self, key, xs):
        ...

    def sample(self, key, xs, theta):
        xs = as_array(xs)
        return xs @ theta.reshape(-1, 1) + self.sample_noise(key, xs)

    def noise_log_likelihood(self, etas):
        raise NotImplementedError

    def log_likelihood(self, ys, xs, theta):
        if ys.shape[0] == 0:
            return jnp.asarray(0.0, default_dtype())
        return self.noise_log_likelihood(ys - xs @ theta.reshape(-1, 1))

    def joint_log_likelihood(self, ys, xs, theta):
        return jnp.sum(self.log_likelihood(ys, xs, theta))

    @property
    def convex(self) -> bool:
        return False


class GaussianNoise(NoiseModel):
    def __init__(self, sigma=0.1):
        self.sigma = sigma

    def sample_noise(self, key, xs):
        return self.sigma * jax.random.normal(
            key, (xs.shape[0], 1), default_dtype()
        )

    def noise_log_likelihood(self, etas):
        return -0.5 * etas**2 / self.sigma**2 - 0.5 * np.log(
            2 * np.pi * self.sigma**2
        )

    @property
    def convex(self):
        return True

    def __str__(self):
        return "GaussianAdditive"


class HuberContaminatedNoise(NoiseModel):
    """Gaussian + Laplace mixture (noise_models.py HuberNoise)."""

    def __init__(self, sigma=0.1):
        self.sigma = sigma

    def sample_noise(self, key, xs):
        k1, k2 = jax.random.split(key)
        g = jax.random.normal(k1, (xs.shape[0], 1), default_dtype())
        l = jax.random.laplace(k2, (xs.shape[0], 1), default_dtype()) * self.sigma
        return self.sigma * (g + l) / 2.0

    def noise_log_likelihood(self, etas, delta=1.35):
        a = jnp.abs(etas) / self.sigma
        return -jnp.where(a <= delta, 0.5 * a**2, delta * (a - 0.5 * delta))

    @property
    def convex(self):
        return True

    def __str__(self):
        return "HuberContaminated"


class BoundedNoise(GaussianNoise):
    """Uniform on [lower, upper] (sub-Gaussian bounded norm)."""

    def __init__(self, lower, upper):
        super().__init__(upper - lower)
        self.lower = lower
        self.upper = upper

    def sample_noise(self, key, xs):
        u = jax.random.uniform(key, (xs.shape[0], 1), default_dtype())
        return self.lower + u * (self.upper - self.lower)

    def __str__(self):
        return "BoundedNoiseAdditive"


class MisspecifiedGaussianNoise(GaussianNoise):
    """Model assumes `sigma`, data generated with `actual_sigma`."""

    def __init__(self, sigma=1.0, actual_sigma=0.1):
        super().__init__(sigma=sigma)
        self.actual_sigma = actual_sigma

    def sample_noise(self, key, xs):
        return self.actual_sigma * jax.random.normal(
            key, (xs.shape[0], 1), default_dtype()
        )

    def __str__(self):
        return "MisspecifiedGaussianAdditive"


class LaplaceNoise(NoiseModel):
    def __init__(self, b):
        self.b = b

    def sample_noise(self, key, xs):
        return self.b * jax.random.laplace(
            key, (xs.shape[0], 1), default_dtype()
        )

    def noise_log_likelihood(self, etas):
        return -np.log(2 * self.b) - jnp.abs(etas) / self.b

    @property
    def convex(self):
        return True

    def __str__(self):
        return "Laplace"


class GumbelNoise(NoiseModel):
    def __init__(self, beta, mu=0.0):
        self.beta = beta
        self.mu = mu

    def sample_noise(self, key, xs):
        return (
            self.mu
            + self.beta
            * jax.random.gumbel(key, (xs.shape[0], 1), default_dtype())
        )

    def noise_log_likelihood(self, etas):
        z = (etas - self.mu) / self.beta
        return -np.log(self.beta) - z - jnp.exp(-z)

    def __str__(self):
        return "GumbelAdditive"


class TwoSidedWeibullNoise(NoiseModel):
    """Symmetrized Weibull: sign ~ Rademacher, |eta| ~ Weibull(k, lam)."""

    def __init__(self, k=1.5, lam=1.0):
        self.k = k
        self.lam = lam

    def sample_noise(self, key, xs):
        k1, k2 = jax.random.split(key)
        u = jax.random.uniform(k1, (xs.shape[0], 1), default_dtype())
        mag = self.lam * (-jnp.log1p(-u)) ** (1.0 / self.k)
        sgn = jax.random.rademacher(k2, (xs.shape[0], 1)).astype(mag.dtype)
        return sgn * mag

    def noise_log_likelihood(self, etas):
        a = jnp.abs(etas) / self.lam
        return (
            np.log(self.k / (2 * self.lam))
            + (self.k - 1) * jnp.log(jnp.maximum(a, 1e-30))
            - a**self.k
        )

    def __str__(self):
        return "TwoSidedWeibull"


class LogWeibullNoise(NoiseModel):
    """log of Weibull magnitudes (heavy left tail)."""

    def __init__(self, k=1.0, lam=1.0):
        self.k = k
        self.lam = lam

    def sample_noise(self, key, xs):
        u = jax.random.uniform(key, (xs.shape[0], 1), default_dtype())
        mag = self.lam * (-jnp.log1p(-u)) ** (1.0 / self.k)
        return jnp.log(jnp.maximum(mag, 1e-30))

    def __str__(self):
        return "LogWeibull"


class BernoulliNoise(NoiseModel):
    """y ~ Bernoulli(sigmoid(xθ)); not additive."""

    def sample(self, key, xs, theta):
        p = jax.nn.sigmoid(as_array(xs) @ theta.reshape(-1, 1))
        return jax.random.bernoulli(key, p).astype(default_dtype())

    def sample_noise(self, key, xs):
        raise AttributeError("Bernoulli noise is not additive")

    def log_likelihood(self, ys, xs, theta):
        s = xs @ theta.reshape(-1, 1)
        return ys * s - jax.nn.softplus(s)

    def __str__(self):
        return "Bernoulli"


class PoissonNoise(NoiseModel):
    """y ~ Poisson(lam(x)); `lam` is a rate function."""

    def __init__(self, lam):
        self.lam = lam

    def sample_noise(self, key, xs):
        rate = self.lam(as_array(xs)).reshape(-1)
        return jax.random.poisson(key, rate).astype(default_dtype())[:, None]

    def sample(self, key, xs, theta=None):
        return self.sample_noise(key, xs)

    def mean(self, xs):
        return self.lam(xs)

    def __str__(self):
        return "Poisson"
