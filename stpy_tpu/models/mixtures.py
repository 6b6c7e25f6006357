"""Mixture estimators: model-averaged GPs with random kernel weights.

Parity: stpy/continuous_processes/dirichlet_mixture.py:8 (DirichletMixture)
and categorical_mixture.py:9 (CategoricalMixture). The reference refits a
torch GP per Monte-Carlo weight draw; here the per-draw posterior sample is
one vmappable jitted function of the mixed Gram matrix.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from stpy_tpu.config import as_array, default_dtype
from stpy_tpu.linalg import safe_cholesky, cho_solve
from stpy_tpu.models.estimator import Estimator


class DirichletMixture(Estimator):
    def __init__(self, processes, concentration=None, key=None):
        self.processes = processes  # list of GaussianProcess-like objects
        self.k = len(processes)
        self.s = processes[0].s
        self.concentration = (
            concentration
            if concentration is not None
            else np.ones(self.k) / self.k
        )
        self.key = key if key is not None else jax.random.PRNGKey(3)
        self.fitted = False

    def fit_gp(self, X, y, xtest=None, N=200):
        self.x = as_array(X)
        self.y = as_array(y).reshape(-1, 1)
        # precompute component Grams once
        self.Ks = jnp.stack(
            [p.kernel_object.gram(self.x) for p in self.processes], axis=0
        )
        self.fitted = True
        return True

    fit_GP = fit_gp

    def _draw_weights(self):
        self.key, sub = jax.random.split(self.key)
        return jax.random.dirichlet(
            sub, jnp.asarray(self.concentration, default_dtype())
        )

    def _mixed_posterior_sample(self, alpha, xtest, key):
        K = jnp.einsum("k,kij->ij", alpha, self.Ks) + self.s**2 * jnp.eye(
            self.x.shape[0], dtype=self.x.dtype
        )
        L = safe_cholesky(K).L
        A = cho_solve(L, self.y)
        Ks_cross = jnp.einsum(
            "k,kij->ij",
            alpha,
            jnp.stack(
                [
                    p.kernel_object.cross(xtest, self.x)
                    for p in self.processes
                ],
                axis=0,
            ),
        )
        mu = Ks_cross @ A
        Kss = jnp.einsum(
            "k,kij->ij",
            alpha,
            jnp.stack(
                [p.kernel_object.gram(xtest) for p in self.processes], axis=0
            ),
        )
        V = jax.scipy.linalg.solve_triangular(L, Ks_cross.T, lower=True)
        cov = Kss - V.T @ V
        Lc = safe_cholesky(cov, jitter=1e-8).L
        z = jax.random.normal(key, (xtest.shape[0], 1), mu.dtype)
        return mu + Lc @ z

    def sample(self, xtest, size=1, key=None):
        xtest = as_array(xtest)
        out = []
        for _ in range(size):
            alpha = self._draw_weights()
            self.key, sub = jax.random.split(self.key)
            out.append(self._mixed_posterior_sample(alpha, xtest, sub))
        return jnp.concatenate(out, axis=1)

    def mean_var(self, xtest, N=100):
        samples = self.sample(xtest, size=N)
        return (
            jnp.mean(samples, axis=1, keepdims=True),
            jnp.std(samples, axis=1, keepdims=True),
        )

    def mean_std(self, xtest, N=100):
        return self.mean_var(xtest, N=N)

    def ucb(self, xtest):
        mu, s = self.mean_var(xtest)
        return mu + 2 * s

    def lcb(self, xtest):
        mu, s = self.mean_var(xtest)
        return mu - 2 * s


class CategoricalMixture(DirichletMixture):
    """Mixture with categorical (vertex) weights: each draw picks ONE model
    with probability p_k (categorical_mixture.py:9)."""

    def __init__(self, processes, probs=None, key=None):
        super().__init__(processes, key=key)
        self.probs = (
            jnp.asarray(probs, default_dtype())
            if probs is not None
            else jnp.ones(self.k, default_dtype()) / self.k
        )

    def _draw_weights(self):
        self.key, sub = jax.random.split(self.key)
        idx = jax.random.categorical(sub, jnp.log(self.probs))
        return jnp.zeros(self.k, default_dtype()).at[idx].set(1.0)

    def map_model(self):
        """Highest-evidence component (model selection)."""
        evidences = []
        for p in self.processes:
            p.x, p.y = self.x, self.y
            evidences.append(float(p.log_marginal(p.kernel_object, {}, 1.0)))
        return int(np.argmin(evidences))
