"""Truncated-observation feature GP: responses are clipped at a growing
threshold α(t) before the ridge solve (heavy-tail robustness).

Parity: stpy/continuous_processes/truncated_kernelized_features.py:4.
"""

from __future__ import annotations

import jax.numpy as jnp

from stpy_tpu.config import as_array
from stpy_tpu.linalg import safe_cholesky, cho_solve
from stpy_tpu.models.feature_gp import KernelizedFeatures


class TruncatedKernelizedFeatures(KernelizedFeatures):
    def __init__(self, embedding, m, s=0.001, lam=1, d=1, diameter=1,
                 verbose=True, groups=None, bounds=None, scale=1, kappa=1,
                 poly=2, primal=True, beta_fun=None,
                 alpha_score=lambda t: t ** (1 / 4),
                 default_alpha_score=1.0, bound=1.0):
        super().__init__(
            embedding, m, s=s, lam=lam, d=d, diameter=diameter,
            verbose=verbose, groups=groups, bounds=bounds, scale=scale,
            kappa=kappa, poly=poly, primal=True, beta_fun=beta_fun,
            bound=bound,
        )
        self.bound = bound
        self.alpha_score = alpha_score
        self.default_alpha_score = default_alpha_score
        self.alphas = None

    def fit_gp(self, x, y):
        x = as_array(x)
        y = as_array(y).reshape(-1, 1)
        self.alphas = jnp.full_like(y, self.default_alpha_score)
        super().fit_gp(x, y)

    def add_data_point(self, x, y):
        x, y = as_array(x), as_array(y).reshape(-1, 1)
        if self.x is not None:
            self.x = jnp.concatenate([self.x, x], axis=0)
            self.y = jnp.concatenate([self.y, y], axis=0)
            new_alpha = jnp.asarray(
                [[self.alpha_score(self.x.shape[0])]], y.dtype
            )
            self.alphas = jnp.concatenate([self.alphas, new_alpha], axis=0)
        else:
            self.x, self.y = x, y
            self.alphas = jnp.full_like(y, self.default_alpha_score)
        self.n = self.x.shape[0]
        self.fitted = False

    def precompute(self):
        if self.fitted:
            return
        self.Q = self.embed(self.x)
        Z = self.Q.T @ self.Q
        self.V = Z + self.s**2 * self.lam * jnp.eye(self.m, dtype=Z.dtype)
        self.invV = cho_solve(
            safe_cholesky(self.V).L, jnp.eye(self.m, dtype=Z.dtype)
        )
        # truncate responses at the running threshold
        self.y_truncated = jnp.where(
            jnp.abs(self.y) < self.alphas, self.y, 0.0
        )
        self.dual = False
        self.fitted = True

    def theta_mean(self, var=False, prior=False):
        self.precompute()
        if self.fitted and not prior:
            tm = self.invV @ (self.Q.T @ self.y_truncated)
            Z = self.s**2 * self.invV
        else:
            tm = jnp.zeros((self.m, 1))
            Z = self.lam * jnp.eye(self.m)
        return (tm, Z) if var else tm
