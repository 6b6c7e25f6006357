"""Trace-regression features: y ≈ Φ(x)ᵀ A Φ(x) with symmetric (optionally
PSD) matrix parameter A.

Parity: stpy/continuous_processes/trace_features.py:8 (TraceFeatures —
cvxpy+MOSEK Frobenius-regularized fit, per-point cvxpy band solves). Here
the fit is L-BFGS on the symmetric parameterization (PSD via A = B Bᵀ), and
the confidence band is the closed-form quadratic form against V^{-1}.
"""

from __future__ import annotations

import jax.numpy as jnp

from stpy_tpu.config import as_array
from stpy_tpu.linalg import safe_cholesky, cho_solve
from stpy_tpu.models.feature_gp import KernelizedFeatures
from stpy_tpu.opt.lbfgs import minimize_lbfgs


class TraceFeatures(KernelizedFeatures):
    def __init__(self, *args, PSD=False, **kwargs):
        super().__init__(*args, **kwargs)
        self.m = int(self.m)
        self.PSD = PSD

    def construct_covariance(self):
        emb = self.emb
        X = jnp.einsum("ij,ik->ijk", emb, emb).reshape(self.n, -1)  # (n, m²)
        self.V = X.T @ X + self.lam * self.s**2 * jnp.eye(
            self.m**2, dtype=emb.dtype
        )
        self._X_design = X

    def fit_gp(self, x, y):
        x = as_array(x)
        y = as_array(y).reshape(-1, 1)
        self.x, self.y = x, y
        self.n, self.d = x.shape
        self.emb = self.embed(x)
        self.construct_covariance()
        emb = self.emb
        yv = y.ravel()
        m = self.m

        if self.PSD:
            def obj(flatB):
                B = flatB.reshape(m, m)
                A = B @ B.T
                pred = jnp.einsum("ij,jk,ik->i", emb, A, emb)
                return jnp.sum((pred - yv) ** 2) / self.s**2 + (
                    self.lam * jnp.linalg.norm(A)
                )

            res = minimize_lbfgs(
                obj, 0.1 * jnp.eye(m).ravel(), max_iter=500
            )
            B = res.x.reshape(m, m)
            self.A = B @ B.T
        else:
            def obj(flatA):
                A = flatA.reshape(m, m)
                A = 0.5 * (A + A.T)
                pred = jnp.einsum("ij,jk,ik->i", emb, A, emb)
                return jnp.sum((pred - yv) ** 2) / self.s**2 + (
                    self.lam * jnp.sqrt(jnp.sum(A * A) + 1e-12)
                )

            res = minimize_lbfgs(obj, jnp.zeros(m * m), max_iter=500)
            A = res.x.reshape(m, m)
            self.A = 0.5 * (A + A.T)
        self.fitted = True
        return self.A

    def mean_std(self, xtest, std=True):
        emb = self.embed(xtest)
        mu = jnp.einsum("ij,jk,ik->i", emb, self.A, emb)[:, None]
        if not std:
            return mu
        X = jnp.einsum("ij,ik->ijk", emb, emb).reshape(emb.shape[0], -1)
        L = safe_cholesky(self.V).L
        Z = cho_solve(L, X.T)
        diag = self.lam * self.s**2 * jnp.einsum("ij,ji->i", X, Z)
        return mu, jnp.sqrt(jnp.clip(diag, 0))[:, None]

    def band(self, xtest, sqrtbeta=2.0, maximization=True):
        """±sqrtβ ellipsoidal band on tr(A X_i) around the fit."""
        mu, std = self.mean_std(xtest)
        sgn = 1.0 if maximization else -1.0
        return mu + sgn * sqrtbeta * std
