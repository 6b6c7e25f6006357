"""Locally-weighted RKHS regression with learned feature-space metric
(shape-constrained / "convex" RKHS).

Parity: stpy/continuous_processes/convex_rkhs.py:6 (ConvexRKHS: per-point
local ridge fits weighted by a learned Mahalanobis similarity in feature
space; metric optimized by BFGS restarts). TPU rewrite: all n local fits are
ONE vmapped batched solve; metric learning is vmapped-restart L-BFGS.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stpy_tpu.config import as_array, default_dtype
from stpy_tpu.linalg import chol_jittered, cho_solve
from stpy_tpu.models.feature_gp import KernelizedFeatures
from stpy_tpu.opt.lbfgs import minimize_lbfgs


class ConvexRKHS(KernelizedFeatures):
    def __init__(self, embedding, m, lam=0.0, s=0.01):
        super().__init__(embedding, m, s=s, lam=lam)
        self.gamma_metric = jnp.ones(self.m, default_dtype())

    def weight_scaling(self, gamma, scale, x_single, xs, Phi_all):
        phi0 = self.embed(x_single.reshape(1, -1))
        return jnp.exp(
            -jnp.sum(((Phi_all - phi0) * gamma / scale) ** 2, axis=1)
        )

    def _local_fit(self, weights, X):
        D = weights
        A = (X * D[:, None]).T @ X + (self.lam + 1e-6) * jnp.eye(
            self.m, dtype=X.dtype
        )
        b = (X * D[:, None]).T @ self.y
        return cho_solve(chol_jittered(A), b)

    def local_fit(self, weights):
        return self._local_fit(weights, self.embed(self.x))

    def fit_gp(self, x, y):
        self.x = as_array(x)
        self.y = as_array(y).reshape(-1, 1)
        self.n, self.d = self.x.shape
        self.fitted = True

    fit = fit_gp

    def optimize_params(self, restarts=5, maxiter=100, verbose=False,
                        key=None, **kwargs):
        """Learn the diagonal feature-space metric by minimizing the
        prediction + consistency loss (parity :42-79), all local fits
        vmapped."""
        key = key if key is not None else jax.random.PRNGKey(1)
        X = self.embed(self.x)
        yv = self.y
        n, m = X.shape

        def total_loss(gamma):
            W = jnp.exp(
                -jnp.sum(
                    ((X[:, None, :] - X[None, :, :]) * gamma) ** 2, axis=2
                )
            )  # (n, n) similarity
            thetas = jax.vmap(lambda w: self._local_fit(w, X))(W)  # (n,m,1)
            preds = jnp.einsum("ij,njk->nik", X, thetas)  # (n, n, 1)
            # prediction loss
            loss = jnp.sum(
                (preds[:, :, 0] - yv.ravel()[None, :]) ** 2
                / self.s**2 * W
            ) / 2.0
            # pairwise consistency
            diff = preds[:, None, :, 0] - preds[None, :, :, 0]
            ww = W[:, None, :] * W[None, :, :]
            loss = loss + jnp.sum(diff**2 / self.s**2 * ww) / n
            return loss + 1e-3 * jnp.sum(gamma**2)

        g0s = (
            jax.random.normal(key, (restarts, m), default_dtype()) ** 2
        )
        results = jax.vmap(
            lambda g0: minimize_lbfgs(total_loss, g0, max_iter=maxiter)
        )(g0s)
        best = jnp.nanargmin(results.value)
        self.gamma_metric = jnp.abs(results.x[best])
        return self.gamma_metric

    def mean_std(self, xtest):
        xtest = as_array(xtest)
        X = self.embed(self.x)
        Phi_t = self.embed(xtest)

        def predict_one(phi):
            w = jnp.exp(-jnp.sum(((X - phi) * self.gamma_metric) ** 2, axis=1))
            theta = self._local_fit(w, X)
            return (phi @ theta)[0]

        mu = jax.vmap(predict_one)(Phi_t)[:, None]
        return mu, None

    def mean(self, xtest):
        return self.mean_std(xtest)[0]
