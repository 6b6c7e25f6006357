"""Multiple-kernel learning.

Parity:
  * stpy/continuous_processes/mkl_estimator.py:10 (MultipleKernelLearner —
    kernel-space MKL: weights by SDP or `matrix_frac` closed form with
    convex/non-convex simplex regularizers),
  * stpy/continuous_processes/mkl_features.py:12 (MKL — group-lasso MKL on
    concatenated embeddings),
  * stpy/continuous_processes/primal_mkl.py:6 (PrimalMKL).

TPU-first: the inner objective y^T (Σ α_i K_i + λs²I)^{-1} y is evaluated by
Cholesky solve and minimized over the simplex by exponentiated gradient
(autodiff gradient, one lax.scan) — replacing both the MOSEK SDP and the
per-branch cvxpy enumeration; simplex regularizers add their smooth eval.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from stpy_tpu.config import as_array, default_dtype
from stpy_tpu.linalg import chol_jittered, cho_solve, safe_cholesky, tri_solve_blocked
from stpy_tpu.models.estimator import Estimator
from stpy_tpu.models.feature_gp import KernelizedFeatures
from stpy_tpu.embeddings.combinators import ConcatEmbedding
from stpy_tpu.opt.frank_wolfe import minimize_on_simplex
from stpy_tpu.opt.prox import prox_group_l2


class MultipleKernelLearner(Estimator):
    def __init__(self, kernel_objects, lam=1.0, s=0.01, opt="closed",
                 regularizer=None):
        self.kernel_objects = kernel_objects
        self.no_models = len(kernel_objects)
        self.regularizer = regularizer
        self.s = s
        self.lam = lam
        self.opt = opt
        self.var = "fixed"
        self.fitted = False
        self.x = None
        self.y = None

    def fit(self):
        self.fit_gp(self.x, self.y)

    def fit_gp(self, x, y):
        x = as_array(x)
        y = as_array(y).reshape(-1, 1)
        self.x, self.y = x, y
        self.n, self.d = x.shape
        Ks = jnp.stack([k.gram(x) for k in self.kernel_objects], axis=0)
        self.Ks = Ks
        reg = self.regularizer
        ridge = self.lam * self.s**2

        def objective(alpha):
            A = jnp.einsum("k,kij->ij", alpha, Ks) + ridge * jnp.eye(
                self.n, dtype=x.dtype
            )
            L = chol_jittered(A)
            val = (y.T @ cho_solve(L, y))[0, 0]
            if reg is not None:
                val = val + reg.eval(alpha)
            return val

        alpha0 = jnp.ones(self.no_models, x.dtype) / self.no_models
        alphas, _ = minimize_on_simplex(objective, alpha0, steps=300, eta=0.05)
        self.alphas = alphas
        self.K = jnp.einsum("k,kij->ij", alphas, Ks) + ridge * jnp.eye(
            self.n, dtype=x.dtype
        )
        res = safe_cholesky(self.K)
        self.L = res.L
        self.A = cho_solve(res.L, y)
        self.fitted = True

    def _cross(self, xtest):
        return jnp.einsum(
            "k,kij->ij",
            self.alphas,
            jnp.stack(
                [k.cross(xtest, self.x) for k in self.kernel_objects], axis=0
            ),
        )

    def execute(self, xtest):
        xtest = as_array(xtest)
        K_star = self._cross(xtest) if self.fitted else None
        K_ss = jnp.einsum(
            "k,kij->ij",
            self.alphas,
            jnp.stack([k.gram(xtest) for k in self.kernel_objects], axis=0),
        )
        return K_star, K_ss

    def mean(self, xtest):
        return self._cross(as_array(xtest)) @ self.A

    def mean_std(self, xtest, full=False, reuse=False):
        xtest = as_array(xtest)
        K_star = self._cross(xtest)
        mu = K_star @ self.A
        V = tri_solve_blocked(self.L, K_star.T)
        diag = jnp.einsum(
            "k,kij->ij",
            self.alphas,
            jnp.stack(
                [jnp.diag(k.diag(xtest)) for k in self.kernel_objects], axis=0
            ),
        )
        var = jnp.maximum(jnp.diagonal(diag) - jnp.sum(V * V, axis=0), 1e-30)
        if full:
            Kss = self.execute(xtest)[1]
            return mu, Kss - V.T @ V
        return mu, jnp.sqrt(var)[:, None]

    def ucb(self, xtest):
        mu, s = self.mean_std(xtest)
        return mu + 2 * s

    def lcb(self, xtest):
        mu, s = self.mean_std(xtest)
        return mu - 2 * s


class MKL(Estimator):
    """Feature-space MKL: group-lasso over concatenated embeddings
    (mkl_features.py:12). Fit = FISTA with the group soft-threshold prox."""

    def __init__(self, embeddings, init_weights=None, lam=0.0, s=0.1):
        self.embeddings = embeddings
        self.no_models = len(embeddings)
        self.s = s
        self.lam = lam if isinstance(lam, list) else [
            lam for _ in range(self.no_models)
        ]
        self.init_weights = (
            init_weights
            if init_weights is not None
            else jnp.ones(self.no_models, default_dtype())
        )
        self.weights = self.init_weights
        self.x = None
        self.y = None
        self.theta = None

    def get_embed_dims(self):
        return [int(e.get_m()) for e in self.embeddings]

    get_emebed_dims = get_embed_dims  # reference typo alias

    def total_embed_dim(self):
        return int(np.sum(self.get_embed_dims()))

    def embed(self, x):
        return jnp.concatenate(
            [e.embed(as_array(x)) for e in self.embeddings], axis=1
        )

    def _groups(self):
        dims = self.get_embed_dims()
        offs = np.concatenate([[0], np.cumsum(dims)]).astype(int)
        return [list(range(offs[i], offs[i + 1])) for i in range(len(dims))]

    def fit_gp(self, x, y):
        x = as_array(x)
        y = as_array(y).reshape(-1, 1)
        self.x, self.y = x, y
        self.n, self.d = x.shape
        Q = self.embed(x)
        groups = self._groups()
        lam = jnp.asarray(self.lam, Q.dtype)
        yv = y.ravel()

        def smooth(theta):
            r = Q @ theta - yv
            return 0.5 * jnp.sum(r * r) / self.s**2

        def prox(theta, step):
            out = theta
            for i, g in enumerate(groups):
                out = prox_group_l2(out, step * lam[i], [g])
            return out

        from stpy_tpu.opt.prox import fista_prox_backtracking

        res = fista_prox_backtracking(
            smooth, jnp.zeros(Q.shape[1], Q.dtype), prox, max_iter=1000,
        )
        self.theta = res.x[:, None]
        # effective per-model weights = group norms
        self.weights = jnp.asarray(
            [float(jnp.linalg.norm(res.x[jnp.asarray(g)])) for g in groups]
        )
        return self.theta

    fit = fit_gp

    def mean_vector(self):
        return self.theta

    def mean_var(self, xtest):
        Phi = self.embed(xtest)
        mu = Phi @ self.theta
        return mu, None

    def mean_std(self, xtest):
        return self.mean_var(xtest)

    def sample(self, xtest, size=1, key=None):
        mu, _ = self.mean_var(xtest)
        return jnp.tile(mu, (1, size))

    def ucb(self, xtest):
        return self.mean_var(xtest)[0]

    def lcb(self, xtest):
        return self.mean_var(xtest)[0]


class PrimalMKL(MKL):
    """Primal MKL with explicit per-model scale variables
    (primal_mkl.py:6): alternating (theta | weights) minimization of
    ||Σ_k w_k Φ_k θ_k - y||²/2s² + Σ λ_k ||θ_k||², weights on the simplex."""

    def fit_gp(self, x, y, outer_steps=10):
        x = as_array(x)
        y = as_array(y).reshape(-1, 1)
        self.x, self.y = x, y
        self.n, self.d = x.shape
        Phis = [e.embed(x) for e in self.embeddings]
        yv = y.ravel()
        lam = self.lam
        thetas = [jnp.zeros(p.shape[1], p.dtype) for p in Phis]
        w = jnp.ones(self.no_models) / self.no_models

        from stpy_tpu.opt.lbfgs import minimize_lbfgs
        from stpy_tpu.opt.frank_wolfe import minimize_on_simplex

        for _ in range(outer_steps):
            # theta step (joint, smooth)
            sizes = [p.shape[1] for p in Phis]
            offs = np.concatenate([[0], np.cumsum(sizes)]).astype(int)

            def obj_theta(flat):
                pred = 0.0
                regv = 0.0
                for k in range(self.no_models):
                    tk = flat[offs[k] : offs[k + 1]]
                    pred = pred + w[k] * (Phis[k] @ tk)
                    regv = regv + lam[k] * jnp.sum(tk * tk)
                r = pred - yv
                return 0.5 * jnp.sum(r * r) / self.s**2 + regv

            flat0 = jnp.concatenate(thetas)
            flat = minimize_lbfgs(obj_theta, flat0, max_iter=200).x
            thetas = [
                flat[offs[k] : offs[k + 1]] for k in range(self.no_models)
            ]

            # weight step on the simplex
            preds = jnp.stack(
                [Phis[k] @ thetas[k] for k in range(self.no_models)], axis=1
            )

            def obj_w(wv):
                r = preds @ wv - yv
                return 0.5 * jnp.sum(r * r) / self.s**2

            w, _ = minimize_on_simplex(obj_w, w, steps=100, eta=0.1)

        self.thetas = thetas
        self.weights = w
        self.theta = jnp.concatenate(
            [w[k] * thetas[k] for k in range(self.no_models)]
        )[:, None]
        return self.theta
