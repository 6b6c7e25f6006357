"""Bernoulli (binomial-feedback) point process: sensing a set S returns a
binary outcome out of a pool; the rate p(S) = ∫_S Φᵀθ must satisfy
0 ≤ Λθ ≤ 1 over all basic sets.

Parity: stpy/point_processes/binomial/binomial_process.py:4
(BernoulliPointProcess simulator) and binomial_process_estimator.py:14
(BernoulliRateEstimator: binomial likelihood fit, Langevin sampler with a
quadprog polytope prox, Laplace covariance + confidence sets).

TPU rewrite: fit and sampler use penalty-FISTA / penalized Langevin for the
polytope Λθ ∈ [0, 1] (quadratic hinge) — no external QP per step.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from stpy_tpu.config import default_dtype
from stpy_tpu.inference.langevin import proximal_langevin
from stpy_tpu.linalg import power_iteration
from stpy_tpu.opt.ellipsoid import maximize_on_elliptical_slice
from stpy_tpu.opt.prox import fista_backtracking
from stpy_tpu.embeddings.positive import TriangleEmbedding
from stpy_tpu.point_processes.rate_estimator import RateEstimator


class BernoulliPointProcess:
    """Simulator over basic sets (parity: binomial_process.py:4)."""

    def __init__(self, basic_sets, d=1, rate=None):
        self.basic_sets = basic_sets
        self.rate = rate
        self.d = d

    def is_basic(self, S):
        return any(s is S for s in self.basic_sets)

    def sample(self, key, S, t=None, dt=None):
        p = float(self.rate(S))
        rv = float(jax.random.bernoulli(key, p))
        return (S, 1.0 if rv > 0.5 else 0.0, 1.0, dt, t)


class BernoulliRateEstimator(RateEstimator):
    def __init__(self, hierarchy, d=1, m=100, kernel_object=None, B=1.0,
                 s=1.0, jitter=1e-7, b=0.0, basis="triangle", offset=0.1,
                 uncertainty="laplace", key=None):
        self.d = d
        self.s = s
        self.b = b
        self.B = B
        self.uncertainty = uncertainty
        self.hierarchy = hierarchy
        self.kernel_object = kernel_object
        self.packing = TriangleEmbedding(
            d, m, kernel_object=kernel_object, B=1.0, b=0.0, offset=offset,
            s=np.sqrt(jitter),
        )
        self.feedback = "histogram"
        self.data = None
        self.rate = None
        self.sampled_theta = None
        self.key = key if key is not None else jax.random.PRNGKey(31)
        self.basic_sets = self.hierarchy.get_sets_level(self.hierarchy.levels)
        self.varphis = jnp.stack(
            [self.embed_set(S).reshape(-1) for S in self.basic_sets], axis=0
        )

    def embed_set(self, S):
        return self.packing.integral(S).reshape(1, -1)

    def load_data(self, data):
        """data: list of (S, count, pool, duration, time)."""
        self.data = None
        self.phis = None
        for datapoint in data:
            self.add_data_point(datapoint)

    def add_data_point(self, datapoint):
        S, count, pool, duration, time = datapoint
        phi = self.embed_set(S)
        dt_ = default_dtype()
        if self.data is None:
            self.data = [datapoint]
            self.counts = jnp.asarray([count], dt_)
            self.pool = jnp.asarray([pool], dt_)
            self.phis = phi
        else:
            self.data.append(datapoint)
            self.counts = jnp.concatenate(
                [self.counts, jnp.asarray([count], dt_)]
            )
            self.pool = jnp.concatenate([self.pool, jnp.asarray([pool], dt_)])
            self.phis = jnp.concatenate([self.phis, phi], axis=0)

    # -- objective -------------------------------------------------------------
    def _nll(self, theta):
        """Binomial negative log-likelihood + ridge (parity nabla :75-83)."""
        p = jnp.clip((self.phis @ theta).ravel(), 1e-8, 1 - 1e-8)
        return (
            -jnp.sum(self.counts * jnp.log(p))
            - jnp.sum((self.pool - self.counts) * jnp.log(1 - p))
            + 0.5 * self.s * jnp.sum(theta**2)
        )

    def nabla(self, theta):
        if self.data is None:
            return self.s * theta.reshape(-1, 1)
        return jax.grad(self._nll)(theta.reshape(-1)).reshape(-1, 1)

    def _polytope_penalty(self, theta, rho=1e4):
        z = self.varphis @ theta
        return rho * (
            jnp.sum(jnp.maximum(z - 1.0, 0.0) ** 2)
            + jnp.sum(jnp.maximum(-z, 0.0) ** 2)
        )

    def fit_gp(self, threads=4):
        """Penalized binomial MAP with polytope penalty (parity :216-243)."""
        if self.data is None:
            self.rate = None
            return

        def obj(theta):
            return self._nll(theta) + self._polytope_penalty(theta)

        theta0 = jnp.full((self.get_m(),), 0.1, default_dtype())
        res = fista_backtracking(
            obj, theta0, lambda t: t, max_iter=1000
        )
        self.rate = res.x
        return self.rate

    # -- covariance / confidence (parity :124-152) -----------------------------
    def construct_covariance(self, theta):
        p = jnp.clip((self.phis @ theta.reshape(-1)).ravel(), 1e-8, 1 - 1e-8)
        D1 = self.counts / p**2
        D2 = (self.pool - self.counts) / (1 - p) ** 2
        W = (self.phis * (D1 + D2)[:, None]).T @ self.phis
        return W + self.s * jnp.eye(self.get_m(), dtype=W.dtype)

    def construct_confidence(self):
        self.W = self.construct_covariance(self.rate)
        self.invW = jnp.linalg.pinv(self.W)

    def ucb(self, S, beta=8.0, delta=0.1):
        if self.rate is None:
            return 1.0
        self.construct_confidence()
        phi = self.embed_set(S).reshape(-1)
        mm = self.get_m()
        val, _ = maximize_on_elliptical_slice(
            phi, self.W, self.rate.reshape(-1), np.sqrt(beta),
            l=jnp.zeros(self.varphis.shape[0]),
            Lambda=self.varphis,
            u=jnp.ones(self.varphis.shape[0]),
        )
        return float(jnp.clip(val, 0.0, 1.0))

    def lcb(self, S, beta=8.0, delta=0.1):
        if self.rate is None:
            return 0.0
        self.construct_confidence()
        phi = self.embed_set(S).reshape(-1)
        val, _ = maximize_on_elliptical_slice(
            -phi, self.W, self.rate.reshape(-1), np.sqrt(beta),
            l=jnp.zeros(self.varphis.shape[0]),
            Lambda=self.varphis,
            u=jnp.ones(self.varphis.shape[0]),
        )
        return float(jnp.clip(-val, 0.0, 1.0))

    def mean_set(self, S):
        return float(self.embed_set(S).reshape(-1) @ self.rate)

    # -- sampling (parity :85-122; quadprog prox -> penalty Langevin) ----------
    def sample(self, steps=100, verbose=False):
        if self.rate is not None:
            theta0 = self.rate.reshape(-1)
        else:
            self.key, sub = jax.random.split(self.key)
            theta0 = (
                self.b
                + 0.05 * jax.random.uniform(
                    sub, (self.get_m(),), default_dtype()
                ) ** 2
            )

        def grad_f(theta):
            g = (
                jax.grad(self._nll)(theta)
                if self.data is not None
                else self.s * theta
            )
            return g + jax.grad(self._polytope_penalty)(theta)

        W = (
            self.construct_covariance(theta0)
            if self.data is not None
            else jnp.eye(self.get_m(), dtype=default_dtype())
        )
        L = power_iteration(W) + 1.0
        self.key, sub = jax.random.split(self.key)
        xs = proximal_langevin(
            sub, grad_f, lambda t, _eta: t, theta0, steps=steps,
            step_size=float(0.5 / L),
        )
        self.sampled_theta = xs[-1].reshape(-1, 1)
        return self.sampled_theta

    def get_m(self):
        return self.packing.get_m()


class LinkBernoulliRateEstimator(BernoulliRateEstimator):
    """Logistic-link variant p(S) = σ(∫_S Φᵀθ)
    (parity: binomial_process_estimator.py:244)."""

    def link(self, x):
        return jax.nn.sigmoid(x)

    def _nll(self, theta):
        z = (self.phis @ theta).ravel()
        # -log p(c|z) = -(c·z - pool·softplus(z)) for binomial w/ logit z
        return -jnp.sum(
            self.counts * z - self.pool * jax.nn.softplus(z)
        ) + 0.5 * self.s * jnp.sum(theta**2)

    def _polytope_penalty(self, theta, rho=1e4):
        return jnp.zeros(())  # link keeps p in (0,1) automatically

    def construct_covariance(self, theta):
        z = (self.phis @ theta.reshape(-1)).ravel()
        p = jax.nn.sigmoid(z)
        Dw = self.pool * p * (1 - p)
        W = (self.phis * Dw[:, None]).T @ self.phis
        return W + self.s * jnp.eye(self.get_m(), dtype=W.dtype)

    def mean_set(self, S):
        return float(
            jax.nn.sigmoid(self.embed_set(S).reshape(-1) @ self.rate)
        )

    def ucb(self, S, beta=8.0, delta=0.1):
        if self.rate is None:
            return 1.0
        self.construct_confidence()
        phi = self.embed_set(S).reshape(-1)
        val, _ = maximize_on_elliptical_slice(
            phi, self.W, self.rate.reshape(-1), np.sqrt(beta)
        )
        return float(jax.nn.sigmoid(val))

    def lcb(self, S, beta=8.0, delta=0.1):
        if self.rate is None:
            return 0.0
        self.construct_confidence()
        phi = self.embed_set(S).reshape(-1)
        val, _ = maximize_on_elliptical_slice(
            -phi, self.W, self.rate.reshape(-1), np.sqrt(beta)
        )
        return float(jax.nn.sigmoid(-val))
