"""Log-linear rate model: log λ(x) = Φ(x)ᵀθ, fitted by weighted LS on
log-counts, with multiplicative (exp) per-set confidence bounds.

Parity: stpy/point_processes/loglinear_estimator.py:17 (least-squares fit
:22, exp-form mean_var_reg_set :53, regression covariance :84). Fits run as
on-device L-BFGS (the reference calls MOSEK).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from stpy_tpu.config import default_dtype
from stpy_tpu.opt.lbfgs import minimize_lbfgs
from stpy_tpu.point_processes.poisson_rate_estimator import (
    PoissonRateEstimator,
)


class LogLinearRateEstimator(PoissonRateEstimator):
    def least_squares_weighted(self, threads=0):
        mask_np = np.asarray(self.bucketized_counts) > 0
        mask = jnp.asarray(mask_np)
        obs = jnp.clip(self.total_bucketized_obs[mask], 1e-6)
        phis = self.varphis[mask]
        tau = self.total_bucketized_time[mask]
        target = jnp.log(obs) / tau

        def objective(theta):
            r = phis @ theta - target
            return jnp.sum(r * r)

        res = minimize_lbfgs(
            objective, jnp.zeros(self.get_m(), default_dtype()), max_iter=500
        )
        self.rate = res.x
        return self.rate

    def fit_gp(self, threads=4):
        if self.data is None:
            self.rate = None
            return
        self.least_squares_weighted(threads)

    def construct_covariance_matrix_regression(self):
        mm = self.get_m()
        W = jnp.zeros((mm, mm), default_dtype())
        if self.data is not None and self.feedback == "count-record":
            mask_np = np.asarray(self.bucketized_counts) > 0
            tau = np.asarray(self.total_bucketized_time)
            var = np.asarray(self.variances)
            for i in range(len(mask_np)):
                if mask_np[i]:
                    A = jnp.outer(self.varphis[i], self.varphis[i]) * tau[i]
                    W = W + A / var[i]
        elif self.data is not None:
            for S, obs, dt in self.data:
                varphi = self.packing.integral(S) * dt
                variance = jnp.clip(varphi @ self.rate, 1e-8)
                W = W + jnp.outer(varphi, varphi) / variance
        return W + jnp.eye(mm, dtype=W.dtype) * self.s

    def fit_ellipsoid_approx(self):
        self.W = self.construct_covariance_matrix_regression()
        self.W_inv = jnp.linalg.pinv(self.W)
        self.W_inv_approx = self.W_inv

    def mean_var_reg_set(self, S, dt=1.0, beta=2.0):
        """Multiplicative bounds: sum over contained basic sets of
        exp(dt·(φᵀθ ± β·sqrt(φᵀW⁻¹φ))) (parity :53-66)."""
        if not self.approx_fit:
            self.fit_ellipsoid_approx()
            self.approx_fit = True
        map_ = 0.0
        lcb = 0.0
        ucb = 0.0
        for st in self.basic_sets:
            if S.inside(st):
                x = self.packing.integral(st)
                width = beta * jnp.sqrt(x @ self.W_inv @ x)
                mean = x @ self.rate
                lcb = lcb + jnp.exp(dt * (mean - width))
                ucb = ucb + jnp.exp(dt * (mean + width))
                map_ = map_ + jnp.exp(dt * mean)
        return map_, ucb, lcb

    def mean_rate(self, S, n=128):
        xtest = S.return_discretization(n)
        return jnp.exp(self.packing.embed(xtest) @ self.rate.reshape(-1, 1))

    def mean_rate_points(self, xtest):
        return jnp.exp(self.packing.embed(xtest) @ self.rate.reshape(-1, 1))

    def ucb(self, S, dt=1.0, delta=0.5):
        return float(self.mean_var_reg_set(S, dt=dt, beta=self.beta(0))[1])

    def lcb(self, S, dt=1.0):
        return float(self.mean_var_reg_set(S, dt=dt, beta=self.beta(0))[2])
