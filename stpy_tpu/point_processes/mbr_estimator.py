"""MBR positive estimator: matrix-parameterized rate λ(x) = Φ(x)ᵀ Θ Φ(x)
with symmetric/PSD Θ (the "matrix bandit regression" positive model).

Parity: stpy/point_processes/mbr_positive_estimator.py:12
(MBRPositiveEstimator: cvxpy matrix MAP fits :49-104, covariance over
vec(Θ) :144-180, approx bands :208-260). On-device: L-BFGS over the
symmetric (or PSD-factor) parameterization; bands via the quadratic form
against the vec-space covariance inverse.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from stpy_tpu.config import default_dtype
from stpy_tpu.opt.lbfgs import minimize_lbfgs
from stpy_tpu.point_processes.link_estimators import (
    PermanentalProcessRateEstimator,
)


class MBRPositiveEstimator(PermanentalProcessRateEstimator):
    def __init__(self, *args, psd=False, **kwargs):
        super().__init__(*args, **kwargs)
        self.psd = psd
        if self.feedback == "count-record":
            nb = self.varLambdas.shape[0]
            self.varLambdas_vec = self.varLambdas.reshape(nb, -1)
        self.approx_solver = True

    # -- fits ------------------------------------------------------------------
    def _theta_param(self, flat):
        m = self.get_m()
        M = flat.reshape(m, m)
        if self.psd:
            return M @ M.T
        return 0.5 * (M + M.T)

    def penalized_likelihood(self, threads=4):
        sumLambda = self.sumLambda
        m = self.get_m()

        if self.observations is not None:
            obs = self.observations
            mult = self.obs_multiplicities

            def loss(flat):
                Theta = self._theta_param(flat)
                q = jnp.einsum("ij,jk,ik->i", obs, Theta, obs)
                return (
                    -jnp.sum(mult * jnp.log(jnp.clip(q, 1e-12)))
                    + jnp.trace(sumLambda @ Theta)
                    + self.s * jnp.sum(Theta**2)
                )
        else:

            def loss(flat):
                Theta = self._theta_param(flat)
                return jnp.trace(sumLambda @ Theta) + self.s * jnp.sum(
                    Theta**2
                )

        flat0 = (0.1 * jnp.eye(m, dtype=default_dtype())).ravel()
        res = minimize_lbfgs(loss, flat0, max_iter=800)
        self.rate = self._theta_param(res.x)
        return self.rate

    penalized_likelihood_fast = penalized_likelihood

    def penalized_likelihood_bins(self, threads=4):
        m = self.get_m()
        mask = jnp.asarray(np.asarray(self.bucketized_counts) > 0)
        obs = self.total_bucketized_obs[mask]
        tau = self.total_bucketized_time[mask]
        vlv = self.varLambdas_vec[mask]

        def loss(flat):
            Theta = self._theta_param(flat)
            lam = jnp.clip(tau * (vlv @ Theta.ravel()), 1e-12)
            return (
                -jnp.sum(obs * jnp.log(lam))
                + jnp.sum(tau * (vlv @ Theta.ravel()))
                + self.s * jnp.sum(Theta**2)
            )

        flat0 = (0.1 * jnp.eye(m, dtype=default_dtype())).ravel()
        res = minimize_lbfgs(loss, flat0, max_iter=800)
        self.rate = self._theta_param(res.x)
        return self.rate

    def fit_gp(self, threads=4):
        if self.data is None:
            self.rate = None
            return
        if self.estimator == "bins":
            self.penalized_likelihood_bins(threads)
        else:
            self.penalized_likelihood(threads)

    # -- evaluation ------------------------------------------------------------
    def mean_rate(self, S, n=128):
        xtest = S.return_discretization(n)
        emb = self.packing.embed(xtest)
        return jnp.einsum("ij,jk,ik->i", emb, self.rate, emb)[:, None]

    def mean_rate_points(self, xtest):
        emb = self.packing.embed(xtest)
        return jnp.einsum("ij,jk,ik->i", emb, self.rate, emb)[:, None]

    def rate_value(self, x, dt=1):
        emb = self.packing.embed(x) * dt
        return jnp.einsum("ij,jk,ik->i", emb, self.rate, emb)[:, None]

    def mean_set(self, S, dt=1.0):
        if self.data is None:
            return self.b * S.volume()
        emb = self.product_integral(S) * dt
        return jnp.trace(emb @ self.rate)

    # -- covariance over vec(Θ) (parity :144-180) ------------------------------
    def construct_covariance_matrix(self):
        return self.construct_covariance_matrix_regression()

    def construct_covariance_matrix_regression(self):
        m2 = self.get_m() ** 2
        W = jnp.zeros((m2, m2), default_dtype())
        if self.data is not None and self.feedback == "count-record":
            mask_np = np.asarray(self.bucketized_counts) > 0
            tau = np.asarray(self.total_bucketized_time)
            var = np.asarray(self.variances)
            for i in range(len(mask_np)):
                if mask_np[i]:
                    v = self.varLambdas_vec[i]
                    W = W + jnp.outer(v, v) * tau[i] / var[i]
        self.W = W + self.s * jnp.eye(m2, dtype=W.dtype)
        self.W_inv_approx = jnp.linalg.pinv(self.W)
        return self.W

    def band_no_opt(self, S, beta=2.0, dt=1.0, maximization=True):
        """Closed-form band tr(ΘΨ) ± β √(vec(Ψ)ᵀ W⁻¹ vec(Ψ))."""
        emb = self.product_integral(S) * dt
        v = emb.ravel()
        mid = jnp.trace(emb @ self.rate)
        width = beta * jnp.sqrt(
            jnp.clip(v @ self.W_inv_approx @ v, 0.0)
        )
        return mid + width if maximization else mid - width

    band = band_no_opt

    def mean_var_reg_set(self, S, dt=1.0, beta=2.0, lcb_compute=False):
        if self.data is None:
            return (
                S.volume() * self.b,
                S.volume() * self.B,
                S.volume() * self.b,
            )
        if not self.approx_fit:
            self.construct_covariance_matrix()
            self.approx_fit = True
        ucb = self.band_no_opt(S, beta=beta, dt=dt, maximization=True)
        lcb = (
            self.band_no_opt(S, beta=beta, dt=dt, maximization=False)
            if lcb_compute else None
        )
        return None, ucb, lcb

    def mean_var_bins_set(self, S, dt=1.0, beta=2.0, lcb_compute=False):
        return self.mean_var_reg_set(
            S, dt=dt, beta=beta, lcb_compute=lcb_compute
        )

    def ucb(self, S, dt=1.0, delta=0.5):
        return float(self.mean_var_reg_set(S, dt=dt, beta=self.beta(0))[1])

    def lcb(self, S, dt=1.0):
        return float(
            self.mean_var_reg_set(
                S, dt=dt, beta=self.beta(0), lcb_compute=True
            )[2]
        )
