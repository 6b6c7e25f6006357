"""Expectation propagation with Gaussian sites.

Parity: stpy/approx_inference/expected-propagation.py:6
(ExpectedPropagationQuadratic). The reference's per-site scipy quadrature
moment matching becomes batched Gauss-Hermite on device; sites are rank-one
(each datapoint constrains a linear functional a_iᵀθ), the standard EP
setting for GLM/quadratic likelihoods.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from stpy_tpu.config import as_array, default_dtype


def _gh(n=40):
    x, w = np.polynomial.hermite.hermgauss(n)
    return (
        jnp.asarray(np.sqrt(2.0) * x, default_dtype()),
        jnp.asarray(w / np.sqrt(np.pi), default_dtype()),
    )


class ExpectedPropagationQuadratic:
    """EP for p(θ) ∝ N(θ; μ0, Σ0) Π_i t_i(a_iᵀθ) with scalar site
    likelihoods t_i (e.g. quadratic / Gaussian-of-square)."""

    def __init__(self, mu_prior, Sigma_prior, likelihood_single, data,
                 A=None):
        self.mu0 = as_array(mu_prior).reshape(-1)
        self.Sigma0 = as_array(Sigma_prior)
        self.d = self.mu0.shape[0]
        self.likelihood_single = likelihood_single  # t(z, datum) -> R+
        self.data = data
        self.n = len(data)
        # site directions default to coordinate axes / provided rows
        self.A = (
            as_array(A) if A is not None
            else jnp.eye(self.d, dtype=default_dtype())[
                jnp.arange(self.n) % self.d
            ]
        )
        # site natural params (precision tau_i, shift nu_i) on z_i = a_iᵀθ
        self.tau = jnp.zeros(self.n, default_dtype())
        self.nu = jnp.zeros(self.n, default_dtype())
        self._gh_nodes = _gh(40)

    def _posterior(self):
        """Global Gaussian from prior + sites: Σ = (Σ0^{-1} + Aᵀ diag(τ) A)^{-1}."""
        P0 = jnp.linalg.inv(self.Sigma0)
        P = P0 + (self.A * self.tau[:, None]).T @ self.A
        Sigma = jnp.linalg.inv(P)
        mu = Sigma @ (P0 @ self.mu0 + self.A.T @ self.nu)
        return mu, Sigma

    def _site_update(self, j, mu, Sigma, damping=0.8):
        a = self.A[j]
        m = a @ mu
        v = a @ Sigma @ a
        # cavity
        tau_c = 1.0 / v - self.tau[j]
        tau_c = jnp.maximum(tau_c, 1e-8)
        nu_c = m / v - self.nu[j]
        mc, vc = nu_c / tau_c, 1.0 / tau_c
        # tilted moments by Gauss-Hermite
        xg, wg = self._gh_nodes
        z = mc + jnp.sqrt(vc) * xg
        lik = jnp.clip(self.likelihood_single(z, self.data[j]), 1e-300)
        Z = jnp.sum(wg * lik)
        m1 = jnp.sum(wg * lik * z) / Z
        m2 = jnp.sum(wg * lik * z * z) / Z
        vt = jnp.maximum(m2 - m1 * m1, 1e-10)
        # new site params
        tau_new = jnp.maximum(1.0 / vt - tau_c, 1e-10)
        nu_new = m1 / vt - nu_c
        self.tau = self.tau.at[j].set(
            (1 - damping) * self.tau[j] + damping * tau_new
        )
        self.nu = self.nu.at[j].set(
            (1 - damping) * self.nu[j] + damping * nu_new
        )

    def fit_gp(self, iterations="auto", tol=1e-8):
        T = 50 if iterations == "auto" else iterations
        for _ in range(T):
            tau_old = self.tau
            mu, Sigma = self._posterior()
            for j in range(self.n):
                self._site_update(j, mu, Sigma)
                mu, Sigma = self._posterior()
            if float(jnp.max(jnp.abs(self.tau - tau_old))) < tol:
                break
        return self._posterior()

    def finalize(self):
        return self._posterior()
