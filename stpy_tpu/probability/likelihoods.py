"""GLM likelihood objects with confidence-set machinery.

Parity: stpy/probability/likelihood.py:6 (Likelihood ABC with objectives,
information matrices, likelihood-ratio and prior-posterior confidence sets)
and the per-family files (gaussian_likelihood.py:8, poisson_likelihood.py:9,
bernoulli_likelihood.py:9, laplace_likelihood.py:9, huber_likelihood.py:9,
weibul_likelihood.py:9).

Redesign: the reference emits BOTH cvxpy expressions and torch closures per
likelihood; here each likelihood emits ONE pure jnp objective (used by every
on-device solver, autodiff provides grad/hessian), and confidence sets are
returned as data (`EllipsoidSet` with sqrt-information matrix, or `LRSet`
with a level-β objective sublevel set) consumed by the ellipsoid-slice
maximizers and projected solvers instead of cvxpy constraint lists.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from stpy_tpu.config import as_array
from stpy_tpu.linalg import symsqrt


@dataclass
class EllipsoidSet:
    """{θ : ||L (θ - center)||² ≤ beta} with L = V^{1/2}."""

    L: jnp.ndarray
    center: jnp.ndarray
    beta: float

    def contains(self, theta, tol=1e-7):
        r = self.L @ (theta - self.center)
        return jnp.sum(r * r) <= self.beta + tol

    def as_slice_params(self):
        """(Sigma, mu, c) for maximize_on_elliptical_slice: the constraint
        (θ-μ)ᵀΣ(θ-μ) ≤ c² with Σ = LᵀL, c = sqrt(beta)."""
        return self.L.T @ self.L, self.center, jnp.sqrt(self.beta)


@dataclass
class LRSet:
    """{θ : objective(θ) ≤ beta} — likelihood-ratio sublevel set."""

    objective: Callable
    beta: float

    def contains(self, theta, tol=1e-7):
        return self.objective(theta) <= self.beta + tol

    def penalty(self, theta, rho=1e4):
        return rho * jnp.maximum(self.objective(theta) - self.beta, 0.0) ** 2


class Likelihood(ABC):
    def __init__(self):
        self.fitted = False
        self.x = None
        self.y = None

    # -- data ------------------------------------------------------------------
    def load_data(self, D):
        self.x, self.y = as_array(D[0]), as_array(D[1]).reshape(-1, 1)
        self.fitted = False

    def add_data_point(self, d):
        x, y = as_array(d[0]), as_array(d[1]).reshape(-1, 1)
        self.x = jnp.vstack([self.x, x]) if self.x is not None else x
        self.y = jnp.vstack([self.y, y]) if self.y is not None else y
        self.fitted = False

    # -- abstract interface ----------------------------------------------------
    @abstractmethod
    def evaluate_datapoint(self, theta, d, mask=None):
        ...

    @abstractmethod
    def get_objective(self, mask=None) -> Callable:
        """Pure jnp objective θ -> negative log-likelihood (sum over data)."""
        ...

    @abstractmethod
    def information_matrix(self, theta_fit=None, mask=None):
        ...

    @abstractmethod
    def scale(self, err=None, bound=None):
        ...

    def normalization(self, d):
        return 1.0

    # reference API names (get_objective_cvxpy/torch both map to the jnp one)
    def get_objective_torch(self):
        return self.get_objective()

    def get_objective_cvxpy(self, mask=None):
        return self.get_objective(mask=mask)

    def evaluate_log(self, f):
        raise NotImplementedError

    # -- confidence machinery (likelihood.py:56-110) ---------------------------
    def confidence_parameter_likelihood_ratio(self, delta, params):
        """Running (sequential) likelihood-ratio radius: log(1/δ) + Σ_i
        masked loss of the in-sequence estimators."""
        evidence = params["evidence"]
        estimators = params["estimator_sequence"]
        val = 0.0
        for i in range(len(estimators) - 1):
            est = estimators[i]
            if est is not None:
                xx = self.x[i : i + 1]
                yy = self.y[i : i + 1]
                val = val + self.evaluate_datapoint(
                    est, (xx, yy), mask=evidence[i]
                )
        return float(np.log(1.0 / delta) + val)

    def lr_confidence_set(self, beta, params) -> LRSet:
        evidence = jnp.asarray(params["evidence"]).astype(bool)
        return LRSet(self.get_objective(mask=evidence), beta)

    def confidence_parameter_prior_posterior(self, delta, params):
        H = params["regularizer_hessian"]
        sigma = params["sigma"]
        n = self.x.shape[0]
        K = self.x @ self.x.T + jnp.max(H) * sigma**2 * jnp.eye(
            n, dtype=self.x.dtype
        )
        ev = (
            -0.5 * (self.y.T @ jnp.linalg.solve(K, self.y))[0, 0]
            - 0.5 * jnp.linalg.slogdet(K)[1]
        )
        return float(np.log(1.0 / delta) - ev)

    def get_confidence_set(self, theta_fit, type=None, params=None, delta=0.1):
        """Default: Laplace/information ellipsoid. Subclasses refine."""
        params = params or {}
        H = params.get("regularizer_hessian")
        V = self.information_matrix(theta_fit)
        if H is not None:
            V = V + H
        L = symsqrt(V)
        beta = self.confidence_parameter(delta, params, type=type)
        return EllipsoidSet(L=L, center=theta_fit, beta=beta)

    def confidence_parameter(self, delta, params, type=None):
        return 2.0

    # reference name
    def get_confidence_set_cvxpy(self, theta, type=None, params=None,
                                 delta=0.1):
        return self.get_confidence_set(
            params.get("estimate") if params else theta, type, params, delta
        )


class GaussianLikelihood(Likelihood):
    """Squared loss /(2σ²), optionally with full noise covariance
    (gaussian_likelihood.py:8)."""

    def __init__(self, sigma=0.1, Sigma=None):
        super().__init__()
        self.sigma = sigma
        self.Sigma = as_array(Sigma) if Sigma is not None else None

    def scale(self, err=None, bound=None):
        if self.Sigma is None:
            return self.sigma**2
        return float(jnp.max(self.Sigma.T @ self.Sigma))

    def _prec(self):
        return jnp.linalg.inv(self.Sigma.T @ self.Sigma)

    def evaluate_log(self, f):
        if self.Sigma is None:
            return jnp.sum((f - self.y) ** 2) / self.sigma**2
        r = f - self.y
        return (r.T @ self._prec() @ r)[0, 0]

    def evaluate_datapoint(self, theta, d, mask=None):
        x, y = d
        m = 1.0 if mask is None else mask
        r = x @ theta - y
        if self.Sigma is None:
            return jnp.sum(m * r**2) / (2 * self.sigma**2)
        return m * (r.T @ self._prec() @ r)[0, 0]

    def normalization(self, d):
        return 1.0 / np.sqrt(2 * np.pi * self.sigma**2)

    def get_objective(self, mask=None):
        x, y = self.x, self.y

        def obj(theta):
            r = (x @ theta.reshape(-1, 1) - y).ravel()
            if mask is not None:
                r = r * jnp.asarray(mask, r.dtype)
            if self.Sigma is None:
                return jnp.sum(r * r) / (2 * self.sigma**2)
            return r @ (self._prec() @ r) / 2.0

        return obj

    def information_matrix(self, theta_fit=None, mask=None):
        x = self.x if mask is None else self.x[mask]
        if self.Sigma is None:
            return x.T @ x / (2 * self.sigma**2)
        return x.T @ self._prec() @ x / 2.0

    def confidence_parameter(self, delta, params, type=None):
        if type in (None, "none", "fixed", "laplace"):
            return 2.0
        if type == "adaptive-AB":
            H = params["regularizer_hessian"]
            lam = float(jnp.max(jnp.linalg.eigvalsh(H)))
            B = params["bound"]
            V = self.information_matrix() + H
            return float(
                2 * np.log(1.0 / delta)
                + jnp.linalg.slogdet(V + H)[1]
                - jnp.linalg.slogdet(H)[1]
                + lam * B
            )
        if type == "LR":
            return self.confidence_parameter_likelihood_ratio(delta, params)
        if type == "prior-posterior":
            return self.confidence_parameter_prior_posterior(delta, params)
        raise NotImplementedError(type)

    def get_confidence_set(self, theta_fit, type=None, params=None, delta=0.1):
        params = params or {}
        if type == "LR":
            beta = self.confidence_parameter_likelihood_ratio(delta, params)
            return self.lr_confidence_set(beta, params)
        return super().get_confidence_set(theta_fit, type, params, delta)


class PoissonLikelihoodCanonical(GaussianLikelihood):
    """Poisson with exp link: -yᵀXθ + Σ exp(Xθ) (poisson_likelihood.py:9)."""

    def __init__(self):
        super().__init__()

    def link(self, s):
        return jnp.exp(s)

    def scale(self, err=None, bound=None):
        return np.exp(bound)

    def evaluate_datapoint(self, theta, d, mask=None):
        x, y = d
        m = 1.0 if mask is None else mask
        s = x @ theta
        return jnp.sum(m * (-y.ravel() * s.ravel() + jnp.exp(s.ravel())))

    def get_objective(self, mask=None):
        x, y = self.x, self.y

        def obj(theta):
            s = (x @ theta.reshape(-1, 1)).ravel()
            t = -y.ravel() * s + jnp.exp(s)
            if mask is not None:
                t = t * jnp.asarray(mask, t.dtype)
            return jnp.sum(t)

        return obj

    def information_matrix(self, theta_fit=None, mask=None):
        if theta_fit is None:
            return self.x.T @ self.x
        w = jnp.exp((self.x @ theta_fit.reshape(-1, 1)).ravel())
        return (self.x * w[:, None]).T @ self.x

    def confidence_parameter(self, delta, params, type=None):
        if type in (None, "none", "laplace", "mutny"):
            return 2.0 * np.log(1.0 / delta) if type == "mutny" else 2.0
        if type == "adaptive-AB":
            H = params["regularizer_hessian"]
            lam = float(jnp.max(jnp.linalg.eigvalsh(H)))
            B = params["bound"]
            V = self.x.T @ self.x / (1.0 / 4.0) ** 2 + H
            return float(
                2 * np.log(1.0 / delta)
                + jnp.linalg.slogdet(V + H)[1]
                - jnp.linalg.slogdet(H)[1]
                + lam * B
            )
        if type == "LR":
            return self.confidence_parameter_likelihood_ratio(delta, params)
        raise NotImplementedError(type)

    def get_confidence_set(self, theta_fit, type=None, params=None, delta=0.1):
        params = params or {}
        H = params.get("regularizer_hessian")
        if type == "LR":
            beta = self.confidence_parameter_likelihood_ratio(delta, params)
            return self.lr_confidence_set(beta, params)
        if type == "mutny":
            bound = params["bound"]
            w = np.exp(bound)
            V = self.x.T @ self.x * w
            if H is not None:
                V = V + H
            return EllipsoidSet(
                symsqrt(V), theta_fit, 2.0 * np.log(1.0 / delta)
            )
        # laplace (default): weights from the fit
        w = jnp.exp((self.x @ theta_fit.reshape(-1, 1)).ravel())
        V = (self.x * w[:, None]).T @ self.x
        if H is not None:
            V = V + H
        return EllipsoidSet(symsqrt(V), theta_fit, 2.0 * np.log(1.0 / delta))


class BernoulliLikelihoodCanonical(GaussianLikelihood):
    """Logistic loss (bernoulli_likelihood.py:9); y ∈ {0, 1}."""

    def __init__(self):
        super().__init__()

    def link(self, s):
        return jax.nn.sigmoid(s)

    def scale(self, err=None, bound=None):
        return 0.25

    def evaluate_datapoint(self, theta, d, mask=None):
        x, y = d
        m = 1.0 if mask is None else mask
        s = (x @ theta).ravel()
        return jnp.sum(m * (jax.nn.softplus(s) - y.ravel() * s))

    def get_objective(self, mask=None):
        x, y = self.x, self.y

        def obj(theta):
            s = (x @ theta.reshape(-1, 1)).ravel()
            t = jax.nn.softplus(s) - y.ravel() * s
            if mask is not None:
                t = t * jnp.asarray(mask, t.dtype)
            return jnp.sum(t)

        return obj

    def information_matrix(self, theta_fit=None, mask=None):
        if theta_fit is None:
            return self.x.T @ self.x * 0.25
        p = jax.nn.sigmoid((self.x @ theta_fit.reshape(-1, 1)).ravel())
        w = p * (1 - p)
        return (self.x * w[:, None]).T @ self.x

    def get_confidence_set(self, theta_fit, type=None, params=None, delta=0.1):
        params = params or {}
        H = params.get("regularizer_hessian")
        if type == "LR":
            beta = self.confidence_parameter_likelihood_ratio(delta, params)
            return self.lr_confidence_set(beta, params)
        V = self.information_matrix(theta_fit)
        if H is not None:
            V = V + H
        return EllipsoidSet(symsqrt(V), theta_fit, 2.0 * np.log(1.0 / delta))


class LaplaceLikelihood(GaussianLikelihood):
    """L1 loss / b (laplace_likelihood.py:9)."""

    def __init__(self, b=0.1):
        super().__init__()
        self.b = b

    def scale(self, err=None, bound=None):
        return 2 * self.b**2

    def evaluate_datapoint(self, theta, d, mask=None):
        x, y = d
        m = 1.0 if mask is None else mask
        return jnp.sum(m * jnp.abs((x @ theta - y).ravel())) / self.b

    def get_objective(self, mask=None):
        x, y = self.x, self.y

        def obj(theta):
            r = jnp.abs((x @ theta.reshape(-1, 1) - y).ravel())
            if mask is not None:
                r = r * jnp.asarray(mask, r.dtype)
            return jnp.sum(r) / self.b

        return obj

    def information_matrix(self, theta_fit=None, mask=None):
        return self.x.T @ self.x / (2 * self.b**2)


class HuberLikelihood(GaussianLikelihood):
    """Huber loss (huber_likelihood.py:9)."""

    def __init__(self, sigma=0.1, delta=1.35):
        super().__init__(sigma=sigma)
        self.delta_h = delta

    def get_objective(self, mask=None):
        x, y, s, d = self.x, self.y, self.sigma, self.delta_h

        def obj(theta):
            r = (x @ theta.reshape(-1, 1) - y).ravel() / s
            a = jnp.abs(r)
            t = jnp.where(a <= d, 0.5 * a**2, d * (a - 0.5 * d))
            if mask is not None:
                t = t * jnp.asarray(mask, t.dtype)
            return jnp.sum(t)

        return obj

    def evaluate_datapoint(self, theta, d_, mask=None):
        x, y = d_
        m = 1.0 if mask is None else mask
        r = (x @ theta - y).ravel() / self.sigma
        a = jnp.abs(r)
        dd = self.delta_h
        return jnp.sum(
            m * jnp.where(a <= dd, 0.5 * a**2, dd * (a - 0.5 * dd))
        )


class WeibullLikelihoodCanonical(GaussianLikelihood):
    """Weibull GLM with canonical (log) link (weibul_likelihood.py:9):
    y > 0, -log p = k·Xθ + y^k exp(-k Xθ) + const."""

    def __init__(self, kk=1.0):
        super().__init__()
        self.kk = kk

    def scale(self, err=None, bound=None):
        return 1.0

    def evaluate_datapoint(self, theta, d, mask=None):
        x, y = d
        m = 1.0 if mask is None else mask
        s = (x @ theta).ravel()
        k = self.kk
        return jnp.sum(m * (k * s + y.ravel() ** k * jnp.exp(-k * s)))

    def get_objective(self, mask=None):
        x, y, k = self.x, self.y, self.kk

        def obj(theta):
            s = (x @ theta.reshape(-1, 1)).ravel()
            t = k * s + y.ravel() ** k * jnp.exp(-k * s)
            if mask is not None:
                t = t * jnp.asarray(mask, t.dtype)
            return jnp.sum(t)

        return obj

    def information_matrix(self, theta_fit=None, mask=None):
        return self.x.T @ self.x * self.kk**2


class RobustGraphicalLikelihood(LaplaceLikelihood):
    """Contamination-robust L1-type likelihood: a Bernoulli `coin` gives the
    contamination probability and `supp` the contamination support; the
    clean-part objective is the σ-scaled L1 loss (parity:
    stpy/probability/robust_likelihood.py:7)."""

    def __init__(self, coin, supp, sigma=0.1):
        super().__init__(b=sigma)
        self.coin = coin
        self.supp = supp
        self.sigma = sigma

    def get_objective(self, mask=None):
        x, y = self.x, self.y

        def obj(theta):
            r = jnp.abs((x @ theta.reshape(-1, 1) - y).ravel()) / self.sigma
            if mask is not None:
                r = r * jnp.asarray(mask, r.dtype)
            return jnp.sum(r)

        return obj

    def information_matrix(self, theta_fit=None, mask=None):
        return self.x.T @ self.x / (2 * self.sigma**2)
