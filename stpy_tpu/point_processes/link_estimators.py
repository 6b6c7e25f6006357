"""Link-function rate estimators: λ(x) = g(Φ(x)ᵀθ) for non-identity links.

Parity: stpy/point_processes/link_fun_rate_estimator.py:20
(PermanentalProcessRateEstimator, quadratic link λ = (Φθ)² with
product-integral Ψ matrices :37-99, non-convex fit :178, Laplace covariance
:191), :290 (LogisticGaussProcessRateEstimator, softplus link), :318
(ExpGaussProcessRateEstimator, λ = exp(-Φθ)), and
log_link_rate_estimator.py:9 (LogGaussProcessRateEstimator, B·sigmoid link).

TPU notes: Ψ matrices come from packing.product_integral closed forms when
available, else one vectorized GL quadrature einsum; fits are unconstrained
L-BFGS on device; samplers are preconditioned ULA scans; the per-action
quadratic bounds use the exact trust-region solvers in opt.ellipsoid instead
of MOSEK QCQPs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stpy_tpu.config import default_dtype
from stpy_tpu.inference.langevin import ula
from stpy_tpu.linalg import power_iteration
from stpy_tpu.opt.ellipsoid import (
    maximize_matrix_quadratic_on_ellipse,
    minimize_matrix_quadratic_on_ellipse,
)
from stpy_tpu.opt.lbfgs import minimize_lbfgs
from stpy_tpu.point_processes.poisson_rate_estimator import (
    PoissonRateEstimator,
)


class PermanentalProcessRateEstimator(PoissonRateEstimator):
    """Quadratic link λ(x) = (Φ(x)ᵀθ)²."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.integration = "fixed_quad"
        self.product_integrals = {}
        mm = self.get_m()
        self.varLambdas = jnp.zeros(
            (len(self.basic_sets), mm, mm), default_dtype()
        )
        if self.feedback == "count-record" and self.estimator == "least-sq":
            mats = [self.product_integral(S) for S in self.basic_sets]
            self.varLambdas = jnp.stack(mats, axis=0)
            self.variances = jnp.asarray(
                [S.volume() * self.B for S in self.basic_sets],
                default_dtype(),
            )
        self.sumLambda = None

    def product_integral(self, S):
        """Ψ(S)_ij = ∫_S Φ_i Φ_j (parity :37-99): closed form when the basis
        provides one, else GL quadrature as a single einsum."""
        key = id(S)
        if key in self.product_integrals:
            return self.product_integrals[key]
        if hasattr(self.packing, "product_integral"):
            try:
                Psi = self.packing.product_integral(S)
                self.product_integrals[key] = Psi
                return Psi
            except (NotImplementedError, AssertionError, TypeError):
                pass
        n_q = 128 if S.d == 1 else 50
        w, nodes = S.return_legendre_discretization(n_q)
        Z = self.packing.embed(nodes)
        Psi = jnp.einsum("i,ij,ik->jk", w, Z, Z)
        self.product_integrals[key] = Psi
        return Psi

    # quadratic-link model is unconstrained in θ (parity :103-115)
    def get_constraints(self):
        mm = self.get_m()
        l = jnp.full((mm,), self.b, default_dtype())
        u = jnp.full((mm,), self.B, default_dtype())
        return (l, jnp.eye(mm, dtype=default_dtype()), u)

    def load_data(self, data, times=False):
        super().load_data(data, times=False)
        mm = self.get_m()
        self.sumLambda = jnp.zeros((mm, mm), default_dtype())
        for S, obs, dt in data:
            self.sumLambda = self.sumLambda + self.product_integral(S) * dt

    def add_data_point(self, new_data, times=False):
        PoissonRateEstimator.add_data_point(self, new_data, times=False)
        S, obs, dt = new_data
        if self.sumLambda is None:
            self.sumLambda = jnp.zeros(
                (self.get_m(), self.get_m()), default_dtype()
            )
        self.sumLambda = self.sumLambda + self.product_integral(S) * dt

    # -- fit (parity :178-189) -------------------------------------------------
    def penalized_likelihood(self, threads=4):
        sumLambda = self.sumLambda

        if self.observations is not None:
            obs = self.observations
            mult = self.obs_multiplicities

            def loss(theta):
                q = (obs @ theta) ** 2
                return (
                    -jnp.sum(mult * jnp.log(jnp.clip(q, 1e-12)))
                    + theta @ (sumLambda @ theta)
                    + 0.5 * self.s * jnp.sum(theta**2)
                )
        else:

            def loss(theta):
                return theta @ (sumLambda @ theta) + 0.5 * self.s * jnp.sum(
                    theta**2
                )

        # non-convex in θ (sign symmetry + log of square): vmapped multistart
        self.key, sub = jax.random.split(self.key)
        theta0s = jax.random.normal(
            sub, (8, self.get_m()), default_dtype()
        )
        results = jax.vmap(
            lambda t0: minimize_lbfgs(loss, t0, max_iter=1000)
        )(theta0s)
        best = jnp.nanargmin(results.value)
        self.rate = results.x[best]
        return self.rate

    penalized_likelihood_fast = penalized_likelihood

    def fit_gp(self, threads=4):
        if self.data is None:
            self.rate = None
            return
        self.penalized_likelihood(threads)

    fit = fit_gp

    def construct_covariance_matrix_laplace(self, theta=None):
        """(parity :191-205)."""
        mm = self.get_m()
        W = jnp.zeros((mm, mm), default_dtype())
        if self.feedback != "count-record":
            raise AssertionError("Not implemented.")
        th = self.rate if theta is None else theta
        if self.observations is not None:
            q = jnp.maximum((self.observations @ th.reshape(-1)) ** 2, self.b)
            Dw = self.obs_multiplicities / jnp.clip(q, 1e-12)
            W = (self.observations * Dw[:, None]).T @ self.observations
        W = W + 2.0 * self.sumLambda
        return W + jnp.eye(mm, dtype=W.dtype) * self.s

    # -- posterior sampling (parity :118-140) ----------------------------------
    def sample(self, verbose=False, steps=100, stepsize=None):
        if self.data is None:
            self.sampled_theta = jnp.zeros((self.get_m(), 1), default_dtype())
            return None
        sumLambda = self.sumLambda

        if self.observations is not None:
            obs = self.observations
            mult = self.obs_multiplicities

            def nll(theta):
                q = (obs @ theta) ** 2
                return (
                    -jnp.sum(mult * jnp.log(jnp.clip(q, 1e-12)))
                    + theta @ (sumLambda @ theta)
                    + 0.5 * self.s * jnp.sum(theta**2)
                )
        else:

            def nll(theta):
                return theta @ (sumLambda @ theta) + 0.5 * self.s * jnp.sum(
                    theta**2
                )

        W = self.construct_covariance_matrix_laplace()
        L = power_iteration(W) + 1.0
        self.key, sub = jax.random.split(self.key)
        xs = ula(
            sub, jax.grad(nll), self.rate.reshape(-1), steps=steps,
            step_size=(stepsize if stepsize is not None else 0.5 / L),
        )
        self.sampled_theta = xs[-1].reshape(-1, 1)
        return None

    # -- evaluation under the squared link -------------------------------------
    def mean_rate(self, S, n=128):
        xtest = S.return_discretization(n)
        return (self.packing.embed(xtest) @ self.rate.reshape(-1, 1)) ** 2

    def mean_rate_points(self, xtest):
        return (self.packing.embed(xtest) @ self.rate.reshape(-1, 1)) ** 2

    def mean_set(self, S, dt=1):
        Z = self.product_integral(S)
        return (self.rate @ (Z @ self.rate)) * dt

    def sample_value(self, S):
        Z = self.product_integral(S)
        th = self.sampled_theta.reshape(-1)
        return th @ (Z @ th)

    def sample_path(self, S, n=128):
        xtest = S.return_discretization(n)
        return (self.packing.embed(xtest) @ self.sampled_theta) ** 2

    def sample_path_points(self, xtest):
        return (
            self.packing.embed(xtest) @ self.sampled_theta.reshape(-1, 1)
        ) ** 2

    def mean_std_per_action(self, S, W, dt, beta):
        """(parity :207-217) exact TRS instead of MOSEK."""
        Z = self.product_integral(S)
        ucb, _ = maximize_matrix_quadratic_on_ellipse(
            Z, W, self.rate.reshape(-1), beta
        )
        lcb, _ = minimize_matrix_quadratic_on_ellipse(
            Z, W, self.rate.reshape(-1), beta
        )
        map_ = self.rate @ (Z @ self.rate)
        return dt * map_, dt * float(ucb), dt * float(lcb)

    def map_lcb_ucb_approx_action(self, S, dt=1.0, beta=2.0):
        phi = self.packing.integral(S)
        map_ = phi @ self.rate
        width = beta * jnp.sqrt(phi @ self.W_inv_approx @ phi)
        ucb = jnp.maximum((map_ + width) ** 2, (map_ - width) ** 2)
        ucb = jnp.minimum(ucb, self.B * S.volume() * dt)
        return dt * map_**2, 0.0, dt * ucb


class _QuadratureNodesMixin:
    """Accumulate GL quadrature nodes/weights per sensing round for domain
    integrals of non-polynomial links (parity: log_link_rate_estimator.py:
    18-44)."""

    discretization = 64

    def load_data(self, data, times=False):
        super().load_data(data, times=False)
        weights_arr, nodes_arr = [], []
        for S, obs, dt in data:
            w, nodes = S.return_legendre_discretization(self.discretization)
            nodes_arr.append(nodes)
            weights_arr.append(w * dt)
        self.nodes = self.packing.embed(jnp.concatenate(nodes_arr, axis=0))
        self.weights = jnp.concatenate(weights_arr)

    def add_data_point(self, new_data, times=False):
        super().add_data_point(new_data, times=False)
        S, obs, dt = new_data
        w, nodes = S.return_legendre_discretization(self.discretization)
        emb = self.packing.embed(nodes)
        if getattr(self, "nodes", None) is None:
            self.nodes, self.weights = emb, w * dt
        else:
            self.nodes = jnp.concatenate([self.nodes, emb], axis=0)
            self.weights = jnp.concatenate([self.weights, w * dt])


class LogisticGaussProcessRateEstimator(
    _QuadratureNodesMixin, PermanentalProcessRateEstimator
):
    """Softplus link λ = log(1 + exp(Φθ)) (parity :290-316)."""

    def logistic(self, x):
        return jax.nn.softplus(x)

    def penalized_likelihood(self, threads=4):
        weights, nodes = self.weights, self.nodes

        if self.observations is not None:
            obs = self.observations
            mult = self.obs_multiplicities

            def loss(theta):
                lam = jax.nn.softplus(obs @ theta)
                return (
                    -jnp.sum(mult * jnp.log(jnp.clip(lam, 1e-12)))
                    + jnp.sum(weights * jax.nn.softplus(nodes @ theta))
                    + self.s * jnp.sum(theta**2)
                )
        else:

            def loss(theta):
                return jnp.sum(
                    weights * jax.nn.softplus(nodes @ theta)
                ) + self.s * jnp.sum(theta**2)

        self.key, sub = jax.random.split(self.key)
        theta0 = jax.random.normal(sub, (self.get_m(),), default_dtype())
        res = minimize_lbfgs(loss, theta0, max_iter=500)
        self.rate = res.x
        return self.rate

    def mean_rate(self, S, n=128):
        xtest = S.return_discretization(n)
        return jax.nn.softplus(
            self.packing.embed(xtest) @ self.rate.reshape(-1, 1)
        )

    def mean_rate_points(self, xtest):
        return jax.nn.softplus(
            self.packing.embed(xtest) @ self.rate.reshape(-1, 1)
        )


class ExpGaussProcessRateEstimator(
    _QuadratureNodesMixin, PermanentalProcessRateEstimator
):
    """Exponential link λ = exp(-Φθ) (parity :318-345)."""

    def penalized_likelihood(self, threads=4):
        weights, nodes = self.weights, self.nodes

        if self.observations is not None:
            obs = self.observations
            mult = self.obs_multiplicities

            def loss(theta):
                return (
                    jnp.sum(mult * (obs @ theta))
                    + jnp.sum(weights * jnp.exp(-(nodes @ theta)))
                    + self.s * jnp.sum(theta**2)
                )
        else:

            def loss(theta):
                return jnp.sum(
                    weights * jnp.exp(-(nodes @ theta))
                ) + self.s * jnp.sum(theta**2)

        theta0 = jnp.zeros((self.get_m(),), default_dtype())
        res = minimize_lbfgs(loss, theta0, max_iter=500)
        self.rate = res.x
        return self.rate

    def mean_rate(self, S, n=128):
        xtest = S.return_discretization(n)
        return jnp.exp(-self.packing.embed(xtest) @ self.rate.reshape(-1, 1))

    def mean_rate_points(self, xtest):
        return jnp.exp(-self.packing.embed(xtest) @ self.rate.reshape(-1, 1))


class LogGaussProcessRateEstimator(
    _QuadratureNodesMixin, PermanentalProcessRateEstimator
):
    """Scaled-sigmoid link λ = B·σ(Φθ) (sigmoidal Gaussian Cox process;
    parity: log_link_rate_estimator.py:9-217)."""

    def sigmoid(self, x):
        return jax.nn.sigmoid(x)

    def penalized_likelihood(self, threads=4):
        weights, nodes, B = self.weights, self.nodes, self.B

        if self.observations is not None:
            obs = self.observations
            mult = self.obs_multiplicities

            def loss(theta):
                lam = B * jax.nn.sigmoid(obs @ theta)
                return (
                    -jnp.sum(mult * jnp.log(jnp.clip(lam, 1e-12)))
                    + B * jnp.sum(weights * jax.nn.sigmoid(nodes @ theta))
                    + self.s * jnp.sum(theta**2)
                )
        else:

            def loss(theta):
                return B * jnp.sum(
                    weights * jax.nn.sigmoid(nodes @ theta)
                ) + self.s * jnp.sum(theta**2)

        self.key, sub = jax.random.split(self.key)
        theta0 = jax.random.normal(sub, (self.get_m(),), default_dtype())
        res = minimize_lbfgs(loss, theta0, max_iter=500)
        self.rate = res.x
        return self.rate

    def construct_covariance_matrix_laplace(self, theta=None):
        th = self.rate if theta is None else theta
        mm = self.get_m()
        W = jnp.zeros((mm, mm), default_dtype())
        if self.observations is not None:
            p = jax.nn.sigmoid(self.observations @ th.reshape(-1))
            Dw = self.obs_multiplicities * (1 - p) ** 2
            W = (self.observations * Dw[:, None]).T @ self.observations
        p_nodes = jax.nn.sigmoid(self.nodes @ th.reshape(-1))
        Dn = self.B * self.weights * p_nodes * (1 - p_nodes)
        W = W + (self.nodes * Dn[:, None]).T @ self.nodes
        return W + jnp.eye(mm, dtype=W.dtype) * self.s

    def sample(self, verbose=False, steps=100, stepsize=None):
        """Preconditioned ULA on the sigmoidal posterior (parity :46-90)."""
        if self.data is None:
            self.sampled_theta = jnp.zeros((self.get_m(), 1), default_dtype())
            return None
        weights, nodes, B = self.weights, self.nodes, self.B
        obs = self.observations
        mult = self.obs_multiplicities

        def nll(theta):
            val = B * jnp.sum(weights * jax.nn.sigmoid(nodes @ theta)) + (
                0.5 * self.s * jnp.sum(theta**2)
            )
            if obs is not None:
                lam = B * jax.nn.sigmoid(obs @ theta)
                val = val - jnp.sum(mult * jnp.log(jnp.clip(lam, 1e-12)))
            return val

        W = self.construct_covariance_matrix_laplace()
        L = power_iteration(W) + 1.0
        self.key, sub = jax.random.split(self.key)
        xs = ula(
            sub, jax.grad(nll), self.rate.reshape(-1), steps=steps,
            step_size=(stepsize if stepsize is not None else 0.5 / L),
        )
        self.sampled_theta = xs[-1].reshape(-1, 1)
        return None

    def mean_rate(self, S, n=128):
        xtest = S.return_discretization(n)
        return self.B * jax.nn.sigmoid(
            self.packing.embed(xtest) @ self.rate.reshape(-1, 1)
        )

    def mean_rate_points(self, xtest):
        return self.B * jax.nn.sigmoid(
            self.packing.embed(xtest) @ self.rate.reshape(-1, 1)
        )

    def sample_value(self, S):
        w, nodes = S.return_legendre_discretization(64)
        Phi = self.packing.embed(nodes)
        return jnp.sum(
            w * self.B * jax.nn.sigmoid(
                (Phi @ self.sampled_theta).reshape(-1)
            )
        )

    def sample_path(self, S, n=128):
        xtest = S.return_discretization(n)
        return self.B * jax.nn.sigmoid(
            self.packing.embed(xtest) @ self.sampled_theta
        )

    def sample_path_points(self, xtest):
        return self.B * jax.nn.sigmoid(
            self.packing.embed(xtest) @ self.sampled_theta.reshape(-1, 1)
        )
