"""Bayesian-optimization test functions — the de-facto fixture system.

Parity: stpy/test_functions/benchmarks.py — BenchmarkFunction API
(:9-113: eval/eval_noiseless/initial_guess/interval/maximum/optimize),
Camelback :114, Quadratic :135, Polynomial :163, Michalewicz :191,
Styblinski-Tang :259, additive-overlap :301, Custom :358,
GaussianProcessSample :386 (truth drawn from a known GP), KernelizedSample
:435, Simple1D :472, MultiRKHS :487, Linear :501.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from stpy_tpu.config import as_array, default_dtype
from stpy_tpu.utils.helper import interval as interval_grid


class BenchmarkFunction:
    def __init__(self, type="discrete", d=1, gamma=1.0, dts=None, s=0.05,
                 **kwargs):
        self.scale = 1.0
        self.type = type
        self.gamma = gamma
        self.d = d
        self.s = s
        self.dts = None
        self.groups = None
        self._key = jax.random.PRNGKey(kwargs.get("seed", 0))

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def eval_noiseless(self, X):
        if X.shape[1] != self.d:
            raise AssertionError(
                "Invalid dimension for the Benchmark function ..."
            )

    def eval(self, X, sigma=None):
        X = as_array(X)
        z = self.eval_noiseless(X)
        sig = self.s if sigma is None else sigma
        noise = sig * jax.random.normal(
            self._next_key(), (X.shape[0], 1), default_dtype()
        )
        return z / self.scale + noise

    def optimum(self):
        return 1.0

    def maximum(self, xtest=None):
        if self.type == "discrete":
            self.max = float(jnp.max(self.eval_noiseless(as_array(xtest))))
        else:
            self.max = self.maximum_continuous()
        return self.max

    def maximum_continuous(self):
        return 1.0

    def scale_max(self, xtest=None):
        self.scale = self.maximum(xtest=xtest)

    def return_params(self):
        return (self.gamma, self.groups, self.d)

    def bandwidth(self):
        return self.gamma

    def set_group_param(self, groups):
        self.groups = groups

    def bounds(self):
        return tuple([(-0.5, 0.5) for _ in range(self.d)])

    def initial_guess(self, N, adv_inv=False):
        hi = 0.0 if adv_inv else 0.5
        u = jax.random.uniform(
            self._next_key(), (N, self.d), default_dtype()
        )
        return -0.5 + u * (hi + 0.5)

    def interval(self, n, L_infinity_ball=0.5):
        if n is None:
            return None
        return interval_grid(n, self.d, L_infinity_ball=L_infinity_ball)

    def optimize(self, xtest, sigma, restarts=5):
        """Fit an ARD GP to noisy evals and evidence-optimize the bandwidth
        (parity :53-64)."""
        from stpy_tpu.kernels import KernelFunction
        from stpy_tpu.models import GaussianProcess

        xtest = as_array(xtest)
        ytest = self.eval(xtest, sigma=sigma)
        kernel = KernelFunction(
            kernel_name="ard", d=self.d,
            ard_gamma=np.ones(self.d) * 0.1, groups=self.groups,
        )
        GP = GaussianProcess(kernel=kernel, s=sigma, d=self.d)
        GP.fit_gp(xtest, ytest)
        GP.optimize_params(type="bandwidth", restarts=restarts)
        self.gamma = float(jnp.min(kernel.params_dict["0"]["ard_gamma"]))
        return self.gamma


class CamelbackBenchmark(BenchmarkFunction):
    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.d = 2

    def eval_noiseless(self, X):
        super().eval_noiseless(X)
        xx = X[:, 0] * 4
        yy = X[:, 1] * 2
        y = (
            (4.0 - 2.1 * xx**2 + xx**4 / 3.0) * xx**2
            + xx * yy
            + (-4.0 + 4 * yy**2) * yy**2
        )
        return (-y / 5.0).reshape(-1, 1) / self.scale


class QuadraticBenchmark(BenchmarkFunction):
    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.type = "continuous"
        self.R = as_array(
            kwargs.get("R", np.eye(self.d))
        )

    def eval_noiseless(self, X):
        super().eval_noiseless(X)
        D = jnp.diag(jnp.asarray([1.0, 2.0] + [1.0] * (self.d - 2))[: self.d])
        Xr = X @ self.R
        s = jnp.sum((Xr @ D) ** 2, axis=1)
        return -s.reshape(-1, 1) / self.scale + 1

    def bandwidth(self):
        return 0.2


class PolynomialBenchmark(QuadraticBenchmark):
    def eval_noiseless(self, X):
        BenchmarkFunction.eval_noiseless(self, X)
        D = jnp.diag(jnp.asarray([1.0, 2.0] + [1.0] * (self.d - 2))[: self.d])
        Xr = (X @ self.R) @ D
        s = (
            jnp.sum(Xr**2, axis=1)
            + 0.5 * jnp.sum(Xr**3, axis=1)
            + jnp.sum(Xr**4, axis=1)
        )
        return -s.reshape(-1, 1) / self.scale + 1


class MichalBenchmark(BenchmarkFunction):
    _OPT = [2.93254, 2.34661, 1.64107, 1.24415, 0.999643, 0.834879, 2.1089,
            1.84835, 1.64448, 1.48089, 1.34678, 1.2349, 1.89701, 1.76194,
            1.64477, 1.54218, 1.45162, 1.37109, 1.81774, 1.0]

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.type = "continuous"
        self.R = as_array(kwargs.get("R", np.eye(self.d)))

    def eval_noiseless(self, X):
        super().eval_noiseless(X)
        Xr = (X @ self.R) / 0.75
        Xr = (Xr + 0.5) * jnp.pi
        ar = jnp.arange(1, self.d + 1, dtype=X.dtype)
        s = jnp.sin(Xr) * jnp.sin(ar * Xr / jnp.pi) ** (2 * self.d)
        return jnp.sum(s, axis=1).reshape(-1, 1) / self.scale

    def bandwidth(self):
        return 0.2

    def maximum_continuous(self):
        return float(self._OPT[self.d])


class StybTangBenchmark(BenchmarkFunction):
    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.type = "discrete"
        self.R = as_array(kwargs.get("R", np.eye(self.d)))

    def eval_noiseless(self, X):
        super().eval_noiseless(X)
        Xr = (X @ self.R) * 8
        Y = Xr**2
        s = jnp.sum(Y**2 - 16.0 * Y + 5 * Xr, axis=1).reshape(-1, 1)
        return -(0.5 * s / (self.d * 200.0) + 0.5) / self.scale


class GeneralizedAdditiveOverlap(BenchmarkFunction):
    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.type = "continuous"

    def eval_noiseless(self, X):
        super().eval_noiseless(X)
        diffs = jnp.diff(X, axis=1) / 0.25
        s = jnp.sum(jnp.exp(-(diffs**2)), axis=1).reshape(-1, 1)
        return 0.5 * s / self.scale

    def maximum_continuous(self):
        opt = jnp.zeros((1, self.d), default_dtype())
        return float(self.eval_noiseless(opt)[0, 0])


class CustomBenchmark(BenchmarkFunction):
    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.f = kwargs.get("f")

    def set_eval(self, f, scale=1.0):
        self.f = f
        self.scale = scale

    def eval_noiseless(self, X):
        return self.f(X) / self.scale


class GaussianProcessSample(BenchmarkFunction):
    """Ground truth drawn from a GP prior on a fixed grid — the fixture used
    throughout the reference's tutorials (benchmarks.py:386)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.d = kwargs["d"]
        self.kernel_name = kwargs.get("name", "squared_exponential")
        self.gamma = kwargs["gamma"]
        self.sigma = kwargs["sigma"]
        self.n = kwargs["n"]
        self.sample(self.n)

    def sample(self, n):
        from stpy_tpu.models import GaussianProcess

        self.xtest = self.interval(n)
        GP = GaussianProcess(
            s=self.sigma, gamma=self.gamma, kernel_name=self.kernel_name,
            d=self.d,
        )
        self.values = GP.sample(self.xtest, key=self._next_key())

    def eval_noiseless(self, X):
        super().eval_noiseless(X)
        # nearest-grid lookup (the truth lives on the grid)
        X = as_array(X)
        d2 = jnp.sum(
            (X[:, None, :] - self.xtest[None, :, :]) ** 2, axis=-1
        )
        idx = jnp.argmin(d2, axis=1)
        return self.values[idx, :] / self.scale

    def initial_guess(self, N, adv_inv=False):
        perm = jax.random.permutation(self._next_key(), self.xtest.shape[0])
        x = self.xtest[perm[:N], :]
        return jnp.sort(x, axis=0)

    def scale_max(self, xtest=None):
        pass

    def optimize(self, xtest, sigma, restarts=5):
        pass


class KernelizedSample(BenchmarkFunction):
    """Truth = Φ(x)ᵀθ with θ from the prior (benchmarks.py:435)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.d = kwargs["d"]
        self.sigma = kwargs["sigma"]
        self.embedding = kwargs["embed"]
        self.m = kwargs["m"]
        self.sample()

    def set_theta(self, theta):
        self.theta = as_array(theta).reshape(-1, 1)

    def set_cutoff(self, cutoff):
        self.theta = self.theta.at[cutoff:, 0].set(0.0)

    def sample(self):
        self.theta = jax.random.normal(
            self._next_key(), (self.m, 1), default_dtype()
        )

    def eval_noiseless(self, X):
        super().eval_noiseless(X)
        return self.embedding.embed(as_array(X)) @ self.theta / self.scale

    def scale_max(self, xtest=None):
        pass

    def optimize(self, xtest, sigma, restarts=5):
        pass


class Simple1DFunction(BenchmarkFunction):
    """f(x) = -(1.4-3z)sin(18z), z=(x+0.5)*1.2 — the minimum end-to-end
    tutorial function (benchmarks.py:472)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.d = kwargs.get("d", 1)

    def eval_noiseless(self, X):
        super().eval_noiseless(X)
        z = (X + 0.5) * 1.2
        return -(1.4 - 3 * z) * jnp.sin(18 * z)

    def maximum(self, xtest):
        return float(jnp.max(jnp.abs(self.eval_noiseless(as_array(xtest)))))


class MultiRKHS(BenchmarkFunction):
    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.d = 1

    def eval_noiseless(self, X):
        return 10 * X**2

    def maximum(self, xtest=None):
        pass


class LinearBenchmark(BenchmarkFunction):
    def __init__(self, d, s, seed=0):
        super().__init__(d=d, s=s, seed=seed)
        self.theta = jax.random.normal(
            self._next_key(), (d, 1), default_dtype()
        )

    def eval_noiseless(self, X):
        return as_array(X) @ self.theta
