"""Posterior / kernel / evidence parity against an INDEPENDENT torch float64
implementation (the reference's stack), written from the textbook formulas —
the acceptance bar from BASELINE.md: posterior matching the torch reference
to 1e-6 rtol."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from stpy_tpu.kernels import KernelFunction
from stpy_tpu.models.exact_gp import GaussianProcess


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (80, 3))
    y = np.sin(3 * x[:, :1]) + 0.05 * rng.standard_normal((80, 1))
    xt = rng.uniform(-1, 1, (40, 3))
    return x, y, xt


def _torch_se(a, b, gamma):
    a = torch.as_tensor(a, dtype=torch.float64)
    b = torch.as_tensor(b, dtype=torch.float64)
    sq = torch.cdist(a, b, p=2.0) ** 2
    return torch.exp(-sq / (2 * gamma * gamma))


def test_se_kernel_values_match_torch(data):
    x, _, xt = data
    k = KernelFunction(kernel_name="squared_exponential", gamma=0.7, d=3)
    G = np.asarray(k.eval_params(k.params_dict, jnp.asarray(x),
                                 jnp.asarray(xt)))
    Gt = _torch_se(x, xt, 0.7).numpy()
    assert np.max(np.abs(G - Gt)) < 1e-10


def test_matern_kernel_values_match_torch(data):
    x, _, xt = data
    for nu, shape in [
        (0.5, lambda r: torch.exp(-r)),
        (1.5, lambda r: (1 + math.sqrt(3) * r)
            * torch.exp(-math.sqrt(3) * r)),
        (2.5, lambda r: (1 + math.sqrt(5) * r + 5 * r**2 / 3)
            * torch.exp(-math.sqrt(5) * r)),
    ]:
        k = KernelFunction(kernel_name="matern", gamma=0.6, nu=nu, d=3)
        G = np.asarray(k.eval_params(k.params_dict, jnp.asarray(x),
                                     jnp.asarray(xt)))
        a = torch.as_tensor(x, dtype=torch.float64)
        b = torch.as_tensor(xt, dtype=torch.float64)
        r = torch.cdist(a, b, p=2.0) / 0.6
        Gt = shape(r).numpy()
        assert np.max(np.abs(G - Gt)) < 1e-9, nu


def test_posterior_matches_torch_1e6_rtol(data):
    x, y, xt = data
    s, gamma = 0.1, 0.5

    # torch float64 reference posterior
    K = _torch_se(x, x, gamma) + s * s * torch.eye(80, dtype=torch.float64)
    L = torch.linalg.cholesky(K)
    alpha = torch.cholesky_solve(torch.as_tensor(y, dtype=torch.float64), L)
    Ks = _torch_se(xt, x, gamma)
    mu_t = (Ks @ alpha).numpy()
    V = torch.linalg.solve_triangular(L, Ks.T, upper=False)
    var_t = (1.0 - (V**2).sum(0)).numpy()

    gp = GaussianProcess(kernel=KernelFunction(
        kernel_name="squared_exponential", gamma=gamma, d=3), s=s)
    gp.fit_gp(jnp.asarray(x), jnp.asarray(y))
    mu, std = gp.mean_std(jnp.asarray(xt))
    mu = np.asarray(mu).ravel()
    var = np.asarray(std).ravel() ** 2

    assert np.max(np.abs(mu - mu_t.ravel())) / np.max(np.abs(mu_t)) < 1e-6
    assert np.max(np.abs(var - var_t)) < 1e-8


def test_evidence_matches_torch(data):
    x, y, _ = data
    s, gamma = 0.1, 0.5
    K = _torch_se(x, x, gamma) + s * s * torch.eye(80, dtype=torch.float64)
    L = torch.linalg.cholesky(K)
    yt = torch.as_tensor(y, dtype=torch.float64)
    alpha = torch.cholesky_solve(yt, L)
    # the library (like the reference, gauss_procc.py:631-638) omits the
    # constant (n/2)·log 2π — it cancels in hyperopt
    nll_t = float(
        0.5 * (yt.T @ alpha).squeeze()
        + torch.log(torch.diagonal(L)).sum()
    )
    k = KernelFunction(kernel_name="squared_exponential", gamma=gamma, d=3)
    gp = GaussianProcess(kernel=k, s=s)
    gp.fit_gp(jnp.asarray(x), jnp.asarray(y))
    nll = float(gp.log_marginal(k, k.params_dict))
    assert abs(nll - nll_t) / abs(nll_t) < 1e-7
