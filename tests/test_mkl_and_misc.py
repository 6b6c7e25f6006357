import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stpy_tpu.embeddings import HermiteEmbedding
from stpy_tpu.kernels import KernelFunction
from stpy_tpu.models.mkl import MKL, MultipleKernelLearner, PrimalMKL
from stpy_tpu.opt.frank_wolfe import minimize_on_simplex
from stpy_tpu.opt.prox import project_simplex
from stpy_tpu.regularization import (
    AbsoluteValueConstraint,
    DirichletRegularizer,
    GroupL1L2Regularizer,
    L1Regularizer,
    L2Regularizer,
    NonConvexLqRegularizer,
    QuadraticInequalityConstraint,
    SupRegularizer,
)
from stpy_tpu.test_functions import (
    CamelbackBenchmark,
    GaussianProcessSample,
    MichalBenchmark,
    Simple1DFunction,
    StybTangBenchmark,
)


def test_mkl_kernel_selects_right_kernel():
    """Data from a short-lengthscale GP: MKL should weight the matching
    kernel highest."""
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (60, 1))
    y = np.sin(6 * x)  # short lengthscale
    kernels = [
        KernelFunction(kernel_name="squared_exponential", gamma=2.0, d=1),
        KernelFunction(kernel_name="squared_exponential", gamma=0.3, d=1),
    ]
    mkl = MultipleKernelLearner(kernels, lam=1.0, s=0.05)
    mkl.fit_gp(x, y)
    alphas = np.asarray(mkl.alphas)
    assert alphas.sum() == pytest.approx(1.0, abs=1e-5)
    assert alphas[1] > alphas[0]  # short lengthscale wins
    mu, std = mkl.mean_std(np.linspace(-1, 1, 30)[:, None])
    xt = np.linspace(-1, 1, 30)[:, None]
    assert np.abs(np.asarray(mu).ravel() - np.sin(6 * xt.ravel())).mean() < 0.2


def test_mkl_with_sup_regularizer():
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (40, 1))
    y = np.sin(3 * x)
    kernels = [
        KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=1),
        KernelFunction(kernel_name="linear", d=1),
    ]
    reg = SupRegularizer(lam=0.1, d=2)
    mkl = MultipleKernelLearner(kernels, lam=1.0, s=0.05, regularizer=reg)
    mkl.fit_gp(x, y)
    assert np.all(np.isfinite(np.asarray(mkl.alphas)))


def test_feature_mkl_group_lasso_sparsity():
    """Only the first embedding explains the data: group lasso should
    (nearly) zero out the second group."""
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (80, 1))
    y = np.sin(3 * x)
    e1 = HermiteEmbedding(gamma=0.4, m=32, d=1)
    e2 = HermiteEmbedding(gamma=5.0, m=32, d=1)  # too smooth to help
    mkl = MKL([e1, e2], lam=2.0, s=0.1)
    mkl.fit_gp(x, y)
    w = np.asarray(mkl.weights)
    assert w[0] > 5 * w[1]
    mu, _ = mkl.mean_var(x)
    assert np.abs(np.asarray(mu) - y).mean() < 0.1


def test_primal_mkl_runs():
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (40, 1))
    y = np.sin(3 * x)
    e1 = HermiteEmbedding(gamma=0.4, m=16, d=1)
    e2 = HermiteEmbedding(gamma=1.0, m=16, d=1)
    mkl = PrimalMKL([e1, e2], lam=0.01, s=0.1)
    mkl.fit_gp(x, y, outer_steps=3)
    w = np.asarray(mkl.weights)
    assert w.sum() == pytest.approx(1.0, abs=1e-5)
    mu, _ = mkl.mean_var(x)
    assert np.abs(np.asarray(mu) - y).mean() < 0.3


def test_simplex_solver():
    # min ||x - p||² over simplex where p inside
    p = jnp.asarray([0.2, 0.3, 0.5])
    x, val = minimize_on_simplex(
        lambda x: jnp.sum((x - p) ** 2), jnp.ones(3) / 3, steps=500, eta=0.5
    )
    assert np.allclose(x, p, atol=1e-3)
    # projection
    y = project_simplex(jnp.asarray([0.5, 2.0, -1.0]))
    assert float(jnp.sum(y)) == pytest.approx(1.0, abs=1e-9)
    assert float(jnp.min(y)) >= 0


def test_regularizers_eval_and_prox():
    theta = jnp.asarray([1.0, -2.0, 0.5])
    l2 = L2Regularizer(lam=2.0)
    assert float(l2.eval(theta)) == pytest.approx(5.25)
    l1 = L1Regularizer(lam=1.0)
    assert float(l1.eval(theta)) == pytest.approx(3.5)
    assert np.allclose(l1.prox(theta, 0.5), [0.5, -1.5, 0.0])
    gl = GroupL1L2Regularizer(lam=1.0, groups=[[0, 1], [2]])
    assert float(gl.eval(theta)) == pytest.approx(
        np.sqrt(5) + 0.5, rel=1e-6
    )
    lq = NonConvexLqRegularizer(lam=1.0, q=0.5)
    assert not lq.is_convex()
    assert np.isfinite(float(lq.eval(theta)))


def test_constraints():
    c = AbsoluteValueConstraint(c=1.0)
    t = jnp.asarray([0.8, -0.6])
    proj = c.project(t)
    assert float(jnp.sum(jnp.abs(proj))) <= 1.0 + 1e-6
    assert bool(c.satisfied(proj, tol=1e-5))
    q = QuadraticInequalityConstraint(jnp.eye(2), c=1.0)
    assert float(q.penalty(jnp.asarray([2.0, 0.0]))) > 0
    assert float(q.penalty(jnp.asarray([0.5, 0.0]))) == 0.0


def test_benchmark_functions():
    for Bench, kw in [
        (CamelbackBenchmark, {}),
        (MichalBenchmark, dict(d=2)),
        (StybTangBenchmark, dict(d=2)),
        (Simple1DFunction, dict(d=1)),
    ]:
        b = Bench(**kw)
        xt = b.interval(8)
        y = b.eval_noiseless(xt)
        assert y.shape == (xt.shape[0], 1)
        yn = b.eval(xt, sigma=0.1)
        assert yn.shape == y.shape
        x0 = b.initial_guess(5)
        assert x0.shape == (5, b.d)
    # GP-sample fixture: evaluating at grid points returns the stored draw
    g = GaussianProcessSample(d=1, gamma=0.4, sigma=0.01, n=32)
    vals = g.eval_noiseless(g.xtest[:5])
    assert np.allclose(vals, g.values[:5], atol=1e-12)
