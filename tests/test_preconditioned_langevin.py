"""Preconditioned Langevin variants (VERDICT r1 item 9).

The reference ships Hessian-/mirror-positive/MLA'/Newton-Langevin as
DISTINCT dynamics (stpy/point_processes/poisson_rate_estimator.py:572,670,
740,790); round 1 aliased them to box-mirror. These tests check (a) each
sampler targets the right stationary distribution on a positively
constrained Gaussian, and (b) Newton-Langevin actually mixes on an
ill-conditioned posterior where unpreconditioned mirror stalls.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stpy_tpu.inference import (
    mirror_langevin_box,
    mirror_langevin_positive,
    mla_prime_positive,
    newton_langevin,
)


def _truncated_normal_mean(mu, sigma):
    """E[X | X > 0], X ~ N(mu, sigma^2)."""
    from scipy.stats import norm

    a = -mu / sigma
    return mu + sigma * norm.pdf(a) / norm.sf(a)


@pytest.mark.parametrize("sampler", ["positive", "mla_prime"])
def test_positive_mirror_targets_truncated_gaussian(sampler):
    """1-D positively-constrained Gaussian: chain mean must approach the
    analytic truncated-normal mean."""
    mu, sigma = 0.8, 0.7

    def grad_f(x):
        return (x - mu) / sigma**2

    key = jax.random.PRNGKey(0)
    x0 = jnp.array([1.0])
    kw = dict(steps=6000, step_size=5e-3, burn_in=2000)
    if sampler == "positive":
        xs = mirror_langevin_positive(key, grad_f, 0.0, x0, **kw)
    else:
        xs = mla_prime_positive(key, grad_f, 0.0, x0, inner=16, **kw)
    est = float(jnp.mean(xs))
    want = _truncated_normal_mean(mu, sigma)
    assert xs.min() > 0.0
    assert abs(est - want) < 0.12, (est, want)


def test_newton_langevin_targets_gaussian():
    """Unconstrained Gaussian: Newton-Langevin with exact Hessian is exact
    (OU in whitened coordinates); mean and covariance must match."""
    H = jnp.array([[2.0, 0.3], [0.3, 0.5]])
    mu = jnp.array([1.0, -2.0])

    def grad_f(x):
        return H @ (x - mu)

    def hess_f(x):
        return H

    xs = newton_langevin(
        jax.random.PRNGKey(1), grad_f, hess_f, jnp.zeros(2),
        steps=4000, step_size=0.5, burn_in=500,
    )
    m = np.asarray(jnp.mean(xs, axis=0))
    C = np.cov(np.asarray(xs).T)
    np.testing.assert_allclose(m, np.asarray(mu), atol=0.15)
    np.testing.assert_allclose(C, np.linalg.inv(np.asarray(H)), atol=0.3)


def test_newton_beats_mirror_on_ill_conditioned_posterior():
    """cond(H) = 1e6 quadratic on a box: after the same number of steps from
    a far-off start, the Newton chain's error along the FLAT direction must
    be far smaller than plain box-mirror's (the r1 aliasing had no way to
    win here)."""
    d = 8
    evals = jnp.logspace(0, 6, d)            # 1 .. 1e6
    rng = np.random.default_rng(0)
    Q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    Q = jnp.asarray(Q)
    H = (Q * evals) @ Q.T
    mu = jnp.full((d,), 2.0)

    def grad_f(x):
        return H @ (x - mu)

    def hess_f(x):
        return H

    l = jnp.zeros(d)
    u = jnp.full((d,), 10.0)
    x0 = jnp.full((d,), 0.2)
    steps = 400

    xs_m = mirror_langevin_box(
        jax.random.PRNGKey(2), grad_f, l, u, x0, steps=steps,
        step_size=1.0 / (float(evals[-1]) + 1.0),  # stability-limited
    )
    xs_n = newton_langevin(
        jax.random.PRNGKey(3), grad_f, hess_f, x0, steps=steps,
        step_size=0.5,
    )
    err_m = float(jnp.linalg.norm(jnp.mean(xs_m[steps // 2:], 0) - mu))
    err_n = float(jnp.linalg.norm(jnp.mean(xs_n[steps // 2:], 0) - mu))
    # mirror is stuck near x0 along the flat eigendirections
    assert err_n < 0.2
    assert err_m > 10 * err_n, (err_m, err_n)
