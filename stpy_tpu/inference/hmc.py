"""Hamiltonian Monte Carlo with leapfrog integration as lax.scan.

Replaces the external `hamiltorch` call at
stpy/point_processes/poisson_rate_estimator.py:835-861 with an on-device
leapfrog + Metropolis sampler; chains vmap/shard."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hmc_sample(key, log_prob, x0, steps=500, leapfrog_steps=20,
               step_size=1e-2, burn_in=0, thin=1):
    """Sample from exp(log_prob); returns (samples, accept_rate)."""
    grad_lp = jax.grad(log_prob)

    def leapfrog(x, p):
        p = p + 0.5 * step_size * grad_lp(x)

        def body(i, xp):
            x, p = xp
            x = x + step_size * p
            p = p + step_size * grad_lp(x)
            return (x, p)

        x, p = jax.lax.fori_loop(0, leapfrog_steps - 1, body, (x, p))
        x = x + step_size * p
        p = p + 0.5 * step_size * grad_lp(x)
        return x, -p

    def step(carry, k):
        x, n_acc = carry
        k1, k2 = jax.random.split(k)
        p = jax.random.normal(k1, x.shape, x.dtype)
        x_new, p_new = leapfrog(x, p)
        h_old = -log_prob(x) + 0.5 * jnp.sum(p * p)
        h_new = -log_prob(x_new) + 0.5 * jnp.sum(p_new * p_new)
        log_alpha = h_old - h_new
        accept = jnp.log(jax.random.uniform(k2, (), x.dtype)) < log_alpha
        x = jnp.where(accept, x_new, x)
        return (x, n_acc + accept), x

    keys = jax.random.split(key, steps)
    (xf, n_acc), xs = jax.lax.scan(step, (x0, jnp.asarray(0, jnp.int32)), keys)
    return xs[burn_in::thin], n_acc / steps


class HmcSampler:
    """Class parity with stpy/helpers/posterior_sampling.py:9 general use."""

    def __init__(self, log_prob, leapfrog_steps=20, step_size=1e-2):
        self.log_prob = log_prob
        self.leapfrog_steps = leapfrog_steps
        self.step_size = step_size

    def sample(self, key, x0, steps=500, burn_in=100):
        xs, acc = hmc_sample(
            key, self.log_prob, x0, steps=steps,
            leapfrog_steps=self.leapfrog_steps, step_size=self.step_size,
            burn_in=burn_in,
        )
        return xs
