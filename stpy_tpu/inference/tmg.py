"""Exact Hamiltonian sampling for truncated multivariate Gaussians
(Pakman & Paninski): the Hamiltonian flow of a standard Gaussian is a
harmonic oscillator x(t) = x cos t + p sin t, so trajectories are computed in
closed form and linear constraints F x + g ≥ 0 are handled by exact wall
bounces at analytically-computed hit times.

Parity: stpy/helpers/posterior_sampling.py:9 (HmcSampler) and :152 (tmg) —
the R-package port there loops walls in Python; here hit times for ALL walls
evaluate vectorized, and the bounce loop is a bounded lax.while_loop.

Used for constrained GP posteriors (positive/monotone function constraints).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stpy_tpu.linalg import safe_cholesky

_TWO_PI = 2.0 * jnp.pi


def _next_hit(x, p, F, g, t_eps):
    """Earliest positive time t < 2π at which some wall f_jᵀ(x cos t +
    p sin t) + g_j = 0. Returns (t_hit, j_hit); t_hit = 2π if none."""
    a = F @ p  # (m,)
    b = F @ x
    r = jnp.sqrt(a * a + b * b)
    active = r > jnp.abs(g) + 1e-12  # wall reachable
    phi = jnp.arctan2(-a, b)  # x cos t + p sin t hits when cos(t+phi) = -g/r
    c = -g / jnp.where(r > 0, r, 1.0)
    c = jnp.clip(c, -1.0, 1.0)
    acos = jnp.arccos(c)
    # two candidate hit phases per wall
    t1 = -phi + acos
    t2 = -phi - acos
    t1 = jnp.mod(t1, _TWO_PI)
    t2 = jnp.mod(t2, _TWO_PI)
    # ignore immediate re-hits of the wall we just bounced off
    t1 = jnp.where(t1 < t_eps, _TWO_PI, t1)
    t2 = jnp.where(t2 < t_eps, _TWO_PI, t2)
    tj = jnp.minimum(t1, t2)
    tj = jnp.where(active, tj, _TWO_PI)
    j = jnp.argmin(tj)
    return tj[j], j


def _flow(x, p, t):
    return x * jnp.cos(t) + p * jnp.sin(t), p * jnp.cos(t) - x * jnp.sin(t)


def _one_trajectory(x, p, F, g, T, max_bounces=64):
    """Integrate the exact flow for total time T with wall bounces."""

    def cond(state):
        x, p, t_left, bounces = state
        return jnp.logical_and(t_left > 1e-12, bounces < max_bounces)

    def body(state):
        x, p, t_left, bounces = state
        t_hit, j = _next_hit(x, p, F, g, t_eps=1e-9)
        t_step = jnp.minimum(t_hit, t_left)
        x_new, p_new = _flow(x, p, t_step)

        def bounce(xp):
            x_, p_ = xp
            f = F[j]
            f2 = jnp.sum(f * f)
            return x_, p_ - 2.0 * (f @ p_) / f2 * f

        x_new, p_new = jax.lax.cond(
            t_hit < t_left, bounce, lambda xp: xp, (x_new, p_new)
        )
        return x_new, p_new, t_left - t_step, bounces + 1

    x, p, _, _ = jax.lax.while_loop(cond, body, (x, p, T, jnp.asarray(0)))
    return x


def tmg_sample(key, n, mu, Sigma, F, g, x0, steps_per_sample=1,
               T=jnp.pi / 2, max_bounces=64):
    """Draw n samples from N(mu, Sigma) restricted to {x: F x + g ≥ 0}.

    x0 must be strictly feasible. Works in whitened coordinates
    z = L⁻¹(x - mu) where the target is standard normal."""
    mu = jnp.asarray(mu).reshape(-1)
    d = mu.shape[0]
    L = safe_cholesky(jnp.asarray(Sigma)).L
    Fw = jnp.asarray(F) @ L
    gw = jnp.asarray(g) + jnp.asarray(F) @ mu
    z0 = jax.scipy.linalg.solve_triangular(
        L, jnp.asarray(x0).reshape(-1) - mu, lower=True
    )

    def one_step(z, k):
        p = jax.random.normal(k, (d,), z.dtype)
        z = _one_trajectory(z, p, Fw, gw, jnp.asarray(T), max_bounces)
        return z, z

    keys = jax.random.split(key, n * steps_per_sample)
    _, zs = jax.lax.scan(one_step, z0, keys)
    zs = zs[::steps_per_sample]
    return zs @ L.T + mu
