"""Scalar root/min solvers as lax.while_loop (replace stpy/optim/
custom_optimizers.py:7 bisection and :258 newton_solve). jit/vmap-safe, so a
batch of 1-D duals (e.g. per-action QCQP duals) solves in one fused kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bisection(g, a, b, iters: int = 100):
    """Root of g on [a, b] (g(a), g(b) of opposite signs); returns midpoint
    after `iters` halvings. Vectorizes over leading dims of a/b via vmap."""
    a = jnp.asarray(a, dtype=jnp.result_type(a, b, 0.5))
    b = jnp.asarray(b, a.dtype)

    def body(_, ab):
        a, b = ab
        m = 0.5 * (a + b)
        ga, gm = g(a), g(m)
        left = ga * gm <= 0.0
        return jnp.where(left, a, m), jnp.where(left, m, b)

    a, b = jax.lax.fori_loop(0, iters, body, (a, b))
    return 0.5 * (a + b)


def golden_section(f, a, b, iters: int = 80):
    """Minimize a unimodal scalar function on [a, b]."""
    gr = (jnp.sqrt(5.0) - 1.0) / 2.0

    def body(_, st):
        a, b = st
        c = b - gr * (b - a)
        d = a + gr * (b - a)
        go_left = f(c) < f(d)
        return jnp.where(go_left, a, c), jnp.where(go_left, d, b)

    a, b = jax.lax.fori_loop(0, iters, body, (jnp.asarray(a), jnp.asarray(b)))
    return 0.5 * (a + b)


def newton_1d(g, x0, iters: int = 50, tol: float = 1e-12):
    """Scalar Newton for g(x)=0 with autodiff derivative."""
    dg = jax.grad(g)

    def cond(c):
        x, it, step = c
        return jnp.logical_and(it < iters, jnp.abs(step) > tol)

    def body(c):
        x, it, _ = c
        step = g(x) / dg(x)
        return x - step, it + 1, step

    x, _, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(x0, jnp.result_type(x0, 0.5)),
                     jnp.asarray(0), jnp.asarray(jnp.inf))
    )
    return x
